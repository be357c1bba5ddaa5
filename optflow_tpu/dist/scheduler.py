"""Sharded pair scheduler: data parallelism over image pairs.

The in-process equivalent of the reference's job-file sharding (5000 pairs
per file across cluster nodes, gen_cross_file_list.py:26-27): pairs of the
same shape are bucketed, padded to a multiple of the mesh's ``pairs`` axis,
batched with a leading dimension, and solved under one jit with the batch
sharded across devices. Padding lanes are masked out of the results.
"""

from __future__ import annotations

import collections
import functools
from typing import Dict, List, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from optflow_tpu.core.config import TVL1Params
from optflow_tpu.ops.tvl1 import tvl1_flow


class PairScheduler:
    """Batches same-shape pairs and solves them data-parallel over the
    mesh's ``pairs`` axis."""

    def __init__(
        self,
        mesh: Mesh,
        params: TVL1Params = TVL1Params(),
        max_batch: int = 64,
        level_solver=None,
    ):
        self.mesh = mesh
        self.params = params
        self.max_batch = max_batch
        self.level_solver = level_solver
        self._jitted: Dict[Tuple[int, int], object] = {}

    @property
    def n_shards(self) -> int:
        return self.mesh.shape["pairs"]

    def _solver_for(self, shape: Tuple[int, int]):
        if shape not in self._jitted:
            params = self.params
            level_solver = self.level_solver

            def solve_batch(i0s, i1s):
                return jax.vmap(
                    lambda a, b: tvl1_flow(
                        a, b, params, level_solver=level_solver
                    )
                )(i0s, i1s)

            sharding = NamedSharding(self.mesh, P("pairs", None, None))
            out_sharding = NamedSharding(
                self.mesh, P("pairs", None, None, None)
            )
            self._jitted[shape] = jax.jit(
                solve_batch,
                in_shardings=(sharding, sharding),
                out_shardings=out_sharding,
            )
        return self._jitted[shape]

    def solve_pairs(
        self, pairs: Sequence[Tuple[np.ndarray, np.ndarray]]
    ) -> List[np.ndarray]:
        """Solve a list of (i0, i1) pairs; returns flows in input order.

        Pairs are grouped by shape; each group is padded up to a multiple
        of the pairs-axis size (zero frames solve to zero flow and are
        dropped)."""
        by_shape: Dict[Tuple[int, int], List[int]] = collections.defaultdict(
            list
        )
        for i, (a, b) in enumerate(pairs):
            assert a.shape == b.shape, "pair frames must share a shape"
            by_shape[a.shape].append(i)

        results: List[np.ndarray] = [None] * len(pairs)  # type: ignore
        n_sh = self.n_shards
        for shape, idxs in by_shape.items():
            solver = self._solver_for(shape)
            for start in range(0, len(idxs), self.max_batch):
                chunk = idxs[start : start + self.max_batch]
                n = len(chunk)
                padded = -(-n // n_sh) * n_sh
                i0s = np.zeros((padded,) + shape, np.float32)
                i1s = np.zeros((padded,) + shape, np.float32)
                for j, k in enumerate(chunk):
                    i0s[j] = pairs[k][0]
                    i1s[j] = pairs[k][1]
                sharding = NamedSharding(self.mesh, P("pairs", None, None))
                flows = solver(
                    jax.device_put(jnp.asarray(i0s), sharding),
                    jax.device_put(jnp.asarray(i1s), sharding),
                )
                flows_np = np.asarray(flows)
                for j, k in enumerate(chunk):
                    results[k] = flows_np[j]
        return results

"""Tiled large-section TV-L1 with halo exchange over the ``rows`` mesh axis.

Capability beyond the reference, which handles large sections only by
downscaling (scale=0.5, src/optflow.cpp:92) or strip ROIs: here a section
is partitioned into row blocks across devices. Each device receives its
block plus a ``halo``-row strip from each neighbor (one ppermute exchange
per direction over ICI), solves the extended block locally, and keeps the
interior. Because TV-L1's influence decays quickly with distance (the dual
field propagates one pixel per iteration and is strongly damped), a halo a
few tens of pixels wide makes the stitched field match the monolithic
solve away from block seams; the halo is configurable where tighter
agreement is needed.

The exchange pattern is the structural analogue of ring/blockwise sequence
parallelism: neighbors only, no global collectives, bandwidth rides ICI.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from optflow_tpu.core.config import TVL1Params
from optflow_tpu.ops.tvl1 import tvl1_flow


def _exchange_halos(block: jnp.ndarray, halo: int, axis_name: str):
    """Return (top_halo, bottom_halo) strips received from the neighbors.

    Boundary devices receive a replicated copy of their own edge strip,
    which reproduces the monolithic solver's clamp-to-edge behavior at the
    outer image border.
    """
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    # send my bottom strip down -> received as neighbor's top halo
    down = [(i, i + 1) for i in range(n - 1)]
    up = [(i + 1, i) for i in range(n - 1)]
    from_above = jax.lax.ppermute(block[-halo:], axis_name, down)
    from_below = jax.lax.ppermute(block[:halo], axis_name, up)
    # boundary fixup: replicate own edge rows
    top_edge = jnp.repeat(block[:1], halo, axis=0)
    bottom_edge = jnp.repeat(block[-1:], halo, axis=0)
    top_halo = jnp.where(idx == 0, top_edge, from_above)
    bottom_halo = jnp.where(idx == n - 1, bottom_edge, from_below)
    return top_halo, bottom_halo


def tiled_tvl1_flow(
    i0: jnp.ndarray,
    i1: jnp.ndarray,
    params: TVL1Params,
    mesh: Mesh,
    halo: int = 32,
    axis_name: str = "rows",
    level_solver=None,
) -> jnp.ndarray:
    """Solve TV-L1 over a section sharded by rows across ``axis_name``.

    i0, i1: (H, W) with H divisible by the rows-axis size.
    Returns the stitched (H, W, 2) flow, sharded the same way.
    """
    n_rows = mesh.shape[axis_name]
    h, w = i0.shape
    assert h % n_rows == 0, f"H={h} must divide by rows axis {n_rows}"

    def shard_fn(i0_blk, i1_blk):
        # shard_map passes blocks with the sharded axis local size
        t0, b0 = _exchange_halos(i0_blk, halo, axis_name)
        t1, b1 = _exchange_halos(i1_blk, halo, axis_name)
        ext0 = jnp.concatenate([t0, i0_blk, b0], axis=0)
        ext1 = jnp.concatenate([t1, i1_blk, b1], axis=0)
        flow = tvl1_flow(ext0, ext1, params, level_solver=level_solver)
        return flow[halo:-halo]

    fn = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(axis_name, None), P(axis_name, None)),
        out_specs=P(axis_name, None, None),
        check_vma=False,
    )
    sharding = NamedSharding(mesh, P(axis_name, None))
    i0 = jax.device_put(i0, sharding)
    i1 = jax.device_put(i1, sharding)
    return fn(i0, i1)

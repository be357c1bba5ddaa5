"""Tiled large-section TV-L1 over the ``rows`` mesh axis.

Capability beyond the reference, which handles large sections only by
downscaling (scale=0.5, src/optflow.cpp:92) or strip ROIs: here a section
is partitioned into row blocks across devices. Each device solves a
halo-extended window that is a TRUE SLICE of the global image — windows
are clamped at the image edges (shifted inward, like the Pallas level
kernel's row blocks), so boundary devices see the real image boundary and
apply exactly the monolithic solver's boundary conditions. Away from the
image edges the halo bounds the information reach of the coarse-to-fine
solve (:func:`default_halo`), making the stitched field match the
monolithic solve to the numerical level at every row including seams
(asserted by max-error tests, not medians).

The input frames are shared via one all_gather over ICI (two H x W arrays
— input-sized, cheap); what sharding buys is the SOLVE's footprint: the
~16 level-state arrays and the iteration bandwidth stay block-local per
device. This replaces a ppermute neighbor-strip exchange that replicated
edge rows at the image boundary and thereby perturbed the boundary
condition (seam tests caught 0.3 px errors at the image's first/last
rows).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from optflow_tpu.core.config import TVL1Params
from optflow_tpu.ops.pyramid import pyramid_shapes
from optflow_tpu.ops.tvl1 import tvl1_flow


def default_halo(
    params: TVL1Params, max_flow: float = 8.0, h: int = 1 << 30, w: int = 1 << 30
) -> int:
    """Halo rows needed for the extended-window solve to match the
    monolithic solve away from seams.

    Each device solves its own coarse-to-fine problem on a halo-extended
    window; the halo must stay informative at the COARSEST level, where
    its width has shrunk by scale_step^(L-1). Two effects bound the
    required finest-level width:

    - backward warping samples up to |flow_level| = max_flow * s^l pixels
      outside a pixel's position — in finest-level units that is max_flow
      at every level;
    - the primal-dual stencils propagate one pixel per iteration but the
      dual field is strongly damped (p <- p / (1 + taut |grad u|)); an
      effective reach of ~4 px covers it to well under 0.1 px of seam
      error — in finest-level units 4 / s^(L-1) at the coarsest level.

    halo = ceil(max_flow + 4 / scale_step^(L-1)), rounded up to 8 rows
    (f32 sublane tile, keeps the Pallas level kernel's DMA offsets
    aligned). For the reference's 10-level/0.8 pyramid and FIB-SEM-scale
    flows (<= 8 px) this gives 40 rows.
    """
    levels = len(pyramid_shapes(h, w, params.nscales, params.scale_step))
    reach = 4.0 / (params.scale_step ** max(levels - 1, 0))
    need = int(np.ceil(max_flow + reach))
    return -(-need // 8) * 8


def tiled_tvl1_flow(
    i0: jnp.ndarray,
    i1: jnp.ndarray,
    params: TVL1Params,
    mesh: Mesh,
    halo: Optional[int] = None,
    axis_name: str = "rows",
    level_solver=None,
    max_flow: Optional[float] = 8.0,
) -> jnp.ndarray:
    """Solve TV-L1 over a section sharded by rows across ``axis_name``.

    i0, i1: (H, W) with H divisible by the rows-axis size.
    halo: extended-window rows per side; default :func:`default_halo`
      (derived from scale_step and ``max_flow``).
    max_flow: when set, the solved flow is clamped to this magnitude —
      the halo-validity contract (a flow exceeding it could legitimately
      depend on pixels beyond the halo). None disables the clamp.
    Returns the stitched (H, W, 2) flow, sharded the same way.
    """
    n_rows = mesh.shape[axis_name]
    h, w = i0.shape
    assert h % n_rows == 0, f"H={h} must divide by rows axis {n_rows}"
    block = h // n_rows
    if halo is None:
        halo = default_halo(params, max_flow or 8.0, h, w)
    halo = min(halo, (h - block) // 2)  # window must fit inside the image
    win = block + 2 * halo

    def shard_fn(i0_blk, i1_blk):
        # one input-sized all_gather over ICI; every device then slices
        # its clamped window — a true slice of the global image, so image
        # boundaries are exactly the monolithic solver's boundaries
        i0_full = jnp.reshape(
            jax.lax.all_gather(i0_blk, axis_name), (h, w)
        )
        i1_full = jnp.reshape(
            jax.lax.all_gather(i1_blk, axis_name), (h, w)
        )
        idx = jax.lax.axis_index(axis_name)
        start = idx * block
        wstart = jnp.clip(start - halo, 0, h - win)
        ext0 = jax.lax.dynamic_slice(i0_full, (wstart, 0), (win, w))
        ext1 = jax.lax.dynamic_slice(i1_full, (wstart, 0), (win, w))
        flow = tvl1_flow(ext0, ext1, params, level_solver=level_solver)
        if max_flow is not None:
            flow = jnp.clip(flow, -max_flow, max_flow)
        off = start - wstart
        return jax.lax.dynamic_slice(flow, (off, 0, 0), (block, w, 2))

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

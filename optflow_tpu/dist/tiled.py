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

Communication (SURVEY.md §2.4 row 2): a NEIGHBOR RING exchange — each
device ppermutes its edge rows (2*halo rows each way) to the adjacent
rows-axis device over ICI, O(halo * W) per device instead of the
O(H * W) full-frame all_gather. The window a device assembles is still a
true slice of the global image: boundary devices' clamped windows reach
2*halo rows into their single neighbor, which is exactly what the
exchange provides. When blocks are too thin for one-hop assembly
(2*halo > block), the solver falls back to the all_gather path — the
halo contract itself would be questionable at that geometry anyway.

The solve's footprint is what sharding buys: the ~16 level-state arrays
and the iteration bandwidth stay block-local per device.

Flow-magnitude contract: the halo is sized for |flow| <= max_flow; a
solved flow beyond it could legitimately depend on pixels outside the
halo. Such pixels are clamped to +/-max_flow AND counted —
:func:`get_last_clip_fraction` reports the clipped fraction of the last
solve (lazy device scalar; reading syncs), and ``strict=True`` raises
instead of silently degrading (r3 verdict #5).
"""

from __future__ import annotations

import functools
import threading
import warnings
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


# Lazy telemetry of the most recent tiled solve on this thread: fraction
# of flow components clamped by the max_flow contract, plus how many
# halo rows (if any) the geometry clamp shaved off the requested halo.
# Device scalar — reading it syncs, so it is only materialized in
# get_last_clip_fraction. threading.local so concurrently dispatching
# threads don't race on it.
class _ClipTelemetry(threading.local):
    def __init__(self):
        self.fraction = None
        self.halo_shortfall = 0


_clip_telemetry = _ClipTelemetry()


def get_last_halo_shortfall() -> int:
    """Rows by which the last :func:`tiled_tvl1_flow` on this thread had
    to SHRINK the halo below the requested/derived size because the
    extended window must fit inside the image (short images with many
    row shards). Non-zero means seam quality is no longer covered by the
    :func:`default_halo` correctness argument."""
    return int(_clip_telemetry.halo_shortfall)


def get_last_clip_fraction() -> float:
    """Fraction of flow values the last :func:`tiled_tvl1_flow` on this
    thread clamped to +/-max_flow (0.0 when the contract held everywhere,
    or when no tiled solve ran yet). Reading syncs on that solve having
    finished."""
    if _clip_telemetry.fraction is None:
        return 0.0
    return float(_clip_telemetry.fraction)


def tiled_tvl1_flow(
    i0: jnp.ndarray,
    i1: jnp.ndarray,
    params: TVL1Params,
    mesh: Mesh,
    halo: Optional[int] = None,
    axis_name: str = "rows",
    level_solver=None,
    max_flow: Optional[float] = 8.0,
    strict: bool = False,
    neighbor_exchange: Optional[bool] = None,
) -> jnp.ndarray:
    """Solve TV-L1 over a section sharded by rows across ``axis_name``.

    i0, i1: (H, W) with H divisible by the rows-axis size.
    halo: extended-window rows per side; default :func:`default_halo`
      (derived from scale_step and ``max_flow``).
    max_flow: when set, the solved flow is clamped to this magnitude —
      the halo-validity contract (a flow exceeding it could legitimately
      depend on pixels beyond the halo). None disables the clamp.
    strict: raise ValueError when any flow value violates the max_flow
      contract, instead of silently clamping (forces a device sync).
    neighbor_exchange: force the ppermute ring (True) or the all_gather
      fallback (False); default picks the ring whenever one-hop assembly
      is possible (2 * halo <= block and > 1 device).
    Returns the stitched (H, W, 2) flow, sharded the same way.
    """
    n_rows = mesh.shape[axis_name]
    h, w = i0.shape
    assert h % n_rows == 0, f"H={h} must divide by rows axis {n_rows}"
    block = h // n_rows
    if halo is None:
        halo = default_halo(params, max_flow or 8.0, h, w)
    # The extended window must fit inside the image; on short images
    # with many row shards this SHRINKS the halo below the
    # correctness-derived size — the seam-error argument of
    # default_halo no longer covers the solve, so surface it
    # (warn; raise under strict) instead of degrading silently.
    halo_fit = min(halo, (h - block) // 2)
    _clip_telemetry.halo_shortfall = halo - halo_fit
    if halo_fit < halo:
        msg = (
            f"tiled_tvl1_flow: halo shrunk {halo} -> {halo_fit} rows so "
            f"the extended window fits H={h} with {n_rows} row shards; "
            f"seam accuracy is no longer covered by the halo contract. "
            f"Use fewer row shards or a shorter pyramid."
        )
        if strict:
            raise ValueError(msg)
        warnings.warn(msg, RuntimeWarning, stacklevel=2)
    halo = halo_fit
    win = block + 2 * halo
    # halo == 0 must NOT take the ring: blk[-0:] would be the whole
    # block, corrupting the window assembly (and there is nothing to
    # exchange anyway). 2*halo > block must not either: prev_tail/
    # next_head cover only 2*halo rows of each neighbor, fewer than the
    # clamped window can need — dynamic_slice would silently clamp and
    # assemble a WRONG window, so demote to the all_gather path even
    # when the caller forced the ring (advisor r4).
    if neighbor_exchange is None:
        neighbor_exchange = n_rows > 1 and 0 < 2 * halo <= block
    elif neighbor_exchange and not (0 < 2 * halo <= block):
        warnings.warn(
            f"tiled_tvl1_flow: neighbor_exchange=True demoted to "
            f"all_gather (halo={halo}, block={block}: one-hop ring "
            f"assembly needs 0 < 2*halo <= block)",
            RuntimeWarning,
            stacklevel=2,
        )
        neighbor_exchange = False

    def window_ring(blk):
        # Neighbor halo ring: device d receives the LAST 2*halo rows of
        # device d-1 and the FIRST 2*halo rows of device d+1 (one
        # ppermute hop each way, O(halo * w) over ICI), then slices its
        # clamped window out of [prev_tail | own | next_head] — which
        # covers global rows [d*block - 2h, (d+1)*block + 2h), a
        # superset of every clamped window position:
        #   interior d: start = d*block - halo   -> local offset halo
        #   d = 0:      start = 0                -> local offset 2*halo
        #   d = n-1:    start = h - win          -> local offset 0
        # Edge devices' missing neighbor contributes ppermute zeros that
        # the clamped window never reads.
        e = 2 * halo
        fwd = [(i, i + 1) for i in range(n_rows - 1)]
        bwd = [(i + 1, i) for i in range(n_rows - 1)]
        prev_tail = jax.lax.ppermute(blk[-e:], axis_name, fwd)
        next_head = jax.lax.ppermute(blk[:e], axis_name, bwd)
        ext = jnp.concatenate([prev_tail, blk, next_head], axis=0)
        idx = jax.lax.axis_index(axis_name)
        start = jnp.clip(idx * block - halo, 0, h - win)
        off = start - (idx * block - e)
        return jax.lax.dynamic_slice(ext, (off, 0), (win, w)), start

    def window_gather(blk):
        # fallback: one input-sized all_gather, every device slices its
        # clamped window from the full frame
        full = jnp.reshape(jax.lax.all_gather(blk, axis_name), (h, w))
        idx = jax.lax.axis_index(axis_name)
        start = jnp.clip(idx * block - halo, 0, h - win)
        return jax.lax.dynamic_slice(full, (start, 0), (win, w)), start

    window = window_ring if neighbor_exchange else window_gather

    def shard_fn(i0_blk, i1_blk):
        ext0, start = window(i0_blk)
        ext1, _ = window(i1_blk)
        flow = tvl1_flow(ext0, ext1, params, level_solver=level_solver)
        # my block lives at window offset idx*block - start (halo for
        # interior devices, 0 / 2*halo at the clamped edges)
        flow_blk_off = jax.lax.axis_index(axis_name) * block - start
        out = jax.lax.dynamic_slice(
            flow, (flow_blk_off, 0, 0), (block, w, 2)
        )
        # clip telemetry + clamp on the device's OWN block rows only —
        # clamped values living in discarded halo rows neither reach the
        # stitched output nor should trip strict mode (advisor r4)
        if max_flow is not None:
            clipped = jnp.mean(
                (jnp.abs(out) > max_flow).astype(jnp.float32)
            )
            clip_frac = jax.lax.pmean(clipped, axis_name)
            out = jnp.clip(out, -max_flow, max_flow)
        else:
            clip_frac = jnp.float32(0.0)
        return out, clip_frac[None]

    fn = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(axis_name, None), P(axis_name, None)),
        out_specs=(P(axis_name, None, None), P(axis_name)),
        check_vma=False,
    )
    sharding = NamedSharding(mesh, P(axis_name, None))
    i0 = jax.device_put(i0, sharding)
    i1 = jax.device_put(i1, sharding)
    flow, clip_frac = fn(i0, i1)
    _clip_telemetry.fraction = clip_frac[0]
    if strict and max_flow is not None:
        frac = float(clip_frac[0])
        if frac > 0.0:
            raise ValueError(
                f"tiled_tvl1_flow: {frac:.2%} of flow values exceed the "
                f"max_flow={max_flow} halo contract; re-run with a larger "
                f"halo/max_flow or strict=False to clamp"
            )
    return flow

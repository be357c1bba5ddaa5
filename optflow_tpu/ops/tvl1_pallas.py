"""Pallas TPU kernels for the TV-L1 solve — the framework's production
hot path.

The hot loop of the whole framework (SURVEY.md §3.1): per pyramid level
and per warp, up to ``iterations`` (default 300, src/optflow.cpp:509)
primal-dual updates over the full image. The reference's GPU solver
launches separate CUDA kernels per update (inside
cv::cuda::OpticalFlowDual_TVL1, src/optflow.cpp:516-520), round-tripping
HBM every iteration; the pure-XLA level solver in ops/tvl1.py has the
same traffic pattern and measures at the single-chip HBM roofline.

PRODUCTION PATH (round 4): the FUSED whole-level kernel
(_make_fused_kernel). One kernel invocation per pyramid level runs the
in-VMEM shift-compose warp AND every (warps x iterations) primal-dual
update with all 14 arrays resident — images and state are DMA'd once per
level, at the level's EXACT geometry (no canvas padding), one Mosaic
kernel per XLA program. Coarse levels are latency-bound, so up to G
images share an invocation (stacked on a leading axis; rolls act on
trailing axes so images never mix; the epsilon exit stays per-image).
Physical VMEM on the v5e is ~128 MiB (tools/probes/r4_vmem_cap.py), far
beyond the ~16 MiB the earlier design assumed — that number was the
default vmem_limit_bytes, not the hardware. Measured (value-readback
synced; jax.block_until_ready acks early on the axon tunnel): 46.7
MP-pairs/s steady-state at reference defaults vs 16.0 for the round-3
canvas-grouped scheme, identical oracle EPE.

Shift-warp contract: the in-kernel warp addresses taps by shifts bounded
by SHIFT_WARP_MAX; a sweep whose max|u| exceeds it clamps (bounded
sampling error), counts into per-image violation telemetry, and callers
repair offenders exactly via resolve_contract_violations (gather warp,
no magnitude ceiling — reference semantics).

LEGACY PATH (kept for interpret/CPU tests, gather-warp solves, levels
beyond the fused VMEM budget, and the OPTFLOW_TPU_SINGLETON_LEVELS /
OPTFLOW_TPU_FUSED=0 fallbacks): per-sweep structure with the iteration
loop in chunked Pallas kernels (_make_kernel) and the warp in XLA.

* State per image: 6 mutable arrays (u1, u2, p11, p12, p21, p22) packed
  as one (6, Hp, Wp) array, plus per-warp read-only arrays. |grad
  I1w|^2 is recomputed on the fly instead of stored.
* Images are padded to (Hp, Wp) = (multiple of the row block B, multiple
  of 128). Boundary masks inside the kernels use the REAL h x w so
  padding never changes the numerics: forward gradients are zeroed
  at/beyond the last real row/col and backward divergence treats the
  first real row/col as the domain edge, so pad-region values never
  propagate into real pixels.
* Legacy multi-block levels stream (B + 2K)-row halo windows; after
  k <= K iterations per chunk the interior rows are bit-identical to a
  monolithic solve (one iteration propagates one pixel).

Falls back to the pure-jnp level solver when gamma != 0 (reference
default gamma=0, src/optflow.cpp:511 — the gamma extension adds a third
primal/dual set and is not worth kernel VMEM).
"""

from __future__ import annotations

import functools
import os
import threading
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from optflow_tpu.core.config import TVL1Params
from optflow_tpu.ops.pyramid import build_pyramid, pyramid_shapes, resize_bilinear
from optflow_tpu.ops.tvl1 import tvl1_flow_level
from optflow_tpu.ops.warp import centered_gradient, warp_backward

_GRAD_EPS = 1.192092896e-07  # FLT_EPSILON guard (same as ops/tvl1.py)


def _recip(x):
    """Fast reciprocal for kernel bodies: the VPU's approximate
    reciprocal on TPU (the reference ran with CUDA fast math for the
    same ops), exact 1/x where pallas doesn't provide it (interpret
    mode / older jax)."""
    try:
        return pl.reciprocal(x, approx=True)
    except Exception:
        return 1.0 / x

# --- geometry selection -----------------------------------------------------
# VMEM per grid step ~= 9 window arrays + elementwise temporaries. The
# single-block budget is what the whole level's 9 arrays may occupy so that
# state + temporaries stay under the ~16 MiB/core VMEM (calibrated on v5e).
# A single level kernel may keep ~10 MiB of 9-array scratch resident
# (256x1024 validated on v5e hardware); larger levels run in row-block
# chunks. The DISTINCT-kernel count per XLA program is the hard
# constraint: three or more large distinct Mosaic kernels in one program
# fault the v5e worker (two are fine; same-geometry repeats are fine), so
# the coarse-to-fine driver buckets all levels onto TWO shared canvases
# (see _assign_canvases) with the real sizes passed as SMEM scalars.
_SINGLE_BLOCK_BUDGET = 10 * 1024 * 1024  # 9-array scratch bytes
_CHUNK_WINDOW_BUDGET = int(2.5 * 1024 * 1024)
_DEFAULT_K = 8  # halo rows == iterations per chunk in multi-block mode
_CANVAS_B_BUDGET = int(3.3 * 1024 * 1024)  # scratch cap for the small canvas

# Fused-level kernel budget. Physical VMEM on the v5e is ~128 MiB
# (tools/probes/r4_vmem_cap.py ran 127 MiB of scratch clean — the
# round-2 "~16 MiB" calibration was the DEFAULT vmem_limit_bytes, not
# the hardware). Mosaic's scoped-vmem accounting for this kernel costs
# ~61 array-slots per pixel (13 resident scratch arrays + warp/iteration
# temporaries alive across the loops; measured from the compiler's
# "scoped allocation 107.62M" report at (G=16, 72, 384)), i.e. ~250
# bytes/px. The stack picker and geometry checks budget against that.
_FUSED_VMEM_LIMIT = 110 * 1024 * 1024
_FUSED_BYTES_PER_PX = 250
_FUSED_PX_BUDGET = int(_FUSED_VMEM_LIMIT * 0.92) // _FUSED_BYTES_PER_PX


def _fused_px_budget(s_max: int = 8) -> int:
    """Pixel budget for the fused kernel at a given warp tap-shift bound.
    Wider contracts keep more roll/select temporaries alive: measured
    118.08M scoped at (G=4, 136, 640) for s_max=16 (~339 B/px) vs ~250
    B/px at the production s_max=8 — modeled as +12 B/px per extra tap."""
    per_px = _FUSED_BYTES_PER_PX + 12 * max(0, s_max - 8)
    return int(_FUSED_VMEM_LIMIT * 0.92) // per_px


def _vmem_limit(geo: "_Geometry") -> int:
    """Per-call VMEM cap: the 9 scratch window arrays plus Mosaic's
    elementwise/roll temporaries (~8 more arrays' worth) and fixed
    overhead, measured against the compiler's 'exceeded scoped vmem'
    errors (10.5 arrays' worth fails; the dynamic-dims kernel needs ~1.5
    windows more than the static one did)."""
    window = geo.win * geo.wp * 4
    return 18 * window + (2 << 20)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


class _Geometry(NamedTuple):
    hp: int  # padded rows (nb * block)
    wp: int  # padded cols (multiple of 128)
    block: int  # interior rows per grid step
    halo: int  # halo rows each side (== max iterations per chunk)
    win: int  # block + 2 * halo
    nb: int  # number of row blocks


def _select_geometry(h: int, w: int, k: int = _DEFAULT_K) -> _Geometry:
    wp = _round_up(w, 128)
    hp = _round_up(h, 8)
    if 9 * hp * wp * 4 <= _SINGLE_BLOCK_BUDGET:
        return _Geometry(hp, wp, hp, 0, hp, 1)
    # multi-block: largest window under budget, block = win - 2k. Halo and
    # block must be multiples of 8 (f32 sublane tile) so DMA row offsets are
    # provably tile-aligned.
    k = _round_up(k, 8)
    win_rows = _CHUNK_WINDOW_BUDGET // (9 * wp * 4)
    win_rows = max(int(win_rows) // 8 * 8, 2 * k + 16)
    block = win_rows - 2 * k
    nb = -(-hp // block)
    block = _round_up(-(-hp // nb), 8)
    hp = block * nb
    return _Geometry(hp, wp, block, k, block + 2 * k, nb)


def _assign_canvases(shapes) -> list:
    """Map each pyramid level shape to one of (at most) TWO shared kernel
    canvases: canvas A is the finest level's geometry (it holds every
    level), canvas B the geometry of the first level whose single-block
    scratch fits _CANVAS_B_BUDGET (it holds that level and everything
    coarser). Two canvases bound the distinct-Mosaic-kernel count per
    program at 2, which the v5e worker tolerates; the padding waste is
    ~2x VPU work against a ~38x per-iteration advantage."""
    canvas_a = _select_geometry(*shapes[0])
    canvas_b = None
    b_from = len(shapes)
    for idx, (h, w) in enumerate(shapes):
        if idx == 0:
            continue
        hp = _round_up(h, 8)
        wp = _round_up(w, 128)
        if 9 * hp * wp * 4 <= _CANVAS_B_BUDGET:
            canvas_b = _select_geometry(h, w)
            b_from = idx
            break
    return [
        canvas_b if (canvas_b is not None and i >= b_from) else canvas_a
        for i in range(len(shapes))
    ]


# --- fused level kernel ------------------------------------------------------


def _fused_geometry(h: int, w: int, s_max: int = 8) -> _Geometry:
    """Whole-level single-block geometry for the fused kernel (no row
    chunking: the in-kernel warp's row shifts need the full height)."""
    hp = _round_up(h, 8)
    wp = _round_up(w, 128)
    assert hp * wp <= _fused_px_budget(s_max), (h, w, s_max)
    return _Geometry(hp, wp, hp, 0, hp, 1)


def _pick_stack(n: int, geo: _Geometry, s_max: int = 8) -> int:
    """Images per kernel invocation. Coarse pyramid levels are LATENCY
    bound — hundreds of while-loop iterations whose per-step reduce and
    branch overhead dwarfs the ~10k px of VPU work — so as many images as
    fit the VMEM budget share one invocation (their arrays stacked on a
    leading axis; rolls on the trailing row/col axes never mix images).
    Returns the largest divisor of n whose stacked scratch fits."""
    g = 1
    budget = _fused_px_budget(s_max)
    for cand in range(n, 0, -1):
        if n % cand == 0 and cand * geo.hp * geo.wp <= budget:
            g = cand
            break
    return g


# A/B lever (PERF_NOTES_r04 §5 #1): store the per-sweep read-only warp
# arrays (i1wx, i1wy, rho_c) as bf16 — halves their VMEM read traffic at
# the cost of a cast per read in the iteration body. EPE-gated by bench.
_BF16_WARP = os.environ.get("OPTFLOW_TPU_BF16_WARP", "0") == "1"


def _make_fused_kernel(
    geo: _Geometry,
    g: int,
    l_t: float,
    theta: float,
    taut: float,
    warps: int,
    s_max: int,
    unroll: int = 1,
    bf16_warp: bool = False,
):
    """ONE kernel per pyramid level: all ``warps`` re-linearizations AND
    their primal-dual iteration loops run in a single launch with every
    array VMEM-resident — the level's images are DMA'd in once, the warp
    runs in-VMEM (shift-compose, |u| <= s_max contract), and only the
    final state is DMA'd out. Replaces, per level: 5 XLA warp-sweep
    round-trips through HBM, 5 kernel launches with window re-DMA, and
    the canvas padding of the grouped scheme (each level gets its EXACT
    geometry — one distinct Mosaic kernel per XLA program, the
    configuration the v5e worker provably tolerates).

    Physical VMEM on the v5e is ~128 MiB (tools/probes/r4_vmem_cap.py),
    so the 14 resident arrays fit whole levels up to ~1 Mpx.

    Contract handling is in-kernel: a sweep whose masked max|u| exceeds
    s_max has its tap shifts clamped (bounded sampling error) and
    increments this invocation's violation counter output; callers
    surface the counts (get_last_fallback_sweeps) and can re-solve
    offending images with the exact gather-warp path. In production
    (max_flow <= 8 contract, BASELINE.md) the counter stays 0.

    ``g`` images share each invocation (grid step), stacked on a leading
    axis of every scratch array: rolls run on the trailing row/col axes
    so images never mix, the boundary masks broadcast over the stack,
    and the epsilon exit tests the MAX of the per-image squared-update
    errors — the loop runs until the slowest stacked image meets the
    reference's per-image criterion. (A stack-TOTAL criterion was tried
    and measured 33% slower end-to-end: it forced near-max iterations on
    every coarse group because the summed error of G images rarely
    drops below a single image's threshold.) Stacking amortizes the
    invocation + while-loop-step latency that dominates coarse levels.
    """
    hp, wp, block, halo, win, nb = geo
    assert nb == 1
    S = int(s_max)
    G = int(g)

    def hat(t):
        # central lobe of the Catmull-Rom cubic on t in [0, 1]
        return t * t * (1.5 * t - 2.5) + 1.0

    def kernel(dims_ref, thr_ref, img_ref, st_ref, out_ref, err_ref,
               viol_ref, mxu_ref, iters_ref, img_s, pk_s, wp_s, st_s,
               sem_in, sem_out):
        m = dims_ref[0]
        h = dims_ref[1]
        w = dims_ref[2]
        thresh = thr_ref[0]
        n = pl.program_id(0)

        cp_img = pltpu.make_async_copy(img_ref.at[n], img_s, sem_in.at[0])
        cp_st = pltpu.make_async_copy(st_ref.at[n], st_s, sem_in.at[1])
        cp_img.start()
        cp_st.start()
        cp_img.wait()
        cp_st.wait()

        # values carry a leading stack axis: (G, hp, wp); masks are 2D and
        # broadcast over it. Row/col rolls act on the trailing axes, so
        # stacked images never exchange rows.
        rows = jax.lax.broadcasted_iota(jnp.int32, (hp, 1), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (1, wp), 1)
        first_row = rows == 0
        last_row = rows >= h - 1
        first_col = cols == 0
        last_col = cols >= w - 1
        err_row = (rows < h).astype(jnp.float32)
        err_col = (cols < w).astype(jnp.float32)

        i0 = img_s[0]
        i1 = img_s[1]
        # centered gradient of i1, replicate border at the REAL h x w
        # (ops/warp.py centered_gradient semantics)
        nxt = pltpu.roll(i1, wp - 1, 2)
        prv = pltpu.roll(i1, 1, 2)
        gx = 0.5 * (
            jnp.where(last_col, i1, nxt) - jnp.where(first_col, i1, prv)
        )
        dwn = pltpu.roll(i1, hp - 1, 1)
        up = pltpu.roll(i1, 1, 1)
        gy = 0.5 * (
            jnp.where(last_row, i1, dwn) - jnp.where(first_row, i1, up)
        )
        pk_s[0] = i1
        pk_s[1] = gx
        pk_s[2] = gy

        def div(p1, p2):
            dx = p1 - pltpu.roll(p1, 1, 2)
            dx = jnp.where(first_col, p1, dx)
            dy = p2 - pltpu.roll(p2, 1, 1)
            dy = jnp.where(first_row, p2, dy)
            return dx + dy

        def fwd_grad(u):
            ux = pltpu.roll(u, wp - 1, 2) - u
            ux = jnp.where(last_col, 0.0, ux)
            uy = pltpu.roll(u, hp - 1, 1) - u
            uy = jnp.where(last_row, 0.0, uy)
            return ux, uy

        ones_col = jnp.ones((wp, 1), jnp.float32)

        def iter_body(carry):
            it, _ = carry
            u1 = st_s[0]
            u2 = st_s[1]
            if bf16_warp:
                i1wx = wp_s[0].astype(jnp.float32)
                i1wy = wp_s[1].astype(jnp.float32)
                rho_c = wp_s[2].astype(jnp.float32)
            else:
                i1wx = wp_s[0]
                i1wy = wp_s[1]
                rho_c = wp_s[2]
            grad = i1wx * i1wx + i1wy * i1wy
            rho = rho_c + i1wx * u1 + i1wy * u2
            hi_t = l_t * grad
            lo = rho < -hi_t
            hi = rho > hi_t
            # approximate reciprocals: tools_kernel_ablate.py puts the 5
            # divides at a measurable share of the iteration; the
            # reference's own build used CUDA fast math throughout
            # (ENABLE_FAST_MATH/CUDA_FAST_MATH, singularity/optflow.def
            # :33-35), and the EPE/oracle bench gates guard accuracy.
            # Interpret mode lowers pl.reciprocal exactly, keeping the
            # CPU bit-parity tests meaningful.
            fi = -rho * _recip(jnp.maximum(grad, _GRAD_EPS))
            mid_ok = grad > _GRAD_EPS
            d1 = jnp.where(
                lo, l_t * i1wx,
                jnp.where(hi, -l_t * i1wx, jnp.where(mid_ok, fi * i1wx, 0.0)),
            )
            d2 = jnp.where(
                lo, l_t * i1wy,
                jnp.where(hi, -l_t * i1wy, jnp.where(mid_ok, fi * i1wy, 0.0)),
            )
            u1n = u1 + d1 + theta * div(st_s[2], st_s[3])
            u2n = u2 + d2 + theta * div(st_s[4], st_s[5])
            # Exit on the MAX of the per-image squared-update errors so
            # the epsilon exit keeps the reference's per-image
            # granularity: the loop runs until the SLOWEST stacked image
            # converges (a stack-total criterion was measured 33% slower
            # end-to-end — it forced near-max iterations on every coarse
            # group). Mosaic cannot emit rank-1 reduction outputs
            # (layout_rank/implicit-dim crashes), so the per-image totals
            # of the G > 1 case come from an MXU dot with a ones vector:
            # (G, wp) @ (wp, 1) stays rank-2 end to end.
            sq = ((u1n - u1) ** 2 + (u2n - u2) ** 2) * err_row * err_col
            if G == 1:
                err = jnp.sum(sq)
            else:
                partial = jnp.sum(sq, axis=1)  # (G, wp)
                err = jnp.max(jnp.dot(partial, ones_col))
            st_s[0] = u1n
            st_s[1] = u2n
            u1x, u1y = fwd_grad(u1n)
            u2x, u2y = fwd_grad(u2n)
            # plain sqrt: an s * rsqrt(s) rewrite A/B-measured 7% SLOWER
            # end-to-end (52.3 vs 56.2 MP-pairs/s) — Mosaic's sqrt
            # lowering is already good and the extra max/mul lose.
            ng1 = 1.0 + taut * jnp.sqrt(u1x * u1x + u1y * u1y)
            ng2 = 1.0 + taut * jnp.sqrt(u2x * u2x + u2y * u2y)
            r1 = _recip(ng1)
            r2 = _recip(ng2)
            st_s[2] = (st_s[2] + taut * u1x) * r1
            st_s[3] = (st_s[3] + taut * u1y) * r1
            st_s[4] = (st_s[4] + taut * u2x) * r2
            st_s[5] = (st_s[5] + taut * u2y) * r2
            return it + 1, err

        if unroll > 1:
            # LATENCY-bound invocations (small stacked levels) spend a
            # fixed per-while-step cost on the scalar err reduce readback
            # and branch; running ``unroll`` updates per step divides it.
            # The exit check coarsens to every ``unroll`` iterations —
            # up to unroll-1 extra updates per sweep, which only tighten
            # convergence (EPE/oracle gated).
            _one = iter_body

            def iter_body(carry):  # noqa: F811
                c = _one(carry)
                for _ in range(unroll - 1):
                    c = _one(c)
                return c

        def iter_cond(carry):
            it, err = carry
            return (it < m) & (err > thresh)

        # Mosaic iota must be integer; cast to f32 after
        xs = jax.lax.broadcasted_iota(jnp.int32, (hp, wp), 1).astype(
            jnp.float32
        )
        ys = jax.lax.broadcasted_iota(jnp.int32, (hp, wp), 0).astype(
            jnp.float32
        )

        def sweep(wi, carry):
            viol, mxu, iters, _ = carry
            u1 = st_s[0]
            u2 = st_s[1]
            # Telemetry mask: real pixels AND foreground (frame1 > 1.0
            # intensity — the reference's background rule, src/optflow
            # .cpp:467-473, under which post-processing force-zeroes the
            # flow anyway). Affine-warped production frames carry black
            # borders whose locally-exploding flow would otherwise flag
            # violations whose repair cannot change any observable
            # output. Contract violations at foreground pixels still
            # count fully.
            mask = err_row * err_col * (img_s[1] > 1.0).astype(
                jnp.float32
            )
            # PER-IMAGE violation counters: a statically unrolled loop of
            # G proven scalar full-reduces (vector-valued reduces trip
            # Mosaic's rank-1 layout crashes). One outlier image then
            # repairs alone instead of dragging its whole stack onto the
            # slow exact path. The max |u| rides along so callers can
            # judge HOW FAR a violating sweep entered beyond the
            # contract (sub-margin overshoots skip the exact repair).
            absu = jnp.maximum(jnp.abs(u1), jnp.abs(u2)) * mask
            absm = tuple(jnp.max(absu[g]) for g in range(G))
            viol = tuple(
                v + (absm[g] > S).astype(jnp.int32)
                for g, v in enumerate(viol)
            )
            mxu = tuple(
                jnp.maximum(m, absm[g]) for g, m in enumerate(mxu)
            )

            wf = w.astype(jnp.float32)
            hf = h.astype(jnp.float32)
            x = jnp.clip(xs + u1, 0.0, wf - 1.0)
            y = jnp.clip(ys + u2, 0.0, hf - 1.0)
            x0 = jnp.minimum(jnp.floor(x), wf - 2.0)
            y0 = jnp.minimum(jnp.floor(y), hf - 2.0)
            fx = x - x0
            fy = y - y0
            sx = jnp.clip(x0 - xs, -S, S).astype(jnp.int32)
            sy = jnp.clip(y0 - ys, -S, S).astype(jnp.int32)
            wx0 = hat(fx)
            wx1 = hat(1.0 - fx)
            wy0 = hat(fy)
            wy1 = hat(1.0 - fy)
            inv_norm = 1.0 / ((wx0 + wx1) * (wy0 + wy1))

            # shift-compose warp of (i1, i1x, i1y), X pass then Y pass.
            # q walks the tap offset incrementally: one unit roll per
            # step (cheapest lane/sublane shift) instead of 2S+2
            # arbitrary rolls. Wrap-around rows/cols are never selected:
            # sx == s implies 0 <= j + s <= w - 2 (taps clamped inside
            # the real image).
            P = pk_s[...]  # (3, G, hp, wp): cols axis 3, rows axis 2
            q = pltpu.roll(P, S, 3)
            acc = jnp.zeros_like(P)
            for s in range(-S, S + 1):
                qn = pltpu.roll(q, wp - 1, 3)
                acc = jnp.where(
                    (sx == s)[None], wx0[None] * q + wx1[None] * qn, acc
                )
                q = qn
            q = pltpu.roll(acc, S, 2)
            out = jnp.zeros_like(acc)
            for s in range(-S, S + 1):
                qn = pltpu.roll(q, hp - 1, 2)
                out = jnp.where(
                    (sy == s)[None], wy0[None] * q + wy1[None] * qn, out
                )
                q = qn
            i1w = inv_norm * out[0]
            i1wx = inv_norm * out[1]
            i1wy = inv_norm * out[2]
            rho_c_new = i1w - i1wx * u1 - i1wy * u2 - i0
            if bf16_warp:
                wp_s[0] = i1wx.astype(jnp.bfloat16)
                wp_s[1] = i1wy.astype(jnp.bfloat16)
                wp_s[2] = rho_c_new.astype(jnp.bfloat16)
            else:
                wp_s[0] = i1wx
                wp_s[1] = i1wy
                wp_s[2] = rho_c_new

            it_fin, err_fin = jax.lax.while_loop(
                iter_cond, iter_body, (jnp.int32(0), jnp.float32(jnp.inf))
            )
            return viol, mxu, iters + it_fin, err_fin

        viol, mxu, iters, err_fin = jax.lax.fori_loop(
            0, warps, sweep,
            (tuple(jnp.int32(0) for _ in range(G)),
             tuple(jnp.float32(0.0) for _ in range(G)), jnp.int32(0),
             jnp.float32(jnp.inf)),
        )
        err_ref[n, 0] = err_fin
        for g_i in range(G):
            viol_ref[n, g_i] = viol[g_i]
            mxu_ref[n, g_i] = mxu[g_i]
        iters_ref[n, 0] = iters

        cp_out = pltpu.make_async_copy(st_s, out_ref.at[n], sem_out)
        cp_out.start()
        cp_out.wait()

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("geo", "g", "l_t", "theta", "taut", "warps", "s_max",
                     "unroll", "bf16_warp", "interpret"),
)
def _run_fused(
    imgs: jnp.ndarray,  # (NG, 2, G, Hp, Wp) f32: i0, i1
    state: jnp.ndarray,  # (NG, 6, G, Hp, Wp) f32
    m: jnp.ndarray,  # () int32 iterations per warp
    h: jnp.ndarray,  # () int32 real rows
    w: jnp.ndarray,  # () int32 real cols
    thresh: jnp.ndarray,  # () f32 epsilon exit (< 0 disables)
    geo: _Geometry,
    g: int,
    l_t: float,
    theta: float,
    taut: float,
    warps: int,
    s_max: int,
    unroll: int = 1,
    bf16_warp: bool = False,
    interpret: bool = False,
):
    ng = imgs.shape[0]
    kernel = _make_fused_kernel(
        geo, g, l_t, theta, taut, warps, s_max, unroll, bf16_warp
    )
    hbm_spec = pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)
    dims = jnp.stack(
        [m.astype(jnp.int32), h.astype(jnp.int32), w.astype(jnp.int32)]
    )
    new_state, errs, viol, mxu, iters = pl.pallas_call(
        kernel,
        grid=(ng,),
        out_shape=(
            jax.ShapeDtypeStruct(state.shape, jnp.float32),
            jax.ShapeDtypeStruct((ng, 1), jnp.float32),
            jax.ShapeDtypeStruct((ng, g), jnp.int32),  # per-image viols
            jax.ShapeDtypeStruct((ng, g), jnp.float32),  # per-image max|u|
            jax.ShapeDtypeStruct((ng, 1), jnp.int32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            hbm_spec,
            hbm_spec,
        ],
        out_specs=(
            hbm_spec,
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, g, geo.win, geo.wp), jnp.float32),  # i0, i1
            pltpu.VMEM((3, g, geo.win, geo.wp), jnp.float32),  # i1, gx, gy
            pltpu.VMEM(
                (3, g, geo.win, geo.wp),
                jnp.bfloat16 if bf16_warp else jnp.float32,
            ),  # warped
            pltpu.VMEM((6, g, geo.win, geo.wp), jnp.float32),  # state
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_FUSED_VMEM_LIMIT
        ),
        interpret=interpret,
    )(dims, thresh.reshape(1).astype(jnp.float32), imgs, state)
    return new_state, errs, viol, mxu, iters


@functools.lru_cache(maxsize=512)
def _fused_level_fn(
    n: int,
    shape: Tuple[int, int],
    next_shape: Optional[Tuple[int, int]],
    params: TVL1Params,
    interpret: bool,
    s_max: int,
):
    """ONE jitted program per pyramid level for the fused path: pad to the
    level's exact tile geometry, run the fused kernel (all warps +
    iterations in one launch), slice, and upscale the flow to the next
    finer level. Exactly one distinct Mosaic kernel per program."""
    h, w = shape
    geo = _fused_geometry(h, w, s_max)
    g = _pick_stack(n, geo, s_max)
    ng = n // g
    # Iteration-loop unroll: A/B-measured a NEGATIVE on hardware and
    # kept OFF. Hypothesis was that small stacked levels are bound by
    # the per-while-step err-reduce/branch latency; measured (r5):
    # unroll 2/4 on the small levels left the headline unchanged
    # (56.16 vs 56.2 MP-pairs/s) and made the latency-bound
    # (1, 1024, 1024) solve 9% SLOWER (40.9 vs 37.2 ms) at identical
    # px-iteration counts — Mosaic schedules the larger loop body
    # worse, and the reduce was not the bottleneck. Set
    # OPTFLOW_TPU_UNROLL to re-measure.
    unroll = int(os.environ.get("OPTFLOW_TPU_UNROLL", "1"))
    while unroll > 1 and params.iterations % unroll:
        unroll //= 2
    l_t = float(params.lambda_ * params.theta)
    theta = float(params.theta)
    taut = float(params.tau / params.theta)
    scaled_eps = float(params.epsilon * params.epsilon * h * w)
    use_eps = params.epsilon > 0
    resize = jax.vmap(resize_bilinear, in_axes=(0, None))
    inv = 1.0 / params.scale_step

    def stack(x):  # (N, C, hp, wp) -> (N/G, C, G, hp, wp)
        c = x.shape[1]
        return x.reshape(ng, g, c, geo.hp, geo.wp).transpose(0, 2, 1, 3, 4)

    def step(i0, i1, u1, u2):
        imgs = stack(_pad_hw(jnp.stack([i0, i1], axis=1), geo.hp, geo.wp))
        state = stack(
            _pad_hw(
                jnp.concatenate(
                    [u1[:, None], u2[:, None],
                     jnp.zeros((n, 4, h, w), jnp.float32)],
                    axis=1,
                ),
                geo.hp,
                geo.wp,
            )
        )
        state, _, viol, mxu, iters = _run_fused(
            imgs,
            state,
            jnp.int32(params.iterations),
            jnp.int32(h),
            jnp.int32(w),
            jnp.float32(scaled_eps if use_eps else -1.0),
            geo=geo,
            g=g,
            l_t=l_t,
            theta=theta,
            taut=taut,
            warps=int(params.warps),
            s_max=int(s_max),
            unroll=unroll,
            bf16_warp=_BF16_WARP,
            interpret=interpret,
        )
        state = state.transpose(0, 2, 1, 3, 4).reshape(
            n, 6, geo.hp, geo.wp
        )
        u1 = state[:, 0, :h, :w]
        u2 = state[:, 1, :h, :w]
        if next_shape is not None:
            u1 = resize(u1, next_shape) * inv
            u2 = resize(u2, next_shape) * inv
        # viol/max|u| are per image already ((ng, g) kernel outputs);
        # iterations are per invocation — every stacked image ran that
        # many
        viol_img = viol.reshape(n)
        mxu_img = mxu.reshape(n)
        iters_img = jnp.repeat(iters[:, 0], g)
        return u1, u2, viol_img, iters_img, mxu_img

    return jax.jit(step)


# --- blocked fused kernel (big levels) ---------------------------------------
#
# Pyramid levels beyond _FUSED_PX_BUDGET stream row blocks through VMEM
# instead of dropping the whole pyramid to the legacy path (r4 verdict
# #2: an 11.6 vs 56 MP-pairs/s cliff right above 0.42 Mpx). Structure:
# ONE kernel launch per level with grid (n, warps * C, nb) — every warp
# sweep AND every k-iteration chunk of every row block runs inside a
# single program, like the monolithic fused kernel:
#
#  - chunk 0 of each sweep: DMA the (i0, i1, i1x, i1y) sources + state
#    window, run the in-VMEM shift-compose warp over the window (halo =
#    k + S makes it valid exactly on the iteration window), store the
#    warped arrays' interior rows to HBM, run k iterations;
#  - later chunks: DMA the stored warped arrays + state window, run k
#    iterations. After k <= halo - S iterations the interior rows are
#    bit-identical to a monolithic solve (one iteration propagates one
#    pixel; the warp-invalid window edge sits k + S rows out).
#  - state ping-pongs between TWO HBM buffers; which one is current is
#    tracked in an SMEM scalar, so chunks of a CONVERGED sweep skip with
#    ZERO DMA (no pass-through copies — the buffer pointer just doesn't
#    flip). The kernel emits the final buffer index per image.
#  - the epsilon exit is GLOBAL (the reference's whole-image criterion)
#    at k-iteration granularity: each chunk writes its block-interior
#    squared-update sum to an SMEM errs table; the next chunk sums the
#    previous row across blocks and skips once it falls under the
#    threshold. Granularity-k overshoot only tightens convergence.

# Iterations per chunk == halo refresh cadence. Bigger k amortizes the
# per-chunk window DMA over more iterations (the dominant blocked-level
# overhead at k=8) at the cost of a wider halo and up to k-1 extra
# iterations per sweep from the chunk-granular epsilon exit.
# OPTFLOW_TPU_BLOCKED_K overrides for A/B measurement.
_BLOCKED_K = int(os.environ.get("OPTFLOW_TPU_BLOCKED_K", "16"))
# Mosaic scoped-vmem model for the blocked kernel: 13 resident window
# arrays (6 state + 3 warped + 4 sources) + iteration/warp temporaries;
# conservative bound calibrated against the monolithic kernel's measured
# ~250 B/px with its larger warp liveness. Wider warp contracts add
# temporaries like the fused kernel (see _fused_px_budget).
_BLOCKED_BYTES_PER_PX = 220


def _blocked_geometry(
    h: int, w: int, s_max: int, k: int = _BLOCKED_K,
    budget: Optional[int] = None,
) -> _Geometry:
    """Row-block geometry for the blocked fused kernel: the largest
    window whose scoped-vmem estimate fits, halo = k + s_max rows each
    side (k for iteration reach, s_max for the warp's tap shifts). All
    row quantities are multiples of 8 (f32 sublane tile) so DMA offsets
    stay provably aligned."""
    wp = _round_up(w, 128)
    hp = _round_up(h, 8)
    if budget is None:
        budget = int(_FUSED_VMEM_LIMIT * 0.92)
    per_px = _BLOCKED_BYTES_PER_PX + 12 * max(0, s_max - 8)
    win_max = budget // (per_px * wp) // 8 * 8
    halo = _round_up(k + s_max, 8)
    if hp <= win_max:
        # whole level fits one window: no halo needed, chunked
        # iterations only (still exact — the window IS the level)
        return _Geometry(hp, wp, hp, 0, hp, 1)
    block = win_max - 2 * halo
    assert block >= 8, (h, w, win_max, halo)
    nb = -(-hp // block)
    block = _round_up(-(-hp // nb), 8)
    hp = block * nb
    win = block + 2 * halo
    assert hp >= win, (h, w, block, halo, nb)
    return _Geometry(hp, wp, block, halo, win, nb)


def _make_blocked_kernel(
    geo: _Geometry,
    l_t: float,
    theta: float,
    taut: float,
    warps: int,
    s_max: int,
    k: int,
    n_chunks: int,  # C = chunks per sweep
    m_last: int,  # iterations in the last chunk of a sweep
):
    """Whole-level blocked kernel body (see module-section comment)."""
    hp, wp, block, halo, win, nb = geo
    S = int(s_max)
    C = int(n_chunks)

    def hat(t):
        return t * t * (1.5 * t - 2.5) + 1.0

    def kernel(dims_ref, thr_ref, src_ref, st_init_ref, st0_ref, st1_ref,
               wr_ref, err_ref, viol_ref, mxu_ref, fin_ref, src_s, wp_s,
               st_s, cur_s, sem_in, sem_out):
        h = dims_ref[0]
        w = dims_ref[1]
        thresh = thr_ref[0]
        n = pl.program_id(0)
        c = pl.program_id(1)
        i = pl.program_id(2)
        sweep = c // C
        in_sweep = c - sweep * C
        is_start = in_sweep == 0

        # window placement (multiples of 8 by construction)
        start = pl.multiple_of(jnp.clip(i * block - halo, 0, hp - win), 8)
        off = pl.multiple_of(i * block - start, 8)  # local interior row 0
        out_row = pl.multiple_of(i * block, 8)

        @pl.when(jnp.logical_and(c == 0, i == 0))
        def _init_cur():
            cur_s[0] = jnp.int32(2)  # 2 = the init-state input buffer

        # converged? (never on a sweep's first chunk; thresh < 0 disables)
        prev_err = jnp.float32(0.0)
        for j in range(nb):
            prev_err += err_ref[n, jnp.maximum(c - 1, 0), j]
        conv = jnp.logical_and(
            jnp.logical_not(is_start),
            jnp.logical_and(thresh >= 0.0, prev_err <= thresh),
        )

        @pl.when(conv)
        def _skip():
            err_ref[n, c, i] = 0.0  # sticky: stays under threshold

        @pl.when(jnp.logical_not(conv))
        def _run():
            cur = cur_s[0]
            rows = start + jax.lax.broadcasted_iota(jnp.int32, (win, 1), 0)
            cols = jax.lax.broadcasted_iota(jnp.int32, (1, wp), 1)
            first_row = rows == 0
            last_row = rows >= h - 1
            first_col = cols == 0
            last_col = cols >= w - 1
            err_row = (
                (rows >= out_row) & (rows < out_row + block) & (rows < h)
            ).astype(jnp.float32)
            err_col = (cols < w).astype(jnp.float32)

            # ---- DMA in: state from the current buffer, plus sources
            # (sweep start) or the stored warped arrays (mid-sweep).
            # Starts first (both transfers overlap), then waits that
            # mirror each start's descriptor exactly.
            def _st_copy(ref):
                return pltpu.make_async_copy(
                    ref.at[n, :, pl.ds(start, win), :], st_s, sem_in.at[0]
                )

            def _src_copy():
                return pltpu.make_async_copy(
                    src_ref.at[n, :, pl.ds(start, win), :], src_s,
                    sem_in.at[1],
                )

            def _wr_copy():
                return pltpu.make_async_copy(
                    wr_ref.at[n, :, pl.ds(start, win), :], wp_s,
                    sem_in.at[1],
                )

            @pl.when(cur == 2)
            def _():
                _st_copy(st_init_ref).start()

            @pl.when(cur == 0)
            def _():
                _st_copy(st0_ref).start()

            @pl.when(cur == 1)
            def _():
                _st_copy(st1_ref).start()

            @pl.when(is_start)
            def _():
                _src_copy().start()

            @pl.when(jnp.logical_not(is_start))
            def _():
                _wr_copy().start()

            @pl.when(cur == 2)
            def _():
                _st_copy(st_init_ref).wait()

            @pl.when(cur == 0)
            def _():
                _st_copy(st0_ref).wait()

            @pl.when(cur == 1)
            def _():
                _st_copy(st1_ref).wait()

            @pl.when(is_start)
            def _():
                _src_copy().wait()

            @pl.when(jnp.logical_not(is_start))
            def _():
                _wr_copy().wait()

            # ---- sweep start: in-VMEM warp + violation telemetry -------
            @pl.when(is_start)
            def _warp():
                u1 = st_s[0]
                u2 = st_s[1]
                # foreground-masked telemetry, as in the fused kernel:
                # background (frame1 <= 1.0) flow is force-zeroed by
                # post-processing, so its overshoots are unobservable
                mask = err_row * err_col * (src_s[1] > 1.0).astype(
                    jnp.float32
                )
                absu = jnp.maximum(jnp.abs(u1), jnp.abs(u2)) * mask
                absm = jnp.max(absu)
                viol_ref[n, sweep, i] = (absm > S).astype(jnp.int32)
                mxu_ref[n, sweep, i] = absm

                xs = jax.lax.broadcasted_iota(jnp.int32, (win, wp), 1)
                ys = start + jax.lax.broadcasted_iota(
                    jnp.int32, (win, wp), 0
                )
                xs = xs.astype(jnp.float32)
                ys = ys.astype(jnp.float32)
                wf = w.astype(jnp.float32)
                hf = h.astype(jnp.float32)
                x = jnp.clip(xs + u1, 0.0, wf - 1.0)
                y = jnp.clip(ys + u2, 0.0, hf - 1.0)
                x0 = jnp.minimum(jnp.floor(x), wf - 2.0)
                y0 = jnp.minimum(jnp.floor(y), hf - 2.0)
                fx = x - x0
                fy = y - y0
                sx = jnp.clip(x0 - xs, -S, S).astype(jnp.int32)
                sy = jnp.clip(y0 - ys, -S, S).astype(jnp.int32)
                wx0 = hat(fx)
                wx1 = hat(1.0 - fx)
                wy0 = hat(fy)
                wy1 = hat(1.0 - fy)
                inv_norm = 1.0 / ((wx0 + wx1) * (wy0 + wy1))

                # shift-compose warp of (i1, i1x, i1y) = src_s[1:4].
                # X pass accumulates into wp_s (bounds live values),
                # then the Y pass reads it back.
                P = src_s[1:4]  # (3, win, wp)
                q = pltpu.roll(P, S, 2)
                acc = jnp.zeros_like(P)
                for s in range(-S, S + 1):
                    qn = pltpu.roll(q, wp - 1, 2)
                    acc = jnp.where(
                        (sx == s)[None], wx0[None] * q + wx1[None] * qn,
                        acc,
                    )
                    q = qn
                wp_s[...] = acc
                q = pltpu.roll(wp_s[...], S, 1)
                out = jnp.zeros_like(q)
                for s in range(-S, S + 1):
                    qn = pltpu.roll(q, win - 1, 1)
                    out = jnp.where(
                        (sy == s)[None], wy0[None] * q + wy1[None] * qn,
                        out,
                    )
                    q = qn
                i1w = inv_norm * out[0]
                i1wx = inv_norm * out[1]
                i1wy = inv_norm * out[2]
                wp_s[0] = i1wx
                wp_s[1] = i1wy
                wp_s[2] = i1w - i1wx * u1 - i1wy * u2 - src_s[0]
                # persist this block's interior of the warped arrays for
                # the sweep's later chunks (stitched across blocks)
                cp_w = pltpu.make_async_copy(
                    wp_s.at[:, pl.ds(off, block), :],
                    wr_ref.at[n, :, pl.ds(out_row, block), :],
                    sem_out,
                )
                cp_w.start()
                cp_w.wait()

            # ---- k primal-dual iterations ------------------------------
            def div(p1, p2):
                dx = p1 - pltpu.roll(p1, 1, 1)
                dx = jnp.where(first_col, p1, dx)
                dy = p2 - pltpu.roll(p2, 1, 0)
                dy = jnp.where(first_row, p2, dy)
                return dx + dy

            def fwd_grad(u):
                ux = pltpu.roll(u, wp - 1, 1) - u
                ux = jnp.where(last_col, 0.0, ux)
                uy = pltpu.roll(u, win - 1, 0) - u
                uy = jnp.where(last_row, 0.0, uy)
                return ux, uy

            def body(_, carry):
                del _
                u1 = st_s[0]
                u2 = st_s[1]
                i1wx = wp_s[0]
                i1wy = wp_s[1]
                rho_c = wp_s[2]
                grad = i1wx * i1wx + i1wy * i1wy
                rho = rho_c + i1wx * u1 + i1wy * u2
                hi_t = l_t * grad
                lo = rho < -hi_t
                hi = rho > hi_t
                fi = -rho * _recip(jnp.maximum(grad, _GRAD_EPS))
                mid_ok = grad > _GRAD_EPS
                d1 = jnp.where(
                    lo, l_t * i1wx,
                    jnp.where(
                        hi, -l_t * i1wx, jnp.where(mid_ok, fi * i1wx, 0.0)
                    ),
                )
                d2 = jnp.where(
                    lo, l_t * i1wy,
                    jnp.where(
                        hi, -l_t * i1wy, jnp.where(mid_ok, fi * i1wy, 0.0)
                    ),
                )
                u1n = u1 + d1 + theta * div(st_s[2], st_s[3])
                u2n = u2 + d2 + theta * div(st_s[4], st_s[5])
                err = jnp.sum(
                    ((u1n - u1) ** 2 + (u2n - u2) ** 2) * err_row * err_col
                )
                st_s[0] = u1n
                st_s[1] = u2n
                u1x, u1y = fwd_grad(u1n)
                u2x, u2y = fwd_grad(u2n)
                ng1 = 1.0 + taut * jnp.sqrt(u1x * u1x + u1y * u1y)
                ng2 = 1.0 + taut * jnp.sqrt(u2x * u2x + u2y * u2y)
                r1 = _recip(ng1)
                r2 = _recip(ng2)
                st_s[2] = (st_s[2] + taut * u1x) * r1
                st_s[3] = (st_s[3] + taut * u1y) * r1
                st_s[4] = (st_s[4] + taut * u2x) * r2
                st_s[5] = (st_s[5] + taut * u2y) * r2
                return err

            m = jnp.where(in_sweep == C - 1, jnp.int32(m_last),
                          jnp.int32(k))
            err_fin = jax.lax.fori_loop(
                0, m, body, jnp.float32(jnp.inf)
            )
            err_ref[n, c, i] = err_fin

            # ---- DMA out: interior rows to the OTHER buffer ------------
            # ping-pong: cur==1 writes st0; cur==0 or cur==2 (the
            # read-only init input) writes st1
            dst = jnp.where(cur == 1, 0, 1)
            @pl.when(dst == 0)
            def _():
                cp = pltpu.make_async_copy(
                    st_s.at[:, pl.ds(off, block), :],
                    st0_ref.at[n, :, pl.ds(out_row, block), :],
                    sem_out,
                )
                cp.start()
                cp.wait()

            @pl.when(dst == 1)
            def _():
                cp = pltpu.make_async_copy(
                    st_s.at[:, pl.ds(off, block), :],
                    st1_ref.at[n, :, pl.ds(out_row, block), :],
                    sem_out,
                )
                cp.start()
                cp.wait()

            @pl.when(i == nb - 1)
            def _flip():
                cur_s[0] = dst
                fin_ref[n, 0] = dst

        # fin is always defined: every sweep's chunk 0 runs, and chunk 0
        # of the image sets it at its last block.

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("geo", "l_t", "theta", "taut", "warps", "s_max", "k",
                     "iterations", "interpret"),
)
def _run_blocked(
    src: jnp.ndarray,  # (N, 4, Hp, Wp) f32: i0, i1, i1x, i1y
    state: jnp.ndarray,  # (N, 6, Hp, Wp) f32 initial state
    h: jnp.ndarray,  # () int32 real rows
    w: jnp.ndarray,  # () int32 real cols
    thresh: jnp.ndarray,  # () f32 epsilon exit (< 0 disables)
    geo: _Geometry,
    l_t: float,
    theta: float,
    taut: float,
    warps: int,
    s_max: int,
    k: int,
    iterations: int,
    interpret: bool = False,
):
    n = src.shape[0]
    C = -(-iterations // k)
    m_last = iterations - (C - 1) * k
    T = warps * C
    kernel = _make_blocked_kernel(
        geo, l_t, theta, taut, warps, s_max, k, C, m_last
    )
    hbm_spec = pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)
    smem_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    dims = jnp.stack([h.astype(jnp.int32), w.astype(jnp.int32)])
    st0, st1, _, errs, viol, mxu, fin = pl.pallas_call(
        kernel,
        grid=(n, T, geo.nb),
        out_shape=(
            jax.ShapeDtypeStruct(state.shape, jnp.float32),  # ping
            jax.ShapeDtypeStruct(state.shape, jnp.float32),  # pong
            jax.ShapeDtypeStruct((n, 3) + state.shape[2:], jnp.float32),
            jax.ShapeDtypeStruct((n, T, geo.nb), jnp.float32),  # errs
            jax.ShapeDtypeStruct((n, warps, geo.nb), jnp.int32),  # viol
            jax.ShapeDtypeStruct((n, warps, geo.nb), jnp.float32),  # mxu
            jax.ShapeDtypeStruct((n, 1), jnp.int32),  # final buffer
        ),
        in_specs=[smem_spec, smem_spec, hbm_spec, hbm_spec],
        out_specs=(hbm_spec, hbm_spec, hbm_spec, smem_spec, smem_spec,
                   smem_spec, smem_spec),
        scratch_shapes=[
            pltpu.VMEM((4, geo.win, geo.wp), jnp.float32),  # sources
            pltpu.VMEM((3, geo.win, geo.wp), jnp.float32),  # warped
            pltpu.VMEM((6, geo.win, geo.wp), jnp.float32),  # state
            pltpu.SMEM((1,), jnp.int32),  # current-buffer pointer
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_FUSED_VMEM_LIMIT
        ),
        interpret=interpret,
    )(dims, thresh.reshape(1).astype(jnp.float32), src, state)
    final = jnp.where(fin[:, 0, None, None, None] == 0, st0, st1)
    return final, errs, viol, mxu


@functools.lru_cache(maxsize=512)
def _blocked_level_fn(
    n: int,
    shape: Tuple[int, int],
    next_shape: Optional[Tuple[int, int]],
    params: TVL1Params,
    interpret: bool,
    s_max: int,
    k: Optional[int] = None,
):
    """ONE jitted program per BLOCKED pyramid level (levels beyond the
    monolithic fused kernel's VMEM budget): XLA computes the i1 gradient
    and padding, the blocked kernel streams row blocks through VMEM for
    every sweep + iteration chunk, then the flow is sliced and upscaled.
    Mirrors _fused_level_fn's contract ((u1, u2, viol_img, iters_img))."""
    h, w = shape
    if k is None:
        k = _BLOCKED_K
    geo = _blocked_geometry(h, w, s_max, k)
    C = -(-params.iterations // k)
    l_t = float(params.lambda_ * params.theta)
    theta = float(params.theta)
    taut = float(params.tau / params.theta)
    scaled_eps = float(params.epsilon * params.epsilon * h * w)
    use_eps = params.epsilon > 0
    resize = jax.vmap(resize_bilinear, in_axes=(0, None))
    grad_fn = jax.vmap(centered_gradient)
    inv = 1.0 / params.scale_step

    def step(i0, i1, u1, u2):
        i1x, i1y = grad_fn(i1)
        src = _pad_hw(
            jnp.stack([i0, i1, i1x, i1y], axis=1), geo.hp, geo.wp
        )
        state = _pad_hw(
            jnp.concatenate(
                [u1[:, None], u2[:, None],
                 jnp.zeros((n, 4, h, w), jnp.float32)],
                axis=1,
            ),
            geo.hp,
            geo.wp,
        )
        state, errs, viol, mxu = _run_blocked(
            src,
            state,
            jnp.int32(h),
            jnp.int32(w),
            jnp.float32(scaled_eps if use_eps else -1.0),
            geo=geo,
            l_t=l_t,
            theta=theta,
            taut=taut,
            warps=int(params.warps),
            s_max=int(s_max),
            k=k,
            iterations=int(params.iterations),
            interpret=interpret,
        )
        u1o = state[:, 0, :h, :w]
        u2o = state[:, 1, :h, :w]
        if next_shape is not None:
            u1o = resize(u1o, next_shape) * inv
            u2o = resize(u2o, next_shape) * inv
        # violation semantics match the fused path: count of warp sweeps
        # (per image) whose entry flow broke the shift contract anywhere,
        # plus the per-image MAX |u| over sweeps/blocks (how far beyond
        # the contract the worst sweep entered — callers use it to skip
        # exact repair for insignificant overshoots)
        viol_img = jnp.sum(
            (jnp.sum(viol, axis=2) > 0).astype(jnp.int32), axis=1
        )
        mxu_img = jnp.max(mxu, axis=(1, 2))
        # iterations run: chunk c ran iff it starts a sweep or the
        # previous chunk's global error was still above threshold; a
        # sweep's last chunk runs m_last, others k
        m_last = params.iterations - (C - 1) * k
        chunk_m = jnp.asarray(
            [(m_last if (c % C) == C - 1 else k) for c in range(
                int(params.warps) * C)],
            jnp.int32,
        )
        prev_sum = jnp.concatenate(
            [jnp.full((n, 1), jnp.inf), jnp.sum(errs, axis=2)[:, :-1]],
            axis=1,
        )
        is_start = jnp.asarray(
            [(c % C) == 0 for c in range(int(params.warps) * C)]
        )
        if use_eps:
            ran = is_start[None] | (prev_sum > scaled_eps)
        else:
            ran = jnp.ones_like(prev_sum, bool)
        iters_img = jnp.sum(ran * chunk_m[None], axis=1).astype(jnp.int32)
        return u1o, u2o, viol_img, iters_img, mxu_img

    return jax.jit(step)


# --- kernel -----------------------------------------------------------------


def _make_kernel(
    geo: _Geometry,
    l_t: float,
    theta: float,
    taut: float,
):
    """Build the chunk kernel for one CANVAS geometry.

    The real image size (h, w) and the early-exit threshold arrive as SMEM
    scalars, NOT as compile-time constants: every pyramid level that fits
    a canvas shares ONE kernel binary (levels are padded up to the canvas
    and masked by the dynamic h/w). This keeps the number of DISTINCT
    Mosaic kernels per XLA program at <= 2 — three or more large distinct
    kernels in one program fault the v5e worker (measured; kernels run
    standalone at any size and in same-geometry groups of any count).

    thresh (SMEM): exit threshold on the masked sum of squared flow
    updates (the reference's epsilon^2 * h * w); < 0 disables the
    in-kernel exit (multi-block mode — exit is checked between chunks).
    """
    hp, wp, block, halo, win, nb = geo

    def kernel(dims_ref, thr_ref, ro_ref, st_ref, out_ref, err_ref, ro_s, st_s, sem_in, sem_out):
        m = dims_ref[0]
        h = dims_ref[1]
        w = dims_ref[2]
        thresh = thr_ref[0]
        n = pl.program_id(0)
        i = pl.program_id(1)
        # block and halo are multiples of 8 (f32 sublane tile), so every row
        # offset below is too — but Mosaic's divisibility prover can't see
        # through the clip, hence the explicit hints.
        start = pl.multiple_of(jnp.clip(i * block - halo, 0, hp - win), 8)
        off = pl.multiple_of(i * block - start, 8)  # local interior row 0
        out_row = pl.multiple_of(i * block, 8)

        cp_ro = pltpu.make_async_copy(
            ro_ref.at[n, :, pl.ds(start, win), :], ro_s, sem_in.at[0]
        )
        cp_st = pltpu.make_async_copy(
            st_ref.at[n, :, pl.ds(start, win), :], st_s, sem_in.at[1]
        )
        cp_ro.start()
        cp_st.start()
        cp_ro.wait()
        cp_st.wait()

        # Boundary masks as THIN broadcast vectors — (win, 1) row masks and
        # (1, wp) column masks, not (win, wp) arrays. Full-window masks
        # would be persistent VMEM temporaries alive across the whole
        # iteration loop; several distinct level kernels' persistent
        # temporaries share one per-program arena and a handful of
        # full-window masks per kernel blows it (worker fault).
        rows = start + jax.lax.broadcasted_iota(jnp.int32, (win, 1), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (1, wp), 1)
        first_row = rows == 0
        # all pad rows/cols act as "last": forward differences vanish there,
        # so roll wrap-around and pad garbage never reach real pixels.
        last_row = rows >= h - 1
        first_col = cols == 0
        last_col = cols >= w - 1
        # f32 interior weights; their product broadcasts to (win, wp)
        # inside the fused err reduction without materializing a mask
        err_row = (
            (rows >= i * block) & (rows < i * block + block) & (rows < h)
        ).astype(jnp.float32)
        err_col = (cols < w).astype(jnp.float32)

        i1wx = ro_s[0]
        i1wy = ro_s[1]
        rho_c = ro_s[2]

        def div(p1, p2):
            # backward differences, zero boundary on the low side
            dx = p1 - pltpu.roll(p1, 1, 1)
            dx = jnp.where(first_col, p1, dx)
            dy = p2 - pltpu.roll(p2, 1, 0)
            dy = jnp.where(first_row, p2, dy)
            return dx + dy

        def fwd_grad(u):
            # forward differences, zero at (and beyond) the far real border
            ux = pltpu.roll(u, wp - 1, 1) - u
            ux = jnp.where(last_col, 0.0, ux)
            uy = pltpu.roll(u, win - 1, 0) - u
            uy = jnp.where(last_row, 0.0, uy)
            return ux, uy

        def body(carry):
            it, _ = carry
            u1 = st_s[0]
            u2 = st_s[1]
            grad = i1wx * i1wx + i1wy * i1wy  # recomputed: saves a VMEM array
            rho = rho_c + i1wx * u1 + i1wy * u2
            hi_t = l_t * grad
            lo = rho < -hi_t
            hi = rho > hi_t
            fi = -rho / jnp.maximum(grad, _GRAD_EPS)
            mid_ok = grad > _GRAD_EPS
            d1 = jnp.where(
                lo, l_t * i1wx,
                jnp.where(hi, -l_t * i1wx, jnp.where(mid_ok, fi * i1wx, 0.0)),
            )
            d2 = jnp.where(
                lo, l_t * i1wy,
                jnp.where(hi, -l_t * i1wy, jnp.where(mid_ok, fi * i1wy, 0.0)),
            )
            u1n = u1 + d1 + theta * div(st_s[2], st_s[3])
            u2n = u2 + d2 + theta * div(st_s[4], st_s[5])
            err = jnp.sum(
                ((u1n - u1) ** 2 + (u2n - u2) ** 2) * err_row * err_col
            )
            st_s[0] = u1n
            st_s[1] = u2n
            u1x, u1y = fwd_grad(u1n)
            u2x, u2y = fwd_grad(u2n)
            ng1 = 1.0 + taut * jnp.sqrt(u1x * u1x + u1y * u1y)
            ng2 = 1.0 + taut * jnp.sqrt(u2x * u2x + u2y * u2y)
            st_s[2] = (st_s[2] + taut * u1x) / ng1
            st_s[3] = (st_s[3] + taut * u1y) / ng1
            st_s[4] = (st_s[4] + taut * u2x) / ng2
            st_s[5] = (st_s[5] + taut * u2y) / ng2
            return it + 1, err

        def cond(carry):
            it, err = carry
            return (it < m) & (err > thresh)

        _, err_final = jax.lax.while_loop(
            cond, body, (jnp.int32(0), jnp.float32(jnp.inf))
        )
        err_ref[n, i] = err_final

        cp_out = pltpu.make_async_copy(
            st_s.at[:, pl.ds(off, block), :],
            out_ref.at[n, :, pl.ds(out_row, block), :],
            sem_out,
        )
        cp_out.start()
        cp_out.wait()

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("geo", "l_t", "theta", "taut", "interpret"),
)
def _run_chunk(
    ro: jnp.ndarray,  # (N, 3, Hp, Wp) f32: i1wx, i1wy, rho_c
    state: jnp.ndarray,  # (N, 6, Hp, Wp) f32: u1, u2, p11, p12, p21, p22
    m: jnp.ndarray,  # () int32: iterations to run this chunk
    h: jnp.ndarray,  # () int32 real rows (dynamic — canvas sharing)
    w: jnp.ndarray,  # () int32 real cols
    thresh: jnp.ndarray,  # () f32 exit threshold (< 0 disables)
    geo: _Geometry,
    l_t: float,
    theta: float,
    taut: float,
    interpret: bool = False,
):
    n = ro.shape[0]
    kernel = _make_kernel(geo, l_t, theta, taut)
    # The big refs MUST be pinned to HBM: with memory_space=ANY, XLA is
    # free to stack a call's input/output buffers in VMEM, and a program
    # with several level calls then exhausts the VMEM stack (compile-time
    # "ran out of memory in memory space vmem" when caught; runtime worker
    # fault when not). The kernel DMAs its windows HBM->VMEM explicitly.
    hbm_spec = pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)
    dims = jnp.stack(
        [m.astype(jnp.int32), h.astype(jnp.int32), w.astype(jnp.int32)]
    )
    new_state, errs = pl.pallas_call(
        kernel,
        grid=(n, geo.nb),
        out_shape=(
            jax.ShapeDtypeStruct(state.shape, jnp.float32),
            jax.ShapeDtypeStruct((n, geo.nb), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            hbm_spec,
            hbm_spec,
        ],
        out_specs=(
            hbm_spec,
            # whole (N, nb) scalar table in SMEM; each grid step writes its
            # own [n, i] cell (a (1,1)-blocked spec trips the TPU lowering's
            # divisibility check for N > 1)
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((3, geo.win, geo.wp), jnp.float32),
            pltpu.VMEM((6, geo.win, geo.wp), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_vmem_limit(geo)),
        interpret=interpret,
    )(dims, thresh.reshape(1).astype(jnp.float32), ro, state)
    return new_state, errs


def _pad_hw(x: jnp.ndarray, hp: int, wp: int) -> jnp.ndarray:
    """Zero-pad the trailing two dims of (..., H, W) to (hp, wp)."""
    h, w = x.shape[-2], x.shape[-1]
    if h == hp and w == wp:
        return x
    cfg = [(0, 0)] * (x.ndim - 2) + [(0, hp - h), (0, wp - w)]
    return jnp.pad(x, cfg)


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except RuntimeError:  # pragma: no cover
        return False


def pallas_enabled() -> bool:
    """Production default: the Pallas path is on whenever the backend is a
    real TPU (CPU tests use the XLA path; interpret mode is opt-in via the
    ``interpret`` kwarg). OPTFLOW_TPU_DISABLE_PALLAS=1 forces the XLA path."""
    if os.environ.get("OPTFLOW_TPU_DISABLE_PALLAS", "") == "1":
        return False
    return _on_tpu()


def _under_trace(*arrays) -> bool:
    """True when any argument is a tracer — i.e. we are being traced into
    an enclosing jit. A whole-pyramid trace puts ~10 DISTINCT Mosaic
    kernels into ONE XLA program, which crashes the v5e worker at runtime
    (empirically: any one kernel runs standalone at any size; several
    same-geometry kernels coexist fine; >=3 large distinct geometries in
    one program fault — measured on this harness's v5e. Eagerly
    orchestrated, each level's chunk loop is its own program with exactly
    one kernel and runs reliably). Callers use this to decide between
    eager orchestration (TPU production) and traced composition (CPU
    tests / dryruns, where the kernel falls back to XLA anyway)."""
    return any(isinstance(a, jax.core.Tracer) for a in arrays)


def tvl1_flow_level_pallas_batched(
    i0: jnp.ndarray,  # (N, H, W) f32
    i1: jnp.ndarray,
    u1: jnp.ndarray,
    u2: jnp.ndarray,
    params: TVL1Params,
    u3: Optional[jnp.ndarray] = None,
    interpret: bool | None = None,
    canvas: Optional[_Geometry] = None,
    shift_warp: Optional[bool] = None,
    return_stats: bool = False,
) -> Tuple[jnp.ndarray, ...]:
    """Batched per-level TV-L1 solve with the fused Pallas iteration kernel.

    Matches ops.tvl1.tvl1_flow_level semantics (dual state zeroed at level
    entry, persists across the ``warps`` re-linearizations; epsilon early
    exit). Falls back to the vmapped jnp solver when gamma != 0.

    canvas: optional shared kernel geometry to pad this level onto. The
    coarse-to-fine driver buckets all pyramid levels onto two canvases so
    one XLA program never holds more than two distinct Mosaic kernels
    (three or more large distinct kernels fault the v5e worker); the real
    (h, w) travel to the kernel as SMEM scalars.

    shift_warp: use the shift-compose re-warp (ops/warp.py
    warp_backward_shift — 25x the gather warp on TPU, |flow| <= 8 px
    contract). Default: on for real-TPU runs, off in interpret/CPU mode
    (keeps the bit-parity tests against the jnp solver exact).
    """
    n, h, w = i0.shape
    if params.gamma != 0.0:
        sol = jax.vmap(
            lambda a, b, x, y, z: tvl1_flow_level(a, b, x, y, params, u3=z)
        )
        if u3 is None:
            u3 = jnp.zeros_like(u1)
        out = sol(i0, i1, u1, u2, u3)
        return out + (jnp.int32(0),) if return_stats else out
    if interpret is None:
        interpret = not _on_tpu()

    geo = canvas if canvas is not None else _select_geometry(h, w)
    assert geo.hp >= h and geo.wp >= w, (geo, h, w)
    l_t = float(params.lambda_ * params.theta)
    theta = float(params.theta)
    taut = float(params.tau / params.theta)
    scaled_eps = float(params.epsilon * params.epsilon * h * w)
    use_eps = params.epsilon > 0

    if u3 is None:
        u3 = jnp.zeros_like(u1)
    if shift_warp is None:
        shift_warp = not interpret

    grad_fn = jax.vmap(centered_gradient)
    gather_warp = jax.vmap(warp_backward)
    if shift_warp:
        from optflow_tpu.ops.warp import SHIFT_WARP_MAX, warp_backward_shift

        def warp_fn(i0_, i1_, i1x_, i1y_, u1_, u2_):
            # Guarded shift-warp contract (|u| <= SHIFT_WARP_MAX),
            # PER IMAGE (r3 verdict #4): one outlier pair no longer drops
            # the whole batch to the 25x-slower gather warp. Structure:
            #  - nobody exceeds (the production common case): one batched
            #    shift-warp, fast path unchanged;
            #  - someone exceeds: a lax.map over the batch runs the exact
            #    gather warp for offending images only and the shift warp
            #    for the rest (sequential over images, but gathers are
            #    paid only where required).
            # Returns (outputs..., n_fallback_images) so callers can
            # surface how often production data leaves the fast path.
            per_img = jnp.maximum(
                jnp.max(jnp.abs(u1_), axis=(1, 2)),
                jnp.max(jnp.abs(u2_), axis=(1, 2)),
            )
            exceed_i = per_img > SHIFT_WARP_MAX
            n_fb = jnp.sum(exceed_i.astype(jnp.int32))

            def all_shift(a):
                return warp_backward_shift(*a[:-1])

            def mixed(a):
                def body(xs):
                    ex_one, *imgs = xs

                    def shift_one(t):
                        outs = warp_backward_shift(
                            *(x[None] for x in t)
                        )
                        return tuple(o[0] for o in outs)

                    return jax.lax.cond(
                        ex_one,
                        lambda t: warp_backward(*t),
                        shift_one,
                        tuple(imgs),
                    )

                return jax.lax.map(body, (a[-1],) + a[:-1])

            outs = jax.lax.cond(
                n_fb > 0,
                mixed,
                all_shift,
                (i0_, i1_, i1x_, i1y_, u1_, u2_, exceed_i),
            )
            return outs + (n_fb,)
    else:
        def warp_fn(*a):
            return gather_warp(*a) + (jnp.int32(0),)
    i1x, i1y = grad_fn(i1)

    state = _pad_hw(
        jnp.concatenate(
            [u1[:, None], u2[:, None], jnp.zeros((n, 4, h, w), jnp.float32)],
            axis=1,
        ),
        geo.hp,
        geo.wp,
    )

    run = functools.partial(
        _run_chunk,
        geo=geo,
        l_t=l_t,
        theta=theta,
        taut=taut,
        interpret=interpret,
    )
    h_d = jnp.int32(h)
    w_d = jnp.int32(w)

    fb_total = jnp.int32(0)
    for _ in range(params.warps):
        u1c = state[:, 0, :h, :w]
        u2c = state[:, 1, :h, :w]
        _, i1wx, i1wy, _, rho_c, n_fb = warp_fn(i0, i1, i1x, i1y, u1c, u2c)
        fb_total = fb_total + n_fb
        ro = _pad_hw(jnp.stack([i1wx, i1wy, rho_c], axis=1), geo.hp, geo.wp)

        if geo.nb == 1:
            # whole level resident: all iterations in one launch, per-image
            # in-kernel epsilon exit (exactly the reference's criterion)
            state, _ = run(
                ro,
                state,
                jnp.int32(params.iterations),
                h_d,
                w_d,
                jnp.float32(scaled_eps if use_eps else -1.0),
            )
        else:
            k = geo.halo
            n_chunks = -(-params.iterations // k)

            def chunk_body(carry):
                ci, st, _ = carry
                m = jnp.minimum(k, params.iterations - ci * k)
                st2, errs = run(ro, st, m, h_d, w_d, jnp.float32(-1.0))
                return ci + 1, st2, jnp.max(jnp.sum(errs, axis=1))

            if use_eps:
                def chunk_cond(carry):
                    ci, _, err = carry
                    return (ci < n_chunks) & (err > scaled_eps)

                _, state, _ = jax.lax.while_loop(
                    chunk_cond,
                    chunk_body,
                    (jnp.int32(0), state, jnp.float32(jnp.inf)),
                )
            else:
                def fori_body(ci, st):
                    _, st2, _ = chunk_body((ci, st, jnp.float32(jnp.inf)))
                    return st2

                state = jax.lax.fori_loop(0, n_chunks, fori_body, state)

    if return_stats:
        return state[:, 0, :h, :w], state[:, 1, :h, :w], u3, fb_total
    return state[:, 0, :h, :w], state[:, 1, :h, :w], u3


def tvl1_flow_level_pallas(
    i0: jnp.ndarray,
    i1: jnp.ndarray,
    u1: jnp.ndarray,
    u2: jnp.ndarray,
    params: TVL1Params,
    u3=None,
    interpret: bool | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Drop-in replacement for ops.tvl1.tvl1_flow_level (single image) using
    the fused VMEM-resident iteration kernel."""
    if u3 is not None:
        u3 = u3[None]
    a, b, c = tvl1_flow_level_pallas_batched(
        i0[None], i1[None], u1[None], u2[None], params, u3=u3,
        interpret=interpret,
    )
    return a[0], b[0], c[0]


@functools.lru_cache(maxsize=512)
def _pyramid_fn(n: int, h: int, w: int, nscales: int, scale_step: float,
                interpret: bool):
    """Jitted pyramid build for BOTH frames in one dispatch: takes
    (2N, H, W) stacked frames, returns the tuple of all level arrays."""
    shapes = pyramid_shapes(h, w, nscales, scale_step)
    resize = jax.vmap(resize_bilinear, in_axes=(0, None))

    def build(stacked):
        levels = [stacked.astype(jnp.float32)]
        for shape in shapes[1:]:
            levels.append(resize(levels[-1], shape))
        return tuple(levels)

    return jax.jit(build)


@functools.lru_cache(maxsize=512)
def _group_fn(
    n: int,
    shapes: Tuple[Tuple[int, int], ...],  # coarse -> fine within the group
    up_shape: Optional[Tuple[int, int]],  # next finer level after the group
    params: TVL1Params,
    canvas: _Geometry,
    interpret: bool,
    shift_warp: Optional[bool] = None,
):
    """ONE jitted program per CANVAS GROUP of consecutive pyramid levels:
    every level in the group shares the same canvas, hence the same Mosaic
    kernel binary — the program contains exactly ONE distinct Pallas
    kernel, the configuration the v5e worker provably tolerates (multiple
    DISTINCT kernel geometries in one program fault it; same-geometry
    repeats are fine). The whole coarse-to-fine solve therefore costs
    ~3 async dispatches (pyramid build + one per canvas group) instead of
    one per level, which matters on high-latency host links."""

    resize = jax.vmap(resize_bilinear, in_axes=(0, None))
    inv = 1.0 / params.scale_step

    def step(level_imgs, u1, u2):
        # level_imgs: tuple of (2N, h, w) stacked (i0, i1) arrays,
        # coarse -> fine, matching ``shapes``
        fb = jnp.int32(0)
        for idx, stacked in enumerate(level_imgs):
            u1, u2, _, fb_lvl = tvl1_flow_level_pallas_batched(
                stacked[:n], stacked[n:], u1, u2, params,
                interpret=interpret, canvas=canvas, shift_warp=shift_warp,
                return_stats=True,
            )
            fb = fb + fb_lvl
            nxt = (
                shapes[idx + 1] if idx + 1 < len(shapes) else up_shape
            )
            if nxt is not None:
                u1 = resize(u1, nxt) * inv
                u2 = resize(u2, nxt) * inv
        return u1, u2, fb

    return jax.jit(step)


def tvl1_flow_batched_pallas(
    i0s: jnp.ndarray,  # (N, H, W)
    i1s: jnp.ndarray,
    params: TVL1Params = TVL1Params(),
    init_flow: Optional[jnp.ndarray] = None,  # (N, H, W, 2)
    interpret: bool | None = None,
    shift_warp: Optional[bool] = None,
    s_max: Optional[int] = None,
) -> jnp.ndarray:
    """Full coarse-to-fine TV-L1 flow, natively batched over the leading
    axis, with the Pallas level solver. Mirrors ops.tvl1.tvl1_flow
    (src/optflow.cpp:516-520 semantics) without an outer vmap so the
    pallas_call keeps its own explicit batch grid axis.

    Dispatch structure: one jitted program builds both pyramids, then one
    jitted program per level (see _level_fn). All dispatches are async, so
    the chain pipelines over a high-latency host link."""
    if interpret is None:
        interpret = not _on_tpu()
    n, h, w = i0s.shape
    shapes = pyramid_shapes(h, w, params.nscales, params.scale_step)

    build = _pyramid_fn(
        n, h, w, params.nscales, params.scale_step, interpret
    )
    levels = build(jnp.concatenate([i0s, i1s], axis=0))

    coarsest = shapes[-1]
    if params.use_initial_flow and init_flow is not None:
        resize = jax.vmap(resize_bilinear, in_axes=(0, None))

        @jax.jit
        def shrink(f):
            u1 = f[..., 0]
            u2 = f[..., 1]
            for shape in shapes[1:]:
                u1 = resize(u1, shape) * params.scale_step
                u2 = resize(u2, shape) * params.scale_step
            return u1, u2

        u1, u2 = shrink(init_flow)
    else:
        u1 = jnp.zeros((n,) + coarsest, jnp.float32)
        u2 = jnp.zeros((n,) + coarsest, jnp.float32)

    # Path selection, from round-4 measurements (tools/probes/r4_budget.py,
    # value-readback-synced — jax.block_until_ready acks early on axon):
    # per-program dispatch is ~0.9 ms pipelined (the r2 "95% dispatch"
    # claim measured the ~32 ms SYNC roundtrip, not dispatch), so program
    # count barely matters; what dominates is device compute: canvas
    # padding (~1.7x VPU waste) and per-sweep XLA warp + window re-DMA
    # (~75 ms of the 227 ms batch). The FUSED path eliminates all three:
    # one program per level, each a single kernel running every warp
    # sweep + iteration loop VMEM-resident at the level's exact geometry.
    # Levels beyond the fused VMEM budget run the BLOCKED fused kernel
    # (round 5, verdict r4 #2): same one-program-per-level structure,
    # streaming row blocks through VMEM — NOT the legacy chunked path (a
    # mixed fused/legacy pyramid measured 29x SLOWER at (2, 512, 1024):
    # the standalone eager legacy level trips the platform's
    # slow-program pathology, cf. PERF_NOTES_r04.md §2).
    # OPTFLOW_TPU_BLOCKED=0 restores the round-4 behavior (whole-pyramid
    # legacy for oversized sections).
    blocked_ok = os.environ.get("OPTFLOW_TPU_BLOCKED", "1") != "0"
    from optflow_tpu.ops.warp import SHIFT_WARP_MAX

    # s_max: tap-shift bound of the in-kernel warp. The default is
    # the SHIFT_WARP_MAX production contract; repair paths re-solve
    # violating images through a WIDER-contract kernel set (e.g.
    # s_max=16) — same fused kernels, exact for larger |u|, at a
    # warp cost that only those rare re-solves pay.
    s_val = int(s_max if s_max is not None else SHIFT_WARP_MAX)

    def _fits_fused(shape):
        # budget at THIS solve's warp contract: a wide-contract repair
        # solve has a smaller monolithic budget (more warp temporaries),
        # and routing with the default budget would trip
        # _fused_geometry's assert on mid-size levels (code-review r5)
        return (
            _round_up(shape[0], 8) * _round_up(shape[1], 128)
            <= _fused_px_budget(s_val)
        )

    def _blocked_feasible(shape):
        # very wide levels can leave no room for a row block between
        # the halos; they must take the legacy whole-pyramid path
        # instead of tripping _blocked_geometry's assert
        wp = _round_up(shape[1], 128)
        per_px = _BLOCKED_BYTES_PER_PX + 12 * max(0, s_val - 8)
        win_max = int(_FUSED_VMEM_LIMIT * 0.92) // (per_px * wp) // 8 * 8
        halo = _round_up(_BLOCKED_K + s_val, 8)
        return _round_up(shape[0], 8) <= win_max or (
            win_max - 2 * halo >= 8
        )

    use_fused = (
        not interpret
        and params.gamma == 0.0
        and shift_warp is not False
        and os.environ.get("OPTFLOW_TPU_FUSED", "1") != "0"
        and os.environ.get("OPTFLOW_TPU_SINGLETON_LEVELS", "") != "1"
        and all(
            _fits_fused(sh) or (blocked_ok and _blocked_feasible(sh))
            for sh in shapes
        )
    )
    if use_fused:
        viols = []
        iter_stats = []
        max_us = []
        for s in range(len(shapes) - 1, -1, -1):
            nxt = shapes[s - 1] if s > 0 else None
            if _fits_fused(shapes[s]):
                step = _fused_level_fn(
                    n, shapes[s], nxt, params, interpret, s_val
                )
            else:
                step = _blocked_level_fn(
                    n, shapes[s], nxt, params, interpret, s_val,
                    _BLOCKED_K,
                )
            u1, u2, v, its, mx = step(levels[s][:n], levels[s][n:], u1, u2)
            viols.append(v)
            iter_stats.append((shapes[s], its))
            max_us.append(mx)
        _telemetry.fallback_counts = viols
        _telemetry.iteration_stats = iter_stats
        _telemetry.max_u = max_us
        return jnp.stack([u1, u2], axis=-1)

    # Legacy grouped path (also the CPU/interpret and gather-warp path):
    # contiguous canvas groups, one Mosaic kernel binary per group, 2
    # distinct kernels total. OPTFLOW_TPU_SINGLETON_LEVELS=1 restores
    # one-level-per-program with exact per-level geometry.
    order = list(range(len(shapes) - 1, -1, -1))
    if os.environ.get("OPTFLOW_TPU_SINGLETON_LEVELS", "") == "1":
        groups: list = [(_select_geometry(*shapes[s]), [s]) for s in order]
    else:
        canvases = _assign_canvases(shapes)
        groups = []
        for s in order:
            if groups and groups[-1][0] == canvases[s]:
                groups[-1][1].append(s)
            else:
                groups.append((canvases[s], [s]))
    fb_counts = []
    for canvas, idxs in groups:
        finest = idxs[-1]
        up_shape = shapes[finest - 1] if finest > 0 else None
        step = _group_fn(
            n,
            tuple(shapes[s] for s in idxs),
            up_shape,
            params,
            canvas,
            interpret,
            shift_warp,
        )
        u1, u2, fb = step(tuple(levels[s] for s in idxs), u1, u2)
        fb_counts.append(fb)

    # Shift-warp fallback telemetry: total image-sweeps this solve that
    # left the fast path (r3 verdict #4). Stored as LAZY device scalars —
    # reading them here would sync the async dispatch chain; consumers
    # call get_last_fallback_sweeps() after their own sync point.
    _telemetry.fallback_counts = fb_counts
    _telemetry.iteration_stats = []
    _telemetry.max_u = []

    return jnp.stack([u1, u2], axis=-1)


class _Telemetry(threading.local):
    """Per-thread solve telemetry: the engine's threaded per-device
    dispatch means "the most recent solve" is a per-thread notion."""

    def __init__(self):
        self.fallback_counts: list = []
        self.iteration_stats: list = []
        self.max_u: list = []


_telemetry = _Telemetry()


def get_last_fallback_sweeps() -> int:
    """Image-sweeps of the most recent tvl1_flow_batched_pallas call on
    this thread that left the |u| <= SHIFT_WARP_MAX shift-warp contract
    (one count = one image x one warp sweep). On the legacy path these
    sweeps used the exact gather warp; on the fused path the tap shifts
    were clamped — use :func:`get_last_violation_mask` to re-solve those
    images exactly. Reading syncs on the solve having finished, so call
    it after consuming the flow."""
    return int(
        sum(int(np.asarray(c).sum()) for c in _telemetry.fallback_counts)
    )


# Counted f32 VPU ops per pixel per primal-dual iteration of the fused
# kernel body (iter_body): thresholding 20, divergence 10, primal update
# 6, err reduction 8, forward gradients 8, dual norms 12, dual updates
# 12, misc selects/compares 6 — rolls and DMA excluded. Used for the
# bench's MFU estimate.
ITER_FLOPS_PER_PX = 82


def get_last_iteration_stats() -> list:
    """Per-level ((h, w), per-image-iteration-count array) of the most
    recent FUSED tvl1_flow_batched_pallas call on this thread. One count
    = one primal-dual iteration over that level's real h x w pixels
    (summed over warp sweeps). Reading the arrays syncs on the solve.
    Empty when the last solve ran on the legacy path."""
    return list(_telemetry.iteration_stats)


def exact_resolve(
    i0s: jnp.ndarray,
    i1s: jnp.ndarray,
    params: TVL1Params,
    init_flow: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Exact-semantics re-solve for shift-contract violators, on device.

    Repair ladder (r5 — both other vehicles CRASH the v5e worker and
    the repair path of all places must not take the solver down: a
    traced whole-pyramid XLA program dies with an INTERNAL backend
    error; the eager legacy Pallas chain with the gather warp dies with
    a worker kernel fault, reproducibly, from the features bench too):

    1. the production fused kernels rebuilt with a DOUBLED tap-shift
       contract (s_max = 2 * SHIFT_WARP_MAX): exact as long as the
       re-solve's own sweeps stay within it — verified via the max|u|
       telemetry (the check is one scalar sync on a rare path);
    2. the pure-jnp XLA level solver dispatched eagerly level by level
       (unbounded gather warp, zero Mosaic kernels) otherwise.
    """
    from optflow_tpu.ops.warp import SHIFT_WARP_MAX

    wide = 2 * int(SHIFT_WARP_MAX)
    if pallas_enabled() and params.gamma == 0.0:
        cand = tvl1_flow_batched_pallas(
            i0s, i1s, params, init_flow=init_flow, s_max=wide
        )
        mx = get_last_max_u()
        if mx is None or float(np.asarray(mx).max()) <= wide:
            return cand
    flow_init = None
    if params.use_initial_flow and init_flow is not None:
        flow_init = init_flow
    sol = jax.vmap(
        lambda a, b, f: tvl1_flow_level_exact_pyramid(a, b, params, f)
    )
    if flow_init is None:
        flow_init = jnp.zeros(i0s.shape + (2,), jnp.float32)
    return sol(i0s, i1s, flow_init)


def tvl1_flow_level_exact_pyramid(i0, i1, params, init_flow):
    """Single-image exact pyramid solve with the jnp level solver (the
    repair ladder's last resort — see exact_resolve)."""
    from optflow_tpu.ops.tvl1 import tvl1_flow, tvl1_flow_level

    return tvl1_flow(
        i0, i1, params,
        init_flow=init_flow if params.use_initial_flow else None,
        level_solver=tvl1_flow_level,
    )


def resolve_contract_violations(
    flow,
    i0s: jnp.ndarray,
    i1s: jnp.ndarray,
    params: TVL1Params,
    mask=None,
    init_flow: Optional[jnp.ndarray] = None,
) -> np.ndarray:
    """Exact-semantics repair for the fused path: re-solve the images
    whose warp sweeps violated the |u| <= SHIFT_WARP_MAX contract (tap
    shifts were clamped there) through :func:`exact_resolve` — the
    reference warp has no magnitude ceiling (src/optflow.cpp:506-510).
    Call at a point that already consumes ``flow`` (the mask read then
    costs no extra sync). Returns the (possibly repaired) flow as a
    numpy array. No-op when the last solve ran on the legacy path or
    nothing violated — the production common case.

    mask: the per-image violation mask captured right after the solve
    (required when the repair runs on a different thread than the solve
    — telemetry is thread-local); defaults to this thread's last.

    init_flow: the (N, H, W, 2) initial flow the ORIGINAL solve ran
    with, when params.use_initial_flow — the re-solve must start from
    the same initialization or repaired images diverge from reference
    semantics exactly in the large-initial-flow case most likely to
    trigger violations. Sliced to the offending images here."""
    if mask is None:
        mask = get_last_violation_mask()
    flow_np = np.asarray(flow)
    if mask is None:
        return flow_np
    m = np.asarray(mask)
    if not m.any():
        return flow_np
    idx = np.nonzero(m)[0]
    exact = exact_resolve(
        jnp.asarray(i0s)[idx],
        jnp.asarray(i1s)[idx],
        params,
        init_flow=(
            jnp.asarray(init_flow)[idx] if init_flow is not None else None
        ),
    )
    flow_np = flow_np.copy()
    flow_np[idx] = np.asarray(exact)
    return flow_np


def get_last_max_u() -> Optional["jnp.ndarray"]:
    """Per-image (N,) maximum |flow component| at any warp-sweep entry of
    the most recent fused/blocked solve on this thread — how far the
    worst sweep entered the shift-compose warp. Values <= SHIFT_WARP_MAX
    mean the contract held; values slightly beyond it bound the clamped
    warp's sampling error (max_u - SHIFT_WARP_MAX px at the offending
    pixels), which callers compare against their accuracy budget before
    paying for an exact re-solve. None when the last solve ran on the
    legacy path (lazy device array; reading syncs)."""
    if not _telemetry.max_u:
        return None
    total = _telemetry.max_u[0]
    for m in _telemetry.max_u[1:]:
        total = jnp.maximum(total, m)
    return total


def get_last_violation_mask() -> Optional["jnp.ndarray"]:
    """Per-image bool mask (N,) of the most recent solve: True where any
    warp sweep violated the shift-warp contract. None when the last solve
    ran on the legacy path (whole-batch counters only) or no solve ran."""
    per_image = [
        c for c in _telemetry.fallback_counts
        if getattr(c, "ndim", 0) == 1
    ]
    if not per_image:
        return None
    total = per_image[0]
    for c in per_image[1:]:
        total = total + c
    return total > 0

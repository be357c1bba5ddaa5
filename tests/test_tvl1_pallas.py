"""Parity tests for the Pallas fused level solver (interpret mode on CPU).

The production kernel (ops/tvl1_pallas.py) must match the jnp level solver
exactly in single-block mode and in the row-block chunked mode used for
levels that exceed the VMEM budget. Hardware behavior is exercised
separately by tools_perf_compare.py / bench.py on the TPU.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from optflow_tpu.core.config import TVL1Params
from optflow_tpu.ops.tvl1 import tvl1_flow, tvl1_flow_level
from optflow_tpu.ops import tvl1_pallas as tp
from optflow_tpu.ops.tvl1_pallas import (
    tvl1_flow_level_pallas,
    tvl1_flow_level_pallas_batched,
    _select_geometry,
)
from tests.conftest import make_fibsem_like
from tests.test_tvl1 import mean_epe, translate


def test_level_parity_with_jnp(rng):
    im0 = make_fibsem_like(rng, 40, 48)
    im1 = translate(im0, 1.0, -0.5)
    params = TVL1Params(nscales=1, warps=2, iterations=25, epsilon=0.0)
    u1 = jnp.zeros((40, 48), jnp.float32)
    u2 = jnp.zeros((40, 48), jnp.float32)
    a1, a2, _ = tvl1_flow_level(
        jnp.asarray(im0), jnp.asarray(im1), u1, u2, params
    )
    b1, b2, _ = tvl1_flow_level_pallas(
        jnp.asarray(im0), jnp.asarray(im1), u1, u2, params, interpret=True
    )
    assert np.allclose(np.asarray(a1), np.asarray(b1), atol=1e-4)
    assert np.allclose(np.asarray(a2), np.asarray(b2), atol=1e-4)


def test_level_parity_epsilon_early_exit(rng):
    """With epsilon > 0 both solvers take the same per-iteration early exit
    (single-block mode evaluates it in-kernel)."""
    im0 = make_fibsem_like(rng, 32, 40)
    im1 = translate(im0, 0.5, 0.0)
    params = TVL1Params(nscales=1, warps=1, iterations=100, epsilon=0.05)
    u1 = jnp.zeros((32, 40), jnp.float32)
    u2 = jnp.zeros((32, 40), jnp.float32)
    a1, a2, _ = tvl1_flow_level(
        jnp.asarray(im0), jnp.asarray(im1), u1, u2, params
    )
    b1, b2, _ = tvl1_flow_level_pallas(
        jnp.asarray(im0), jnp.asarray(im1), u1, u2, params, interpret=True
    )
    assert np.allclose(np.asarray(a1), np.asarray(b1), atol=1e-4)
    assert np.allclose(np.asarray(a2), np.asarray(b2), atol=1e-4)


def test_full_pyramid_with_pallas_levels(rng):
    im0 = make_fibsem_like(rng, 64, 80)
    im1 = translate(im0, 1.5, 1.0)
    params = TVL1Params(nscales=3, warps=2, iterations=40)

    def solver(i0, i1, u1, u2, p, u3=None):
        return tvl1_flow_level_pallas(i0, i1, u1, u2, p, u3=u3, interpret=True)

    flow = tvl1_flow(
        jnp.asarray(im0), jnp.asarray(im1), params, level_solver=solver
    )
    assert mean_epe(flow, 1.5, 1.0) < 0.3


def test_multiblock_chunked_parity(rng, monkeypatch):
    """Row-block chunked mode (halo-overlapped K-iteration chunks) is
    bit-identical to the monolithic jnp solve with eps=0: one primal-dual
    iteration propagates at most one pixel, so a K-row halo makes the
    interior of every block exact."""
    monkeypatch.setattr(tp, "_SINGLE_BLOCK_BUDGET", 200 * 1024)
    monkeypatch.setattr(tp, "_CHUNK_WINDOW_BUDGET", 150 * 1024)
    monkeypatch.setattr(tp, "_DEFAULT_K", 8)
    geo = _select_geometry(96, 144, k=8)
    assert geo.nb > 1 and geo.halo == 8

    im0 = make_fibsem_like(rng, 96, 144)
    im1 = translate(im0, 2.0, 0.0)
    params = TVL1Params(nscales=1, warps=2, iterations=24, epsilon=0.0)
    u = jnp.zeros((96, 144), jnp.float32)
    a1, a2, _ = tvl1_flow_level(jnp.asarray(im0), jnp.asarray(im1), u, u, params)
    b1, b2, _ = tvl1_flow_level_pallas(
        jnp.asarray(im0), jnp.asarray(im1), u, u, params, interpret=True
    )
    # interior is exact up to fp reassociation (integer-shift fixtures give
    # bit-identical results; cubic-interpolated fixtures differ at ~1e-5)
    assert float(jnp.abs(a1 - b1).max()) < 1e-4
    assert float(jnp.abs(a2 - b2).max()) < 1e-4


def test_batched_level_parity(rng):
    """The native batch axis matches a vmap of the jnp solver."""
    im0 = make_fibsem_like(rng, 40, 56)
    ims0 = jnp.stack([jnp.asarray(im0)] * 2)
    ims1 = jnp.stack(
        [jnp.asarray(translate(im0, 1.0, 0.0)), jnp.asarray(translate(im0, 0.0, 1.0))]
    )
    params = TVL1Params(nscales=1, warps=1, iterations=20, epsilon=0.0)
    u = jnp.zeros((2, 40, 56), jnp.float32)
    a = jax.vmap(lambda x, y, s, t: tvl1_flow_level(x, y, s, t, params))(
        ims0, ims1, u, u
    )
    b = tvl1_flow_level_pallas_batched(ims0, ims1, u, u, params, interpret=True)
    assert np.allclose(np.asarray(a[0]), np.asarray(b[0]), atol=1e-5)
    assert np.allclose(np.asarray(a[1]), np.asarray(b[1]), atol=1e-5)


def test_geometry_selection():
    # the production strip level is whole-level VMEM-resident
    g = _select_geometry(256, 1024)
    assert g.nb == 1 and g.halo == 0 and g.wp == 1024
    # a full-section level falls back to row blocks with 8-aligned halos
    g = _select_geometry(2048, 2048)
    assert g.nb > 1
    assert g.halo % 8 == 0 and g.block % 8 == 0
    assert g.hp == g.nb * g.block and g.hp >= 2048
    assert 9 * g.win * g.wp * 4 <= tp._CHUNK_WINDOW_BUDGET


def test_canvas_assignment():
    """The pyramid buckets onto AT MOST two shared kernel canvases (the
    v5e worker faults with >=3 large distinct Mosaic kernels in one
    program), and every level fits its canvas."""
    from optflow_tpu.ops.pyramid import pyramid_shapes
    from optflow_tpu.ops.tvl1_pallas import _assign_canvases

    for base in ((256, 1024), (96, 128), (512, 512)):
        shapes = pyramid_shapes(base[0], base[1], 10, 0.8)
        canvases = _assign_canvases(shapes)
        assert len({(c.hp, c.wp, c.block, c.nb) for c in canvases}) <= 2
        for (h, w), c in zip(shapes, canvases):
            assert c.hp >= h and c.wp >= w


def test_gamma_falls_back_to_jnp(rng):
    im0 = make_fibsem_like(rng, 32, 40)
    im1 = translate(im0, 1.0, 0.0)
    params = TVL1Params(nscales=1, warps=1, iterations=10, gamma=0.5)
    u = jnp.zeros((32, 40), jnp.float32)
    a1, a2, a3 = tvl1_flow_level(jnp.asarray(im0), jnp.asarray(im1), u, u, params)
    b1, b2, b3 = tvl1_flow_level_pallas(
        jnp.asarray(im0), jnp.asarray(im1), u, u, params, interpret=True
    )
    assert np.allclose(np.asarray(a1), np.asarray(b1), atol=1e-6)
    assert np.allclose(np.asarray(a3), np.asarray(b3), atol=1e-6)


def test_fused_level_matches_legacy_level(rng):
    """The fused whole-level kernel (warp + all sweeps + iterations in
    one launch — the r4 TPU production path) matches the legacy
    per-sweep level path with the shift warp, in interpret mode. Not bit
    equality: the fused body multiplies by reciprocals where the legacy
    kernel divides (one extra rounding per dual update)."""
    from optflow_tpu.ops.tvl1_pallas import (
        _fused_level_fn,
        tvl1_flow_level_pallas_batched,
    )

    h, w = 40, 56
    im0 = make_fibsem_like(rng, h, w)
    im1 = translate(im0, 1.5, -0.5)
    p = TVL1Params(nscales=1, warps=3, iterations=50)
    i0 = jnp.asarray(im0)[None]
    i1 = jnp.asarray(im1)[None]
    u = jnp.zeros((1, h, w), jnp.float32)

    step = _fused_level_fn(1, (h, w), None, p, True, 8)
    fu1, fu2, viol, iters, _mx = step(i0, i1, u, u)
    assert int(viol[0]) == 0
    assert int(iters[0]) > 0

    ru1, ru2, _ = tvl1_flow_level_pallas_batched(
        i0, i1, u, u, p, interpret=True, shift_warp=True
    )
    # 150 accumulating iterations amplify the per-update last-bit
    # difference to a few millipixels; both fields sit on the same
    # fixpoint (truth 1.5 px here, EPE gated elsewhere)
    assert np.abs(np.asarray(fu1) - np.asarray(ru1)).max() < 0.01
    assert np.abs(np.asarray(fu2) - np.asarray(ru2)).max() < 0.01


def test_fused_stacking_is_bit_exact(rng):
    """Stacking G images per kernel invocation (coarse-level latency
    amortization) must not change numerics: with the epsilon exit
    disabled (fixed iteration count) the G=4 stacked solve equals four
    independent G=1 solves bit for bit."""
    from optflow_tpu.ops.tvl1_pallas import (
        _fused_geometry,
        _fused_level_fn,
        _pick_stack,
    )

    h, w, n = 24, 40, 4
    i0s, i1s = [], []
    for k in range(n):
        a = make_fibsem_like(rng, h, w)
        i0s.append(a)
        i1s.append(translate(a, 1.0, 0.4 * (k + 1) / n))
    i0 = jnp.asarray(np.stack(i0s))
    i1 = jnp.asarray(np.stack(i1s))
    u = jnp.zeros((n, h, w), jnp.float32)
    p = TVL1Params(nscales=1, warps=2, iterations=30, epsilon=0.0)

    assert _pick_stack(n, _fused_geometry(h, w)) == n  # small level stacks
    s1, s2, _, iters, _mx = _fused_level_fn(n, (h, w), None, p, True, 8)(
        i0, i1, u, u
    )
    assert list(np.asarray(iters)) == [60] * n  # warps * iterations, no exit

    solo = _fused_level_fn(1, (h, w), None, p, True, 8)
    for k in range(n):
        b1, b2, _, _, _ = solo(i0[k:k + 1], i1[k:k + 1], u[:1], u[:1])
        assert np.array_equal(np.asarray(s1[k]), np.asarray(b1[0]))
        assert np.array_equal(np.asarray(s2[k]), np.asarray(b2[0]))


def test_resolve_contract_violations_repairs_offenders(rng):
    """After a fused solve flags shift-contract violations, the repair
    helper re-solves exactly the offending images with the gather warp
    and leaves the rest untouched."""
    import optflow_tpu.ops.tvl1_pallas as tp

    h, w = 32, 48
    a = make_fibsem_like(rng, h, w)
    i0 = jnp.asarray(np.stack([a, a]))
    i1 = jnp.asarray(np.stack([translate(a, 1.0, 0.0),
                               translate(a, 1.0, 0.0)]))
    p = TVL1Params(nscales=1, warps=1, iterations=5)
    flow = jnp.zeros((2, h, w, 2), jnp.float32)

    # fabricate telemetry: image 1 violated
    tp._telemetry.fallback_counts = [jnp.asarray([0, 3], jnp.int32)]
    mask = tp.get_last_violation_mask()
    assert mask is not None and list(np.asarray(mask)) == [False, True]

    repaired = tp.resolve_contract_violations(flow, i0, i1, p)
    # untouched image 0, re-solved image 1 (gather-warp path, real flow)
    assert np.array_equal(repaired[0], np.zeros((h, w, 2), np.float32))
    assert float(np.abs(repaired[1]).max()) > 0.1

    # no violations -> identity
    tp._telemetry.fallback_counts = [jnp.asarray([0, 0], jnp.int32)]
    same = tp.resolve_contract_violations(flow, i0, i1, p)
    assert np.array_equal(same, np.asarray(flow))


def test_resolve_contract_violations_carries_init_flow(rng):
    """With use_initial_flow, the exact re-solve must start from the
    caller's init_flow sliced to the offenders — not from zero (advisor
    r4 medium): the repaired image must match a direct gather-warp solve
    with the same init."""
    import optflow_tpu.ops.tvl1_pallas as tp

    h, w = 32, 48
    a = make_fibsem_like(rng, h, w)
    i0 = jnp.asarray(np.stack([a, a]))
    i1 = jnp.asarray(np.stack([translate(a, 1.0, 0.0),
                               translate(a, 1.5, 0.5)]))
    p = TVL1Params(nscales=1, warps=1, iterations=3, use_initial_flow=True)
    init = jnp.stack(
        [jnp.full((2, h, w), 1.2, jnp.float32),
         jnp.full((2, h, w), -0.7, jnp.float32)],
        axis=-1,
    )
    flow = jnp.zeros((2, h, w, 2), jnp.float32)

    tp._telemetry.fallback_counts = [jnp.asarray([0, 2], jnp.int32)]
    repaired = tp.resolve_contract_violations(
        flow, i0, i1, p, init_flow=init
    )
    expected = np.asarray(
        tp.tvl1_flow_batched_pallas(
            i0[1:2], i1[1:2], p, init_flow=init[1:2],
            shift_warp=False,
        )
    )
    assert np.allclose(repaired[1], expected[0], atol=1e-6)
    # and distinct from a zero-init re-solve (few iterations keep the
    # init's imprint)
    zero_init = np.asarray(
        tp.tvl1_flow_batched_pallas(
            i0[1:2], i1[1:2], p, shift_warp=False
        )
    )
    assert not np.allclose(repaired[1], zero_init[0], atol=1e-3)


def test_fused_stack_violations_are_per_image(rng):
    """In a stacked invocation, only the image whose |u| exceeds the
    shift contract is flagged — one outlier must not mark (and later
    re-solve) its whole stack (code-review r4 finding)."""
    from optflow_tpu.ops.tvl1_pallas import _fused_level_fn, _pick_stack, _fused_geometry

    h, w, n = 24, 40, 4
    i0s, i1s = [], []
    for _ in range(n):
        a = make_fibsem_like(rng, h, w)
        i0s.append(a)
        i1s.append(translate(a, 1.0, 0.0))
    i0 = jnp.asarray(np.stack(i0s))
    i1 = jnp.asarray(np.stack(i1s))
    p = TVL1Params(nscales=1, warps=2, iterations=5)
    assert _pick_stack(n, _fused_geometry(h, w)) == n

    u1 = np.zeros((n, h, w), np.float32)
    u1[2] = 12.0  # image 2 enters beyond SHIFT_WARP_MAX
    _, _, viol, _, mx = _fused_level_fn(n, (h, w), None, p, True, 8)(
        i0, i1, jnp.asarray(u1), jnp.zeros((n, h, w), jnp.float32)
    )
    assert float(np.asarray(mx)[2]) > 8.0  # max|u| telemetry
    v = np.asarray(viol)
    assert v[2] >= 1
    assert v[0] == v[1] == v[3] == 0, v


def test_blocked_kernel_bit_exact_vs_fused(rng, monkeypatch):
    """The blocked fused kernel (row-block streaming for levels beyond
    the monolithic VMEM budget, r4 verdict #2) must be BIT-IDENTICAL to
    the monolithic fused kernel with the epsilon exit disabled: the
    k-iteration halo keeps every chunk's interior exact, and the
    ping-pong buffers + per-sweep warp storage reassemble the same
    global state. Forced multi-block (8 row blocks) via a tiny budget."""
    from optflow_tpu.ops.tvl1_pallas import (
        _blocked_geometry,
        _blocked_level_fn,
        _fused_level_fn,
    )

    h, w, n = 64, 128, 2
    pairs = [make_fibsem_like(rng, h, w) for _ in range(n)]
    i0 = jnp.asarray(np.stack(pairs))
    i1 = jnp.asarray(
        np.stack([translate(a, 1.2, -0.6) for a in pairs])
    )
    u = jnp.zeros((n, h, w), jnp.float32)
    p = TVL1Params(nscales=1, warps=3, iterations=20, epsilon=0.0)

    def small_geo(hh, ww, s, k=8, budget=None):
        return _blocked_geometry(hh, ww, s, k, budget=220 * ww * 40)

    monkeypatch.setattr(tp, "_blocked_geometry", small_geo)
    geo = small_geo(h, w, 8)
    assert geo.nb == 8 and geo.halo == 16, geo

    f1, f2, _, fi, _ = _fused_level_fn(n, (h, w), None, p, True, 8)(
        i0, i1, u, u
    )
    b1, b2, _, bi, _ = _blocked_level_fn(n, (h, w), None, p, True, 8, 8)(
        i0, i1, u, u
    )
    assert np.array_equal(np.asarray(f1), np.asarray(b1))
    assert np.array_equal(np.asarray(f2), np.asarray(b2))
    assert list(np.asarray(bi)) == list(np.asarray(fi)) == [60, 60]


def test_blocked_kernel_epsilon_exit_and_viol(rng, monkeypatch):
    """Blocked-kernel epsilon exit fires at k-iteration granularity (at
    most k-1 extra iterations per sweep vs the fused per-iteration exit)
    and the per-sweep violation telemetry flags contract-breaking entry
    flow."""
    from optflow_tpu.ops.tvl1_pallas import (
        _blocked_geometry,
        _blocked_level_fn,
        _fused_level_fn,
    )

    h, w, n = 72, 128, 2
    pairs = [make_fibsem_like(rng, h, w) for _ in range(n)]
    i0 = jnp.asarray(np.stack(pairs))
    i1 = jnp.asarray(
        np.stack([translate(a, 1.2, -0.6) for a in pairs])
    )
    u = jnp.zeros((n, h, w), jnp.float32)
    p = TVL1Params(nscales=1, warps=3, iterations=200, epsilon=0.01)

    def small_geo(hh, ww, s, k=8, budget=None):
        return _blocked_geometry(hh, ww, s, k, budget=220 * ww * 48)

    monkeypatch.setattr(tp, "_blocked_geometry", small_geo)

    _, _, _, fi, _ = _fused_level_fn(n, (h, w), None, p, True, 8)(
        i0, i1, u, u
    )
    _, _, bv, bi, _ = _blocked_level_fn(n, (h, w), None, p, True, 8, 8)(
        i0, i1, u, u
    )
    fi = np.asarray(fi)
    bi = np.asarray(bi)
    k = 8
    assert (bi < 3 * 200).all()  # the exit fired
    assert (bi >= fi).all()  # never exits earlier than the exact check
    assert (bi <= fi + 3 * (k - 1) + 3 * k).all()  # bounded overshoot

    # violation telemetry: one image enters a sweep beyond the contract
    u1 = np.zeros((n, h, w), np.float32)
    u1[1] = 12.0
    _, _, bv, _, bmx = _blocked_level_fn(n, (h, w), None, p, True, 8, 8)(
        i0, i1, jnp.asarray(u1), u
    )
    v = np.asarray(bv)
    assert v[1] >= 1 and v[0] == 0, v
    assert float(np.asarray(bmx)[1]) > 8.0  # blocked max|u| telemetry


def test_blocked_routing_beyond_budget(rng, monkeypatch):
    """tvl1_flow_batched_pallas must route oversized levels to the
    blocked kernel (not the legacy whole-pyramid path) when the fused
    path is on: with a shrunken fused budget, a small pyramid runs
    mixed fused/blocked and still matches the all-fused solve."""
    h, w, n = 48, 128, 2
    pairs = [make_fibsem_like(rng, h, w) for _ in range(n)]
    i0 = jnp.asarray(np.stack(pairs))
    i1 = jnp.asarray(
        np.stack([translate(a, 1.0, 0.5) for a in pairs])
    )
    p = TVL1Params(nscales=3, warps=2, iterations=40)

    ref = np.asarray(tp.tvl1_flow_batched_pallas(i0, i1, p))

    # force "TPU-style" routing in interpret mode: pretend the finest
    # level exceeds the fused budget so it takes the blocked kernel
    monkeypatch.setattr(tp, "_FUSED_PX_BUDGET", 40 * 128)
    monkeypatch.setattr(tp, "_on_tpu", lambda: True)
    mixed = np.asarray(
        tp.tvl1_flow_batched_pallas(i0, i1, p, interpret=True)
    )
    assert mixed.shape == ref.shape
    # blocked levels may run a few extra iterations (k-granular exit):
    # flows agree to numerical convergence level, not bit-exactly
    assert float(np.abs(mixed - ref).max()) < 0.05


def test_wide_contract_budgets():
    """Wider warp contracts shrink the fused pixel budget (more Mosaic
    temporaries — measured 118M scoped at s=16 under the s=8 budget) and
    the blocked geometry stays feasible across the repair ladder's
    shapes (code-review r5 #2/#4)."""
    from optflow_tpu.ops.tvl1_pallas import (
        _blocked_geometry,
        _fused_px_budget,
    )

    assert _fused_px_budget(16) < _fused_px_budget(8)
    # a mid-size level in the (wide, default] budget band must have a
    # valid blocked geometry at the wide contract (the repair ladder
    # routes it there instead of tripping the monolithic assert)
    h, w = 384, 1024
    assert _fused_px_budget(16) < h * w <= _fused_px_budget(8)
    geo = _blocked_geometry(h, w, 16)
    assert geo.nb >= 1 and geo.block >= 8

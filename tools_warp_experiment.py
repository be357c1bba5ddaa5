#!/usr/bin/env python
"""Feasibility experiment: bounded shift-compose warp vs the gather warp.

Round-2 profiling showed the TV-L1 solve on this TPU is ~90% warp_backward
(TPU gathers run at ~1.8 GB/s effective: ~147 ms per warp sweep at
(16, 256, 1024)). This prototypes the replacement: with |flow| <= S, the
2x2 bilinear/cubic-hat taps can be fetched by integer-shift compositing
(rolls + masked selects, pure VPU) in two passes (x then y) of 2S+2
shifts each. The two-pass decomposition evaluates the x-shift at the
source row instead of the target row — exact for rows within the same
shift bucket, and off by |du1/dy| * |sy| sub-pixel sampling error
otherwise (second-order for TV-L1's smooth fields; quantified here).

Prints timing + accuracy JSON lines; informs whether to land the shift
warp as the production warp in the next round.
"""

import json
import time

import numpy as np


def warp_backward_shift(i0, i1, i1x, i1y, u1, u2, max_shift=8):
    """Shift-compose analogue of ops.warp.warp_backward (same cubic-hat
    weights, clamp-to-edge). Requires |u| <= max_shift for exactness of
    the tap addresses; larger flows clamp to the shift window."""
    import jax
    import jax.numpy as jnp

    from optflow_tpu.ops.warp import _cubic_hat

    S = max_shift
    n, h, w = i1.shape
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    x = jnp.clip(xs + u1, 0.0, w - 1.0)
    y = jnp.clip(ys + u2, 0.0, h - 1.0)
    x0 = jnp.minimum(jnp.floor(x), w - 2.0)
    y0 = jnp.minimum(jnp.floor(y), h - 2.0)
    fx = x - x0
    fy = y - y0
    sx = jnp.clip((x0 - xs).astype(jnp.int32), -S, S)
    sy = jnp.clip((y0 - ys).astype(jnp.int32), -S, S)

    wx0 = _cubic_hat(fx)
    wx1 = _cubic_hat(1.0 - fx)
    wy0 = _cubic_hat(fy)
    wy1 = _cubic_hat(1.0 - fy)
    inv_norm = 1.0 / ((wx0 + wx1) * (wy0 + wy1))

    packed = jnp.stack([i1, i1x, i1y], axis=1)  # (N, 3, H, W)

    # pass X: A = packed[..., x0], B = packed[..., x0+1]
    A = jnp.zeros_like(packed)
    B = jnp.zeros_like(packed)
    for s in range(-S, S + 1):
        m = (sx == s)[:, None]
        A = jnp.where(m, jnp.roll(packed, -s, axis=-1), A)
        B = jnp.where(m, jnp.roll(packed, -(s + 1), axis=-1), B)
    TX = wx0[:, None] * A + wx1[:, None] * B  # (N, 3, H, W)

    # pass Y on TX: C = TX[:, :, y0, x], D = TX[:, :, y0+1, x]
    C = jnp.zeros_like(TX)
    D = jnp.zeros_like(TX)
    for s in range(-S, S + 1):
        m = (sy == s)[:, None]
        C = jnp.where(m, jnp.roll(TX, -s, axis=-2), C)
        D = jnp.where(m, jnp.roll(TX, -(s + 1), axis=-2), D)
    out = inv_norm[:, None] * (wy0[:, None] * C + wy1[:, None] * D)

    i1w, i1wx, i1wy = out[:, 0], out[:, 1], out[:, 2]
    grad = i1wx * i1wx + i1wy * i1wy
    rho_c = i1w - i1wx * u1 - i1wy * u2 - i0
    return i1w, i1wx, i1wy, grad, rho_c


def main():
    import jax
    import jax.numpy as jnp

    from bench import make_pair, DX, DY
    from optflow_tpu.ops.warp import centered_gradient, warp_backward

    N, H, W = 16, 256, 1024
    pairs = [make_pair(H, W, DX, DY, seed=i) for i in range(N)]
    i0 = jnp.asarray(np.stack([p[0] for p in pairs]))
    i1 = jnp.asarray(np.stack([p[1] for p in pairs]))
    i1x, i1y = jax.vmap(centered_gradient)(i1)
    rng = np.random.default_rng(0)
    # smooth non-trivial flow, |u| < 4
    import scipy.ndimage as ndi

    u1 = jnp.asarray(np.stack([
        ndi.gaussian_filter(rng.standard_normal((H, W)), 25) * 20
        for _ in range(N)
    ]).astype(np.float32))
    u2 = jnp.asarray(np.stack([
        ndi.gaussian_filter(rng.standard_normal((H, W)), 25) * 20
        for _ in range(N)
    ]).astype(np.float32))
    print(json.dumps({"max_u": round(float(jnp.abs(u1).max()), 2)}), flush=True)

    gather = jax.jit(
        lambda *a: jax.vmap(warp_backward)(*a)[1][0, 0, 0]
    )
    shift = jax.jit(
        lambda *a: warp_backward_shift(*a)[1][0, 0, 0]
    )
    gather_full = jax.jit(lambda *a: jax.vmap(warp_backward)(*a)[1])
    shift_full = jax.jit(lambda *a: warp_backward_shift(*a)[1])

    args = (i0, i1, i1x, i1y, u1, u2)
    # accuracy
    ga = np.asarray(gather_full(*args))
    sh = np.asarray(shift_full(*args))
    d = np.abs(ga - sh)[:, 9:-9, 9:-9]
    print(json.dumps({
        "metric": "shift-warp vs gather-warp i1wx",
        "max_abs_diff": round(float(d.max()), 5),
        "mean_abs_diff": round(float(d.mean()), 6),
    }), flush=True)

    null = jax.jit(lambda a: a[0, 0, 0] * 1.0)
    _ = float(null(i0))
    t0 = time.perf_counter()
    for _ in range(5):
        _ = float(null(i0))
    t_null = (time.perf_counter() - t0) / 5

    for name, fn in (("gather", gather), ("shift", shift)):
        _ = float(fn(*args))
        t0 = time.perf_counter()
        for _ in range(5):
            _ = float(fn(*args))
        dt = (time.perf_counter() - t0) / 5 - t_null
        print(json.dumps({
            "variant": name,
            "ms_per_warp_sweep": round(dt * 1000, 1),
            "shape": [N, H, W],
        }), flush=True)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Benchmark driver: TV-L1 throughput + EPE on the target accelerator.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline metric: megapixel image-pairs/s per chip for coarse-to-fine TV-L1
at the reference's default parameters (tau=.25, lambda=.05, theta=.3,
nscales=10, warps=5, iterations=300, eps=.01, scaleStep=.8 — the exact
defaults of src/optflow.cpp:503-512). The reference publishes no numbers
(BASELINE.md), so vs_baseline is reported against a 1.0 MP-pairs/s nominal
target; the EPE gate (<=0.5 px, driver target) is checked alongside.

Timing method: the per-dispatch synchronization latency of the harness's
TPU tunnel (~0.3 s) is amortized by chaining R batched solves with a data
dependency and synchronizing once — matching the production dispatch
pattern where the scheduler keeps the chip busy.
"""

import json
import sys
import time

import numpy as np


def make_pair(h, w, dx, dy, seed=0):
    """Synthetic FIB-SEM-like pair with known ground-truth flow (dx, dy)."""
    import scipy.ndimage as ndi

    rng = np.random.default_rng(seed)
    base = rng.standard_normal((h, w))
    tex = ndi.gaussian_filter(base, 2.0)
    lowf = ndi.gaussian_filter(rng.standard_normal((h, w)), 18.0)
    im = tex * 2.0 + lowf * 4.0
    im = (im - im.min()) / (np.ptp(im) + 1e-9)
    im0 = (20.0 + 215.0 * im).astype(np.float32)
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float64)
    im1 = ndi.map_coordinates(
        im0, [ys - dy, xs - dx], order=3, mode="nearest"
    ).astype(np.float32)
    return im0, im1


def main():
    import jax
    import jax.numpy as jnp

    from optflow_tpu.core.config import TVL1Params
    from optflow_tpu.ops.tvl1 import tvl1_flow

    dev = jax.devices()[0]
    platform = dev.platform

    # Production-representative geometry: scale-0.5 strip ROIs are ~150 x
    # 1000 (SURVEY.md §6); we bench a 256x1024 pair batch to fill the chip.
    H, W = 256, 1024
    BATCH = 8
    params = TVL1Params()  # reference defaults

    dx, dy = 2.0, -1.25
    pairs = [make_pair(H, W, dx, dy, seed=i) for i in range(BATCH)]
    i0 = jnp.asarray(np.stack([p[0] for p in pairs]))
    i1 = jnp.asarray(np.stack([p[1] for p in pairs]))

    solve = jax.jit(jax.vmap(lambda a, b: tvl1_flow(a, b, params)))

    # Compile + warm up (+ force full execution with a readback).
    flow = solve(i0, i1)
    _ = float(flow[0, 0, 0, 0])

    # EPE check on the warmup result (interior crop).
    f = np.asarray(flow[0])
    m = 16
    epe = float(
        np.sqrt(
            (f[m:-m, m:-m, 0] - dx) ** 2 + (f[m:-m, m:-m, 1] - dy) ** 2
        ).mean()
    )

    # Chained timing: R dependent solves, one final sync.
    R = 5
    t0 = time.perf_counter()
    x = i0
    out = None
    for _ in range(R):
        out = solve(x, i1)
        x = i0 + out[..., 0] * 1e-12
    _ = float(out[0, 0, 0, 0])
    dt = (time.perf_counter() - t0) / R

    mp_pairs_per_s = BATCH * (H * W / 1e6) / dt

    result = {
        "metric": "megapixel image-pairs/s per chip (TV-L1, ref defaults)",
        "value": round(mp_pairs_per_s, 4),
        "unit": "MP-pairs/s",
        "vs_baseline": round(mp_pairs_per_s / 1.0, 4),
        "epe_px": round(epe, 4),
        "epe_target_px": 0.5,
        "epe_ok": epe <= 0.5,
        "platform": platform,
        "shape": [BATCH, H, W],
        "seconds_per_batch": round(dt, 4),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()

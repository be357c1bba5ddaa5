#!/usr/bin/env python
"""Round-4 probe: which feature-pipeline stage dominates on TPU?

Times (value-readback synced) at the features-bench shape (4, 256, 1024):
  detect+describe (both frames), knn match + ratio, RANSAC homography,
  the full prealign program, and the TV-L1 solve it feeds.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from bench_matrix import _pairs  # noqa: E402

from optflow_tpu.core.config import (
    MatchParams, OrbParams, SurfParams, SURF_TYPE, TVL1Params,
)
from optflow_tpu.features import align as fa
from optflow_tpu.features.match import knn_match2, ratio_filter
from optflow_tpu.features.ransac import find_homography
from optflow_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

H, W, BATCH = 256, 1024, 4


def timed(fn, reps=3):
    fn()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    print("platform:", jax.devices()[0].platform, flush=True)
    orb, surf, mp = OrbParams(), SurfParams(), MatchParams()
    i0_np, i1_np, _ = _pairs(BATCH, H, W)
    i0 = jnp.asarray(i0_np)
    i1 = jnp.asarray(i1_np)
    _ = float(jnp.ones((8, 128)).sum())

    dd = jax.jit(jax.vmap(
        lambda im: fa._detect_describe_device(im, SURF_TYPE, orb, surf)
    ))

    def run_dd():
        k0, d0, _b = dd(i0)
        k1, d1, _b = dd(i1)
        _ = float(d0.ravel()[0]) + float(d1.ravel()[0])
        return k0, d0, k1, d1

    t_dd = timed(run_dd)
    print(f"detect+describe x2 : {t_dd*1e3:8.1f} ms", flush=True)
    k0, d0, k1, d1 = run_dd()

    mt = jax.jit(jax.vmap(
        lambda a, av, b, bv: knn_match2(a, av, b, bv, binary=False)
    ))

    def run_match():
        m = mt(d0, k0.valid, d1, k1.valid)
        _ = float(m.idx.ravel()[0])
        return m

    t_m = timed(run_match)
    print(f"knn match          : {t_m*1e3:8.1f} ms", flush=True)
    matches = run_match()

    rf = jax.jit(jax.vmap(lambda m: ratio_filter(m, mp.ratio)))
    good = rf(matches)

    def hom_fn(x0, y0, xi, yi, g, mi):
        p0 = jnp.stack([x0, y0], axis=1)
        p1 = jnp.stack([xi, yi], axis=1)[mi]
        return find_homography(p0, p1, g, thresh=float(mp.ransac),
                               method=int(mp.homo))

    hj = jax.jit(jax.vmap(hom_fn))

    def run_h():
        r = hj(k0.x, k0.y, k1.x, k1.y, good, matches.idx)
        _ = float(r[0].ravel()[0])
        return r

    t_h = timed(run_h)
    print(f"RANSAC homography  : {t_h*1e3:8.1f} ms", flush=True)

    pre = jax.jit(
        lambda a, b: fa.find_alignment_batched_device(
            b, a, SURF_TYPE, orb, surf, mp
        ).affine
    )

    def run_pre():
        _ = float(pre(i0, i1).ravel()[0])

    t_pre = timed(run_pre)
    print(f"full prealign      : {t_pre*1e3:8.1f} ms", flush=True)

    from optflow_tpu.ops.tvl1 import tvl1_flow_batched

    def run_solve():
        f = tvl1_flow_batched(i0, i1, TVL1Params())
        _ = float(f[0, 0, 0, 0])

    t_s = timed(run_solve)
    print(f"TV-L1 solve (N=4)  : {t_s*1e3:8.1f} ms", flush=True)
    mp_px = BATCH * H * W / 1e6
    print(f"\nprealign alone     : {mp_px / t_pre:6.2f} MP-pairs/s", flush=True)
    print(f"combined (pre+solve): {mp_px / (t_pre + t_s):6.2f} MP-pairs/s",
          flush=True)


if __name__ == "__main__":
    main()

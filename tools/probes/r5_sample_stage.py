#!/usr/bin/env python
"""Round-5 probe: where does the device group pipeline's time go?

bench_job's "sample" stage (the per-group device work behind the packed
readback) measured ~0.28 s per 16-pair group while the solve alone is
~0.15 s. Times each piece value-synced: frame stack+cast, ROI gather,
TV-L1 solve, post+top-k sample program, packed readback.
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def timed(fn, reps=4):
    fn()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    import jax
    import jax.numpy as jnp

    from optflow_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    print("platform:", jax.devices()[0].platform, flush=True)
    _ = float(jnp.ones((8, 128)).sum())

    from bench import make_pair
    from optflow_tpu.core.config import TVL1Params
    from optflow_tpu.engine import device_group as dg
    from optflow_tpu.engine.rois import Roi
    from optflow_tpu.ops.tvl1 import tvl1_flow_batched

    params = TVL1Params()
    fh, fw, n_pairs, u = 512, 1024, 16, 20
    npoints = 25
    rng = np.random.default_rng(0)
    frames = []
    for i in range(u):
        a, _b = make_pair(fh, fw, 0, 0, seed=i)
        frames.append(a)
    handles = [jax.device_put(f.astype(np.float16)) for f in frames]
    f0_idx = np.arange(n_pairs, dtype=np.int32)
    f1_idx = (np.arange(n_pairs, dtype=np.int32) + 1) % u
    rois = [("top", Roi(0, 0, fw, 256)), ("bottom", Roi(0, 256, fw, 256))]

    def stack():
        fd, _ = dg.stack_frames(handles, fh, fw)
        _ = float(fd[0, 0, 0].astype(jnp.float32))
        return fd

    t_stack = timed(stack)
    frames_dev = stack()
    print(f"stack+cast        : {t_stack*1e3:8.1f} ms", flush=True)

    roi_key = tuple((r.y, r.x, r.height, r.width) for _n, r in rois)
    gather = dg._gather_fn(
        frames_dev.shape[0], fh, fw, roi_key, False, n_pairs
    )
    warped = jnp.zeros((n_pairs, fh, fw), jnp.float32)

    def run_gather():
        i0s, i1s = gather(
            frames_dev, jnp.asarray(f0_idx), jnp.asarray(f1_idx), warped
        )
        _ = float(i0s[0, 0, 0])
        return i0s, i1s

    t_gather = timed(run_gather)
    i0s, i1s = run_gather()
    print(f"roi gather        : {t_gather*1e3:8.1f} ms", flush=True)

    def run_solve():
        f = tvl1_flow_batched(i0s, i1s, params, repair_contract=False)
        _ = float(f[0, 0, 0, 0])
        return f

    t_solve = timed(run_solve)
    flow = run_solve()
    print(f"tv-l1 solve (32)  : {t_solve*1e3:8.1f} ms", flush=True)

    rn = 2 * n_pairs
    h, w = 256, fw
    post = dg._post_sample_fn(h, w, "displacement", npoints, rn)
    affs = jnp.broadcast_to(jnp.eye(2, 3, dtype=jnp.float32), (rn, 2, 3))
    key = jax.random.PRNGKey(1)
    mask = jnp.zeros((rn,), jnp.int32)
    mxu = jnp.zeros((rn,), jnp.float32)

    def run_post():
        p = post(flow, i0s, i1s, affs, key, mask, mxu)
        _ = float(p[0, 0])
        return p

    t_post = timed(run_post)
    packed = run_post()
    print(f"post+topk sample  : {t_post*1e3:8.1f} ms", flush=True)

    def run_read():
        _ = np.asarray(packed)

    t_read = timed(run_read)
    print(f"packed readback   : {t_read*1e3:8.1f} ms", flush=True)

    total = t_stack + t_gather + t_solve + t_post + t_read
    print(f"TOTAL             : {total*1e3:8.1f} ms "
          f"({n_pairs * 2 * h * w / 1e6 / total:6.2f} MP-pairs/s "
          f"at this group shape)", flush=True)


if __name__ == "__main__":
    main()

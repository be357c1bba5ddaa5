#!/usr/bin/env python
"""Round-4 probe 2: split solve time into warp-sweep cost vs iteration cost.

 - iterations=1 (5 warps): warp sweeps + pad/unpad + dispatch + pyramid
 - default (300, eps=.01): + the real iteration compute
 - warps=1, iterations=1: single sweep overhead
 - singleton-level mode (exact per-level geometry, 1 program/level)
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from bench import make_pair, H, W, BATCH, DX, DY  # noqa: E402

from optflow_tpu.core.config import TVL1Params
from optflow_tpu.ops import tvl1_pallas as tp
from optflow_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()


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
    pairs = [make_pair(H, W, DX, DY, seed=i) for i in range(BATCH)]
    i0 = jnp.asarray(np.stack([p[0] for p in pairs]))
    i1 = jnp.asarray(np.stack([p[1] for p in pairs]))
    _ = float(jnp.ones((8, 128)).sum())

    import dataclasses

    def rep(p, **kw):
        try:
            return dataclasses.replace(p, **kw)
        except TypeError:
            return p._replace(**kw)

    base = TVL1Params()
    cases = [
        ("default (300 it, eps=.01)", base),
        ("iterations=1", rep(base, iterations=1)),
        ("warps=1 iterations=1", rep(base, warps=1, iterations=1)),
        ("warps=1 (300 it)", rep(base, warps=1)),
    ]
    for name, p in cases:
        def run(p=p):
            f = tp.tvl1_flow_batched_pallas(i0, i1, p)
            jax.block_until_ready(f)
        t = timed(run)
        print(f"{name:28s}: {t*1e3:8.1f} ms", flush=True)

    # gather-warp variant (shift_warp=False) at iterations=1
    def run_gw():
        f = tp.tvl1_flow_batched_pallas(i0, i1, rep(base, iterations=1),
                                        shift_warp=False)
        jax.block_until_ready(f)
    t = timed(run_gw, reps=2)
    print(f"{'iterations=1 gather-warp':28s}: {t*1e3:8.1f} ms", flush=True)

    os.environ["OPTFLOW_TPU_SINGLETON_LEVELS"] = "1"
    def run_s():
        f = tp.tvl1_flow_batched_pallas(i0, i1, base)
        jax.block_until_ready(f)
    t = timed(run_s)
    print(f"{'singleton levels default':28s}: {t*1e3:8.1f} ms", flush=True)
    del os.environ["OPTFLOW_TPU_SINGLETON_LEVELS"]


if __name__ == "__main__":
    main()

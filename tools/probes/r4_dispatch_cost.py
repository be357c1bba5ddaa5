#!/usr/bin/env python
"""Round-4 probe 3: per-program dispatch cost through the axon tunnel, and
a clean re-measure of the iterations=1 anomaly.

a) K eager launches of a trivial cached program, sync only at the end:
   measures HOST-side per-dispatch cost when launches pipeline.
b) same with sync per launch: round-trip latency.
c) default solve vs iterations=1 solve (fresh process, interleaved).
"""

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


def main():
    print("platform:", jax.devices()[0].platform, flush=True)

    x = jnp.ones((256, 1024))

    @jax.jit
    def tick(a):
        return a * 1.0001 + 0.1

    y = tick(x)
    y.block_until_ready()

    K = 50
    t0 = time.perf_counter()
    z = x
    for _ in range(K):
        z = tick(z)
    z.block_until_ready()
    t_async = (time.perf_counter() - t0) / K
    print(f"per-dispatch (pipelined, {K} launches): {t_async*1e3:7.2f} ms",
          flush=True)

    t0 = time.perf_counter()
    for _ in range(10):
        tick(x).block_until_ready()
    t_sync = (time.perf_counter() - t0) / 10
    print(f"per-dispatch (sync each)             : {t_sync*1e3:7.2f} ms",
          flush=True)

    # clean re-measure: default vs iterations=1, interleaved x3
    import dataclasses

    pairs = [make_pair(H, W, DX, DY, seed=i) for i in range(BATCH)]
    i0 = jnp.asarray(np.stack([p[0] for p in pairs]))
    i1 = jnp.asarray(np.stack([p[1] for p in pairs]))
    base = TVL1Params()
    one = dataclasses.replace(base, iterations=1)

    def solve(p):
        f = tp.tvl1_flow_batched_pallas(i0, i1, p)
        jax.block_until_ready(f)

    solve(base)
    solve(one)
    for trial in range(3):
        for name, p in (("default", base), ("iters=1", one)):
            t0 = time.perf_counter()
            solve(p)
            dt = time.perf_counter() - t0
            print(f"trial {trial} {name:8s}: {dt*1e3:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()

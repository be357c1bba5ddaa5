#!/usr/bin/env python
"""Perf experiment: jnp level solver vs Pallas fused kernel on TPU.

Times the full coarse-to-fine TV-L1 at bench shapes (batch x 256 x 1024,
reference defaults, bench-style textured inputs so the epsilon early exit
behaves like production) for:
  a) the pure-XLA level solver (HBM-roundtripping per iteration)
  b) the Pallas VMEM-resident iteration kernel (production TPU path)
Prints one JSON line per variant. Scalar-only readbacks.
"""

import json
import sys
import time

import numpy as np

H, W = 256, 1024
BATCH = 4
REPS = 3


def main():
    import jax
    import jax.numpy as jnp

    from bench import make_pair, DX, DY
    from optflow_tpu.core.config import TVL1Params
    from optflow_tpu.ops.tvl1 import tvl1_flow, tvl1_flow_level
    from optflow_tpu.ops.tvl1_pallas import tvl1_flow_batched_pallas

    params = TVL1Params()
    pairs = [make_pair(H, W, DX, DY, seed=i) for i in range(BATCH)]
    i0 = jnp.asarray(np.stack([p[0] for p in pairs]))
    i1 = jnp.asarray(np.stack([p[1] for p in pairs]))

    run_xla = jax.jit(
        lambda a, b: jax.vmap(
            lambda x, y: tvl1_flow(x, y, params, level_solver=tvl1_flow_level)
        )(a, b)[0, 0, 0, 0]
    )

    def run_pallas(a, b):
        # eager orchestration: per-level jitted programs, one distinct
        # Mosaic kernel each (a whole-pyramid trace faults the worker,
        # ops/tvl1_pallas._level_fn)
        return tvl1_flow_batched_pallas(a, b, params)[0, 0, 0, 0]

    variants = {"xla": run_xla, "pallas": run_pallas}
    which = sys.argv[1:] or list(variants)
    for name in which:
        fn = variants[name]
        try:
            t0 = time.perf_counter()
            _ = float(fn(i0, i1))  # compiles all programs
            tc = time.perf_counter() - t0
            _ = float(fn(i0, i1))
            times = []
            for _ in range(REPS):
                t0 = time.perf_counter()
                s = fn(i0, i1)
                _ = float(s)
                times.append(time.perf_counter() - t0)
            dt = float(np.median(times))
            print(json.dumps({
                "variant": name,
                "sec_per_batch": round(dt, 4),
                "mp_pairs_s": round(BATCH * H * W / 1e6 / dt, 4),
                "compile_s": round(tc, 1),
            }), flush=True)
        except Exception as e:
            print(json.dumps({"variant": name, "error": repr(e)[:300]}), flush=True)


if __name__ == "__main__":
    main()

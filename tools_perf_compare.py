#!/usr/bin/env python
"""One-off perf experiment: jnp level solver vs Pallas fused kernel on TPU.

Times the full coarse-to-fine TV-L1 at bench shapes (batch x 256 x 1024,
reference defaults) for:
  a) the pure-XLA level solver (current bench path)
  b) the Pallas VMEM-resident iteration kernel (current VMEM budget)
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

    from optflow_tpu.core.config import TVL1Params
    from optflow_tpu.ops.tvl1 import tvl1_flow
    from optflow_tpu.ops.tvl1_pallas import tvl1_flow_level_pallas

    params = TVL1Params()
    rng = np.random.default_rng(0)
    i0 = jnp.asarray(rng.random((BATCH, H, W), dtype=np.float32) * 255.0)
    i1 = jnp.asarray(rng.random((BATCH, H, W), dtype=np.float32) * 255.0)

    variants = {
        "xla": None,
        "pallas": tvl1_flow_level_pallas,
    }
    which = sys.argv[1:] or list(variants)
    for name in which:
        ls = variants[name]

        def fn(a, b):
            flow = jax.vmap(lambda x, y: tvl1_flow(x, y, params, level_solver=ls))(a, b)
            return flow[0, 0, 0, 0]

        try:
            t0 = time.perf_counter()
            compiled = jax.jit(fn).lower(i0, i1).compile()
            tc = time.perf_counter() - t0
            _ = float(compiled(i0, i1))
            _ = float(compiled(i0, i1))
            times = []
            for _ in range(REPS):
                t0 = time.perf_counter()
                s = compiled(i0, i1)
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

#!/usr/bin/env python
"""Round-4 probe 3: what is the REAL usable VMEM scratch on this v5e?

Allocates a pallas kernel with N MiB of VMEM scratch (+ touches it all)
for increasing N and reports the largest that compiles AND runs.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def try_mb(mb: int) -> bool:
    rows = mb * 1024 * 1024 // (4 * 512)  # (rows, 512) f32

    def kernel(x_ref, o_ref, scratch):
        scratch[:] = jnp.full((rows, 512), x_ref[0, 0], jnp.float32)
        o_ref[0, 0] = jnp.sum(scratch[:]) / rows / 512

    try:
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            scratch_shapes=[pltpu.VMEM((rows, 512), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=(mb + 8) * 1024 * 1024
            ),
        )(jnp.array([[3.0]], jnp.float32))
        ok = abs(float(out[0, 0]) - 3.0) < 1e-3
        return ok
    except Exception as e:
        print(f"  {mb} MiB failed: {type(e).__name__}: {str(e)[:200]}")
        return False


def main():
    print("platform:", jax.devices()[0].platform, flush=True)
    for mb in (16, 32, 48, 64, 80, 96, 112, 120, 127):
        ok = try_mb(mb)
        print(f"scratch {mb:4d} MiB: {'OK' if ok else 'FAIL'}", flush=True)
        if not ok:
            break


if __name__ == "__main__":
    main()

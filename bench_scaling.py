#!/usr/bin/env python
"""Scaling-efficiency benchmark for the sharded pair scheduler.

Measures image-pairs/s of the data-parallel batched solve at mesh sizes
1, 2, 4, 8 and reports efficiency vs linear scaling — the driver target is
>= 0.9 linear to 2+ hosts (BASELINE.md). Only one physical TPU chip is
reachable in this harness, so by default this runs on a virtual CPU device
mesh (JAX_PLATFORMS config + xla_force_host_platform_device_count), which
validates the sharding structure and collective-free pair parallelism;
absolute numbers are CPU numbers and labeled as such.

Prints one JSON line.
"""

import json
import os
import time


def main():
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    ).strip()
    import sys

    import jax

    # Default: virtual CPU mesh (only one physical TPU chip is reachable in
    # this harness, and probing jax.devices() would latch the backend
    # before we could switch). Pass --tpu on a real multi-chip slice.
    if "--tpu" not in sys.argv:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from optflow_tpu.core.config import TVL1Params
    from optflow_tpu.dist.mesh import make_pair_mesh
    from optflow_tpu.ops.tvl1 import tvl1_flow_batched

    n_dev = len(jax.devices())
    platform = jax.devices()[0].platform
    params = TVL1Params(nscales=3, warps=3, iterations=60, epsilon=0.0)
    H, W = 128, 256
    per_dev = 2
    rng = np.random.default_rng(0)

    results = {}
    sizes = [s for s in (1, 2, 4, 8) if s <= n_dev]
    for n in sizes:
        mesh = make_pair_mesh(n_pairs_axis=n, n_rows_axis=1,
                              devices=jax.devices()[:n])
        batch = per_dev * n
        i0 = jnp.asarray(
            (rng.random((batch, H, W)) * 255).astype(np.float32)
        )
        i1 = jnp.asarray(
            (rng.random((batch, H, W)) * 255).astype(np.float32)
        )
        sharding = NamedSharding(mesh, P("pairs", None, None))
        i0 = jax.device_put(i0, sharding)
        i1 = jax.device_put(i1, sharding)
        # the production path: shard_map over the pairs axis, natively
        # batched solver per shard (what PairScheduler dispatches)
        solve = jax.jit(
            jax.shard_map(
                lambda a, b: tvl1_flow_batched(a, b, params),
                mesh=mesh,
                in_specs=(P("pairs"), P("pairs")),
                out_specs=P("pairs"),
                check_vma=False,
            )
        )
        out = solve(i0, i1)
        _ = float(out[0, 0, 0, 0])
        R = 3
        t0 = time.perf_counter()
        x = i0
        for _ in range(R):
            out = solve(x, i1)
            x = i0 + out[..., 0] * 1e-12
        _ = float(out[0, 0, 0, 0])
        dt = (time.perf_counter() - t0) / R
        results[n] = batch / dt

    base = results[sizes[0]]
    effs = {
        str(n): round(results[n] / (base * n), 4) for n in sizes
    }
    out = {
        "metric": "pairs/s scaling efficiency (sharded pair scheduler)",
        "value": effs[str(sizes[-1])],
        "unit": f"fraction of linear at {sizes[-1]} devices",
        "vs_baseline": round(effs[str(sizes[-1])] / 0.9, 4),
        "platform": platform,
        "devices": n_dev,
        "pairs_per_s": {str(n): round(results[n], 3) for n in sizes},
        "efficiency": effs,
        "note": (
            "virtual CPU devices share physical cores: efficiency here "
            "validates sharding structure only; the >=0.9 target applies "
            "to real multi-chip meshes"
            if platform == "cpu"
            else "real accelerator mesh"
        ),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()

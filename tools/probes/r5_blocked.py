#!/usr/bin/env python
"""Round-5 probe: the blocked fused kernel on big sections (real TPU).

Verdict r4 #2: sections beyond ~0.42 Mpx dropped the whole pyramid to
the legacy path (11.6 MP-pairs/s, a 4.8x cliff). The blocked kernel
streams row blocks through VMEM with all sweeps + iteration chunks in
one launch per level. Targets: (4, 512, 1024) and (1, 1024, 1024) at
>= 40 MP-pairs/s with the EPE gate intact.

All timing value-readback synced (block_until_ready acks early here).
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
from bench import make_pair  # noqa: E402


def measure(shape, dx=2.0, dy=-1.25, reps=5):
    import jax.numpy as jnp

    from optflow_tpu.core.config import TVL1Params
    from optflow_tpu.ops.tvl1 import tvl1_flow_batched
    from optflow_tpu.ops.tvl1_pallas import get_last_iteration_stats

    n, h, w = shape
    pairs = [make_pair(h, w, dx, dy, seed=i) for i in range(n)]
    i0 = jnp.asarray(np.stack([p[0] for p in pairs]))
    i1 = jnp.asarray(np.stack([p[1] for p in pairs]))
    params = TVL1Params()

    def solve():
        return tvl1_flow_batched(i0, i1, params, repair_contract=False)

    t0 = time.perf_counter()
    flow = solve()
    m = 16
    inner = flow[:, m:-m, m:-m, :]
    epe_dev = jnp.sqrt(
        (inner[..., 0] - dx) ** 2 + (inner[..., 1] - dy) ** 2
    ).mean()
    epe = float(epe_dev)
    print(f"  first call: {time.perf_counter() - t0:.1f}s  epe={epe:.4f}",
          flush=True)
    stats = get_last_iteration_stats()
    px_iters = sum(
        hh * ww * float(np.asarray(its).sum()) for (hh, ww), its in stats
    )
    # steady state: pipeline reps batches, one sync
    _ = float(solve()[0, 0, 0, 0])
    t0 = time.perf_counter()
    outs = [solve() for _ in range(reps)]
    _ = float(outs[-1][0, 0, 0, 0])
    dt = (time.perf_counter() - t0) / reps
    mp = n * h * w / 1e6
    print(
        f"  steady-state: {dt*1e3:7.1f} ms/batch  "
        f"{mp/dt:6.2f} MP-pairs/s  epe={epe:.4f}  "
        f"Gpx-iters={px_iters/1e9:.2f}",
        flush=True,
    )
    return mp / dt, epe


def main():
    import jax

    from optflow_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    print("platform:", jax.devices()[0].platform, flush=True)
    import jax.numpy as jnp

    _ = float(jnp.ones((8, 128)).sum())

    shapes = [(4, 512, 1024), (1, 1024, 1024), (16, 256, 1024)]
    if len(sys.argv) > 1:  # e.g. "4x512x1024" to run one shape
        shapes = [tuple(int(x) for x in a.split("x")) for a in sys.argv[1:]]
    for shape in shapes:
        print(f"shape {shape}:", flush=True)
        v, epe = measure(shape)
        assert epe <= 0.5, f"EPE gate failed: {epe}"


if __name__ == "__main__":
    main()

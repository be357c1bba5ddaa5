#!/usr/bin/env python
"""Round-5 probe: host<->device transfer bandwidth through the tunnel.

The job-level bench (bench_job.py) measured run_job_batched at 0.86
MP-pairs/s vs 55 for the solve alone; the engine's solve stage uploads
full f32 ROI stacks and downloads full flow/valid fields per group.
This probe measures what those transfers actually cost here.
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp

    print("platform:", jax.devices()[0].platform, flush=True)
    _ = float(jnp.ones((8, 128)).sum())

    shapes = [
        ("f32 16x256x1024 (ROI stack)", np.float32, (16, 256, 1024)),
        ("u8  16x512x1024 (frames)", np.uint8, (16, 512, 1024)),
        ("f32 16x25x4 (samples)", np.float32, (16, 25, 4)),
    ]
    for name, dt, shape in shapes:
        x = np.ones(shape, dt)
        nbytes = x.nbytes
        # H2D: device_put + tiny readback to confirm arrival
        d = jax.device_put(x)
        _ = float(jnp.asarray(d).ravel()[0].astype(jnp.float32))
        ts = []
        for _i in range(3):
            t0 = time.perf_counter()
            d = jax.device_put(x)
            _ = float(jnp.asarray(d).ravel()[0].astype(jnp.float32))
            ts.append(time.perf_counter() - t0)
        t_h2d = float(np.median(ts))
        # D2H: np.asarray of a device array
        y = jnp.asarray(np.ones(shape, dt))
        _ = np.asarray(y)
        ts = []
        for _i in range(3):
            t0 = time.perf_counter()
            _ = np.asarray(y)
            ts.append(time.perf_counter() - t0)
        t_d2h = float(np.median(ts))
        print(
            f"{name:30s} {nbytes/1e6:6.1f} MB  "
            f"H2D {t_h2d*1e3:8.1f} ms ({nbytes/t_h2d/1e6:7.1f} MB/s)  "
            f"D2H {t_d2h*1e3:8.1f} ms ({nbytes/t_d2h/1e6:7.1f} MB/s)",
            flush=True,
        )

    # does an async device_put overlap with compute? time a solve with
    # and without an interleaved upload
    from optflow_tpu.core.config import TVL1Params
    from optflow_tpu.ops.tvl1 import tvl1_flow_batched
    from bench import make_pair

    pairs = [make_pair(256, 1024, 2.0, -1.25, seed=i) for i in range(16)]
    i0 = jnp.asarray(np.stack([p[0] for p in pairs]))
    i1 = jnp.asarray(np.stack([p[1] for p in pairs]))
    params = TVL1Params()
    _ = float(tvl1_flow_batched(i0, i1, params,
                                repair_contract=False)[0, 0, 0, 0])
    up = np.ones((16, 256, 1024), np.float32)

    t0 = time.perf_counter()
    f = tvl1_flow_batched(i0, i1, params, repair_contract=False)
    _ = float(f[0, 0, 0, 0])
    t_solve = time.perf_counter() - t0

    t0 = time.perf_counter()
    f = tvl1_flow_batched(i0, i1, params, repair_contract=False)
    d = jax.device_put(up)
    _ = float(f[0, 0, 0, 0])
    _ = float(jnp.asarray(d).ravel()[0])
    t_both = time.perf_counter() - t0
    print(
        f"solve alone {t_solve*1e3:7.1f} ms; solve + overlapped 16.8 MB "
        f"upload {t_both*1e3:7.1f} ms (overlap saves "
        f"{(t_solve + 0.0):.3f}+upload-both)",
        flush=True,
    )


if __name__ == "__main__":
    main()

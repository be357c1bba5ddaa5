#!/usr/bin/env python
"""Round-5 probe: per-level timing of the (1, 1024, 1024) solve — which
pyramid levels carry the blocked-kernel overhead?"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax.numpy as jnp

    from optflow_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    import jax

    print("platform:", jax.devices()[0].platform, flush=True)
    _ = float(jnp.ones((8, 128)).sum())

    from bench import make_pair
    from optflow_tpu.core.config import TVL1Params
    from optflow_tpu.ops import tvl1_pallas as tp
    from optflow_tpu.ops.pyramid import pyramid_shapes
    from optflow_tpu.ops.warp import SHIFT_WARP_MAX

    params = TVL1Params()
    n, h, w = 1, 1024, 1024
    i0_np, i1_np = make_pair(h, w, 2.0, -1.25, seed=0)
    i0 = jnp.asarray(i0_np[None])
    i1 = jnp.asarray(i1_np[None])
    shapes = pyramid_shapes(h, w, params.nscales, params.scale_step)
    build = tp._pyramid_fn(n, h, w, params.nscales, params.scale_step,
                           False)
    levels = build(jnp.concatenate([i0, i1], axis=0))
    coarsest = shapes[-1]
    u1 = jnp.zeros((n,) + coarsest, jnp.float32)
    u2 = jnp.zeros((n,) + coarsest, jnp.float32)

    state = [(u1, u2)]
    steps = []
    for s in range(len(shapes) - 1, -1, -1):
        nxt = shapes[s - 1] if s > 0 else None
        fits = (
            tp._round_up(shapes[s][0], 8) * tp._round_up(shapes[s][1], 128)
            <= tp._FUSED_PX_BUDGET
        )
        if fits:
            kind = "fused"
            step = tp._fused_level_fn(n, shapes[s], nxt, params, False,
                                      int(SHIFT_WARP_MAX))
        else:
            kind = "blocked"
            step = tp._blocked_level_fn(n, shapes[s], nxt, params, False,
                                        int(SHIFT_WARP_MAX),
                                        tp._BLOCKED_K)
        steps.append((s, kind, step))

    def run_all(timed=False):
        a, b = u1, u2
        rows = []
        for s, kind, step in steps:
            t0 = time.perf_counter()
            a, b, v, its, mx = step(levels[s][:n], levels[s][n:], a, b)
            if timed:
                _ = float(a[0, 0, 0])  # per-level sync
                rows.append((s, kind, shapes[s],
                             time.perf_counter() - t0,
                             int(np.asarray(its)[0])))
        return a, b, rows

    run_all()  # warm
    _ = float(run_all()[0][0, 0, 0])
    _, _, rows = run_all(timed=True)
    total = sum(r[3] for r in rows)
    for s, kind, shape, dt, its in rows:
        px_it = shape[0] * shape[1] * its
        print(f"L{s:2d} {kind:7s} {str(shape):12s} {dt*1e3:8.2f} ms "
              f"iters={its:4d}  {px_it/dt/1e9:6.2f} Gpx-it/s "
              f"({dt/total*100:4.1f}%)", flush=True)
    print(f"total (per-level synced): {total*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()

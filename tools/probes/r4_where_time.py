#!/usr/bin/env python
"""Round-4 probe: where does the 0.26 s/batch of the headline solve go?

Measures on the real chip, each with hard sync between stages:
  1. full default solve (eps=0.01)      — the headline path
  2. full solve with eps=0              — no early exit: all 300 iters/warp
  3. pyramid build alone
  4. each canvas-group program alone (sync'd), default eps
  5. per-level iteration counts (run chunked mode with an iteration probe)
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
from optflow_tpu.ops.pyramid import pyramid_shapes, resize_bilinear
from optflow_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()


def timed(fn, reps=3):
    fn()  # warm
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

    params = TVL1Params()
    p_noeps = params._replace(epsilon=0.0) if hasattr(params, "_replace") else None
    if p_noeps is None:
        import dataclasses
        p_noeps = dataclasses.replace(params, epsilon=0.0)

    def solve(p):
        f = tp.tvl1_flow_batched_pallas(i0, i1, p)
        jax.block_until_ready(f)
        return f

    t_def = timed(lambda: solve(params))
    print(f"full solve eps=0.01 : {t_def*1e3:8.1f} ms", flush=True)
    t_noeps = timed(lambda: solve(p_noeps))
    print(f"full solve eps=0    : {t_noeps*1e3:8.1f} ms", flush=True)

    # pyramid alone
    build = tp._pyramid_fn(BATCH, H, W, params.nscales, params.scale_step, False)
    stacked = jnp.concatenate([i0, i1], axis=0)

    def pyr():
        levels = build(stacked)
        jax.block_until_ready(levels)
        return levels

    t_pyr = timed(pyr)
    print(f"pyramid build       : {t_pyr*1e3:8.1f} ms", flush=True)
    levels = pyr()

    # per-group timing
    shapes = pyramid_shapes(H, W, params.nscales, params.scale_step)
    canvases = tp._assign_canvases(shapes)
    order = list(range(len(shapes) - 1, -1, -1))
    groups = []
    for s in order:
        if groups and groups[-1][0] == canvases[s]:
            groups[-1][1].append(s)
        else:
            groups.append((canvases[s], [s]))
    print("groups:", [(g[0].hp, g[0].wp, g[1]) for g in groups], flush=True)

    coarsest = shapes[-1]
    u1 = jnp.zeros((BATCH,) + coarsest, jnp.float32)
    u2 = jnp.zeros((BATCH,) + coarsest, jnp.float32)
    for canvas, idxs in groups:
        finest = idxs[-1]
        up_shape = shapes[finest - 1] if finest > 0 else None
        step = tp._group_fn(
            BATCH, tuple(shapes[s] for s in idxs), up_shape, params, canvas,
            False, None,
        )
        args = tuple(levels[s] for s in idxs)

        def run(u1=u1, u2=u2, step=step, args=args):
            a, b = step(args, u1, u2)
            jax.block_until_ready((a, b))
            return a, b

        t_g = timed(run)
        print(
            f"group canvas=({canvas.hp}x{canvas.wp}) levels={idxs}: "
            f"{t_g*1e3:8.1f} ms", flush=True,
        )
        u1, u2 = run()

    # iteration counts per level per warp: use the errs output in
    # singleton mode by running each level with chunked iterations of 1?
    # Too slow. Instead: run each level with m limited and bisect? Skip —
    # compare eps=0 vs default is the aggregate signal.


if __name__ == "__main__":
    main()

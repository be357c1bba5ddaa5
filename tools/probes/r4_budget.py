#!/usr/bin/env python
"""Round-4 probe 4: HONEST time budget for the headline solve.

CAUTION (measured): jax.block_until_ready acks early through the axon
tunnel — a full solve "blocks" in 1.5 ms while a float() readback of the
same result takes 285 ms. Every timing below syncs via a scalar value
readback, like bench.py does.

Budget rows:
  tick roundtrip     — one trivial cached program + scalar readback
  tick x50 pipelined — per-dispatch host cost when launches pipeline
  pyramid            — both-frame pyramid build
  group B (coarse)   — canvas(136x640) program, levels 9..3
  group A (fine)     — canvas(256x1024) program, levels 2..0
  full default       — the headline path (eps=.01)
  full eps=0         — all 300x5 iterations (upper bound on iter work)
  iterations=1       — warp sweeps + launches + DMA only
  warps=1            — 1/5th of warp+launch cost
"""

import dataclasses
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from bench import make_pair, H, W, BATCH, DX, DY  # noqa: E402

from optflow_tpu.core.config import TVL1Params
from optflow_tpu.ops import tvl1_pallas as tp
from optflow_tpu.ops.pyramid import pyramid_shapes
from optflow_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()


def sync(x):
    """Hard sync: scalar value readback (block_until_ready lies on axon)."""
    return float(jnp.asarray(x).ravel()[0])


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
    sync(i0.sum())

    rows = []

    def report(name, dt):
        rows.append((name, dt))
        print(f"{name:24s}: {dt*1e3:8.1f} ms", flush=True)

    x = jnp.ones((256, 1024))

    @jax.jit
    def tick(a):
        return a * 1.0001 + 0.1

    sync(tick(x))
    report("tick roundtrip", timed(lambda: sync(tick(x)), reps=5))

    def fifty():
        z = x
        for _ in range(50):
            z = tick(z)
        sync(z)

    t50 = timed(fifty)
    report("tick x50 (per launch)", t50 / 50)

    params = TVL1Params()
    build = tp._pyramid_fn(BATCH, H, W, params.nscales, params.scale_step,
                           False)
    stacked = jnp.concatenate([i0, i1], axis=0)
    report("pyramid", timed(lambda: sync(build(stacked)[-1])))

    # groups
    shapes = pyramid_shapes(H, W, params.nscales, params.scale_step)
    canvases = tp._assign_canvases(shapes)
    order = list(range(len(shapes) - 1, -1, -1))
    groups = []
    for s in order:
        if groups and groups[-1][0] == canvases[s]:
            groups[-1][1].append(s)
        else:
            groups.append((canvases[s], [s]))
    levels = build(stacked)
    coarsest = shapes[-1]
    u1 = jnp.zeros((BATCH,) + coarsest, jnp.float32)
    u2 = jnp.zeros((BATCH,) + coarsest, jnp.float32)
    for canvas, idxs in groups:
        finest = idxs[-1]
        up_shape = shapes[finest - 1] if finest > 0 else None
        step = tp._group_fn(BATCH, tuple(shapes[s] for s in idxs), up_shape,
                            params, canvas, False, None)
        args = tuple(levels[s] for s in idxs)

        def run(step=step, args=args, u1=u1, u2=u2):
            a, b, _ = step(args, u1, u2)
            sync(a)

        report(f"group {canvas.hp}x{canvas.wp} L{idxs[0]}-{idxs[-1]}",
               timed(run))
        u1, u2, _ = step(args, u1, u2)

    cases = [
        ("full default", params),
        ("full eps=0", dataclasses.replace(params, epsilon=0.0)),
        ("iterations=1", dataclasses.replace(params, iterations=1)),
        ("warps=1", dataclasses.replace(params, warps=1)),
    ]
    for name, p in cases:
        def run(p=p):
            sync(tp.tvl1_flow_batched_pallas(i0, i1, p)[0, 0, 0, 0])

        report(name, timed(run))

    total = dict(rows)["full default"]
    mp = BATCH * H * W / 1e6
    print(f"\nheadline: {mp / total:.2f} MP-pairs/s", flush=True)


if __name__ == "__main__":
    main()

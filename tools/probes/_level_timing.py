import time
import numpy as np
import jax
import jax.numpy as jnp
from optflow_tpu.core.config import TVL1Params
from optflow_tpu.ops.pyramid import pyramid_shapes
from optflow_tpu.ops import tvl1_pallas as tp
from bench import make_pair, DX, DY, BATCH, H, W

params = TVL1Params()
pairs = [make_pair(H, W, DX, DY, seed=i) for i in range(BATCH)]
i0 = jnp.asarray(np.stack([p[0] for p in pairs]))
i1 = jnp.asarray(np.stack([p[1] for p in pairs]))

shapes = pyramid_shapes(H, W, params.nscales, params.scale_step)
build = tp._pyramid_fn(BATCH, H, W, params.nscales, params.scale_step, False)
levels = build(jnp.concatenate([i0, i1], axis=0))
jax.block_until_ready(levels)

# time pyramid build
t0 = time.perf_counter(); levels = build(jnp.concatenate([i0, i1], axis=0)); jax.block_until_ready(levels)
print(f"pyramid: {(time.perf_counter()-t0)*1e3:.1f} ms")

n = BATCH
coarsest = shapes[-1]
u1 = jnp.zeros((n,) + coarsest, jnp.float32)
u2 = jnp.zeros((n,) + coarsest, jnp.float32)
from optflow_tpu.ops.pyramid import resize_bilinear
resize = jax.vmap(resize_bilinear, in_axes=(0, None))
inv = 1.0 / params.scale_step

order = list(range(len(shapes) - 1, -1, -1))
steps = {}
for s in order:
    geo = tp._select_geometry(*shapes[s])
    up = shapes[s - 1] if s > 0 else None
    steps[s] = tp._group_fn(n, (shapes[s],), up, params, geo, False, None)

# warm all
uu1, uu2 = u1, u2
for s in order:
    uu1, uu2 = steps[s](tuple([levels[s]]), uu1, uu2)
jax.block_until_ready((uu1, uu2))

# timed pass with syncs
uu1, uu2 = u1, u2
total = 0.0
for s in order:
    jax.block_until_ready((uu1, uu2))
    t0 = time.perf_counter()
    uu1, uu2 = steps[s](tuple([levels[s]]), uu1, uu2)
    jax.block_until_ready((uu1, uu2))
    dt = time.perf_counter() - t0
    total += dt
    geo = tp._select_geometry(*shapes[s])
    print(f"level {s:2d} {str(shapes[s]):>12s} geo=({geo.hp}x{geo.wp}) {dt*1e3:7.1f} ms")
print(f"levels total: {total*1e3:.1f} ms (sync per level adds tunnel latency)")

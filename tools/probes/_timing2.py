import time
import numpy as np
import jax
import jax.numpy as jnp
from optflow_tpu.core.config import TVL1Params
from optflow_tpu.ops.tvl1 import tvl1_flow_batched
from bench import make_pair, DX, DY, BATCH, H, W

params = TVL1Params()
pairs = [make_pair(H, W, DX, DY, seed=i) for i in range(BATCH)]
i0 = jnp.asarray(np.stack([p[0] for p in pairs]))
i1 = jnp.asarray(np.stack([p[1] for p in pairs]))

flow = tvl1_flow_batched(i0, i1, params); jax.block_until_ready(flow)
for tag in range(3):
    t0 = time.perf_counter()
    flow = tvl1_flow_batched(i0, i1, params)
    jax.block_until_ready(flow)
    print(f"block_until_ready: {(time.perf_counter()-t0)*1e3:7.1f} ms")
for tag in range(3):
    t0 = time.perf_counter()
    flow = tvl1_flow_batched(i0, i1, params)
    _ = float(flow[0,0,0,0])
    print(f"float readback   : {(time.perf_counter()-t0)*1e3:7.1f} ms")
# time a bare scalar readback
x = jnp.ones((8,128)).sum()
jax.block_until_ready(x)
t0 = time.perf_counter(); _ = float(x); print(f"bare float of ready scalar: {(time.perf_counter()-t0)*1e3:.1f} ms")
y = jnp.ones((4,)) 
t0 = time.perf_counter(); _ = float(y.sum()); print(f"tiny compute+readback: {(time.perf_counter()-t0)*1e3:.1f} ms")

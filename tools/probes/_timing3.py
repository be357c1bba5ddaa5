import time
import numpy as np
import jax
import jax.numpy as jnp
from optflow_tpu.core.config import TVL1Params
from optflow_tpu.ops.tvl1 import tvl1_flow_batched
from bench import make_pair, DX, DY, BATCH, H, W

pairs = [make_pair(H, W, DX, DY, seed=i) for i in range(BATCH)]
i0 = jnp.asarray(np.stack([p[0] for p in pairs]))
i1 = jnp.asarray(np.stack([p[1] for p in pairs]))

def t(params, tag):
    flow = tvl1_flow_batched(i0, i1, params)
    _ = float(flow[0,0,0,0])
    ts = []
    for _i in range(3):
        t0 = time.perf_counter()
        flow = tvl1_flow_batched(i0, i1, params)
        _ = float(flow[0,0,0,0])
        ts.append(time.perf_counter() - t0)
    print(f"{tag:34s} {np.median(ts)*1e3:8.1f} ms")

t(TVL1Params(), "defaults (eps exit, 10 lvl)")
t(TVL1Params(epsilon=0.0), "eps=0 fixed 300it, 10 lvl")
t(TVL1Params(nscales=1), "defaults 1 lvl")
t(TVL1Params(nscales=1, epsilon=0.0), "eps=0 1 lvl")
t(TVL1Params(nscales=1, iterations=1, warps=1), "1 lvl 1 warp 1 iter (overhead)")
t(TVL1Params(iterations=1, warps=1), "10 lvl 1 warp 1 iter (overhead)")

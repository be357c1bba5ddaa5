"""Probe the v5e worker's tolerance for many Pallas kernel calls per program.
Usage: python _fault_probe.py <ncalls> <ngeos>"""
import sys
import numpy as np
import jax
import jax.numpy as jnp
from optflow_tpu.core.config import TVL1Params
from optflow_tpu.ops import tvl1_pallas as tp

ncalls, ngeos = int(sys.argv[1]), int(sys.argv[2])
N = 16
shapes = [(256, 1024), (164, 655), (105, 419)][:ngeos]
geos = [tp._select_geometry(*s) for s in shapes]
rng = np.random.default_rng(0)
ros = [jnp.asarray(rng.standard_normal((N, 3, g.hp, g.wp)), jnp.float32) for g in geos]
sts = [jnp.asarray(rng.standard_normal((N, 6, g.hp, g.wp)) * 0.1, jnp.float32) for g in geos]

def fn(ros_in, sts_in):
    out = 0.0
    sts_cur = list(sts_in)
    for i in range(ncalls):
        gi = i % ngeos
        g = geos[gi]
        st2, errs = tp._run_chunk(
            ros_in[gi], sts_cur[gi], jnp.int32(2),
            jnp.int32(shapes[gi][0]), jnp.int32(shapes[gi][1]),
            jnp.float32(-1.0), geo=g, l_t=0.015, theta=0.3, taut=0.8333,
        )
        sts_cur[gi] = st2
        out = out + jnp.sum(errs)
    return out

jfn = jax.jit(fn)
v = float(jfn(ros, sts))
v = float(jfn(ros, sts))
print(f"OK ncalls={ncalls} ngeos={ngeos} v={v:.3e}")

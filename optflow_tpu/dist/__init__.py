from optflow_tpu.dist.mesh import make_pair_mesh
from optflow_tpu.dist.scheduler import PairScheduler
from optflow_tpu.dist.tiled import tiled_tvl1_flow

__all__ = ["make_pair_mesh", "PairScheduler", "tiled_tvl1_flow"]

from optflow_tpu.engine.rois import Roi, get_rois, roi_from_array
from optflow_tpu.engine.pair import solve_rois
from optflow_tpu.engine.runner import run_job

__all__ = ["Roi", "get_rois", "roi_from_array", "solve_rois", "run_job"]

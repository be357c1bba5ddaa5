from optflow_tpu.utils.metrics import StageTimer

__all__ = ["StageTimer"]

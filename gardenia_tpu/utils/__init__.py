from gardenia_tpu.utils.timer import Timer, time_op
from gardenia_tpu.utils.report import report_runtime

__all__ = ["Timer", "time_op", "report_runtime"]

from igdm_tpu.utils.metrics import MetricsLogger
from igdm_tpu.utils.prof import Timer, profile_trace, timed

__all__ = ["MetricsLogger", "Timer", "profile_trace", "timed"]

from igdm_tpu.utils.debug import checked_call, enable_nan_debugging
from igdm_tpu.utils.metrics import MetricsLogger
from igdm_tpu.utils.prof import Timer, profile_trace, summarize_trace, timed
from igdm_tpu.utils.quality import evaluate_samples

__all__ = [
    "MetricsLogger",
    "Timer",
    "profile_trace",
    "summarize_trace",
    "timed",
    "checked_call",
    "enable_nan_debugging",
    "evaluate_samples",
]

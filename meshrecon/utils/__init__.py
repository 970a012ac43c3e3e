from meshrecon.utils.profiling import StageTimer, stage_report, profile_trace
from meshrecon.utils.debug import enable_nan_checks, checked

__all__ = ["StageTimer", "stage_report", "profile_trace", "enable_nan_checks",
           "checked"]

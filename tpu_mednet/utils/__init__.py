from tpu_mednet.utils.metrics_logging import MetricsLogger
from tpu_mednet.utils.misc import LOG_LEVEL_STRINGS, log_level_string_to_int
from tpu_mednet.utils.nifti import load_nifti, save_nifti

__all__ = [
    "MetricsLogger",
    "save_nifti",
    "load_nifti",
    "log_level_string_to_int",
    "LOG_LEVEL_STRINGS",
]

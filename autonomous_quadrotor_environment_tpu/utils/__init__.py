"""Shared utilities: metrics logging, checkpointing, timing."""

from .checkpoint import load_params, save_params
from .memdebug import device_memory_stats, live_array_summary
from .metrics import CSVLogger, JSONLLogger, TRAIN_LOG_HEADER
from .timing import Timer

__all__ = [
    "CSVLogger",
    "JSONLLogger",
    "TRAIN_LOG_HEADER",
    "Timer",
    "device_memory_stats",
    "live_array_summary",
    "load_params",
    "save_params",
]

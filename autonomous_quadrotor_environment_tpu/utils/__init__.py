"""Shared utilities: metrics logging, checkpointing, timing."""

from .checkpoint import load_params, save_params
from .metrics import CSVLogger, JSONLLogger, TRAIN_LOG_HEADER
from .timing import Timer

__all__ = [
    "CSVLogger",
    "JSONLLogger",
    "TRAIN_LOG_HEADER",
    "Timer",
    "load_params",
    "save_params",
]

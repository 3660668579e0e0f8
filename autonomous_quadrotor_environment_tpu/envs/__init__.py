"""Batched environments: hover/position stabilization, sensors, rewards."""

from . import featurizer, hover, rewards, sensors
from .hover import EnvState, StepOut, reset, step, step_autoreset

__all__ = [
    "EnvState",
    "StepOut",
    "featurizer",
    "hover",
    "reset",
    "rewards",
    "sensors",
    "step",
    "step_autoreset",
]

"""Offline experiment analysis (reference SURVEY.md §2 #26-27)."""

from .training_logs import (
    episodes_to_solve,
    flight_hours_to_solve,
    size_sweep_summary,
    training_curves,
)
from .flight_logs import aggregate_pilot_logs

__all__ = [
    "aggregate_pilot_logs",
    "episodes_to_solve",
    "flight_hours_to_solve",
    "size_sweep_summary",
    "training_curves",
]

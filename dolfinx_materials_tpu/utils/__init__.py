"""Utilities: timers, conversions, config."""

from .timers import timer, timing, list_timings, reset_timings  # noqa: F401

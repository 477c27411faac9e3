"""Utilities: stage timing/profiling (SURVEY.md §5 aux subsystems)."""

from .timing import StageTimer, timing_stat  # noqa: F401

"""Utilities: profiling/tracing hooks and misc helpers."""

from tpu_slu.utils.profiling import StepTimer, profile_trace

__all__ = ["StepTimer", "profile_trace"]

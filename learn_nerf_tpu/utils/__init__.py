"""Logging, metrics, and profiling utilities."""

from .logging import MetricLogger
from .profiling import profile_trace

__all__ = ["MetricLogger", "profile_trace"]

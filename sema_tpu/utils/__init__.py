"""Observability: per-stage timing, counters, structured logs, profiling.

The reference has none of this (SURVEY.md §5: no tracing/log crate, only
eprintln warnings); it is a required subsystem of the new framework.
"""

from sema_tpu.utils.metrics import Metrics, null_metrics

__all__ = ["Metrics", "null_metrics"]

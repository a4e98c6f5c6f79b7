"""Headless search engine state (the testable seam under the TUI)."""

from sema_tpu.search.engine import Engine, group_results_by_file

__all__ = ["Engine", "group_results_by_file"]

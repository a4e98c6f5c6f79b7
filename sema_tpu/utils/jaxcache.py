"""Persistent XLA compilation cache.

On tunneled/weak-host TPU setups compilation runs locally and can take
minutes per program; the persistent cache makes every program a
compile-once cost per machine. Enabled by all entry points (CLI, bench,
serve). Set SEMA_TPU_NO_COMP_CACHE=1 to disable.
"""

from __future__ import annotations

import os
from pathlib import Path

_enabled = False


def enable(cache_dir: str | None = None) -> None:
    global _enabled
    if _enabled or os.environ.get("SEMA_TPU_NO_COMP_CACHE"):
        return
    import jax

    path = Path(cache_dir or os.environ.get(
        "SEMA_TPU_COMP_CACHE",
        Path.home() / ".cache" / "sema_tpu" / "xla_cache"))
    path.mkdir(parents=True, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", str(path))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        _enabled = True
    except Exception:  # noqa: BLE001 — older jax: silently skip
        pass

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
    # "0"/"" mean unset, matching SEMA_TPU_NO_AUTOFETCH's convention —
    # a truthy-string check silently disabled the cache for =0
    if _enabled or os.environ.get("SEMA_TPU_NO_COMP_CACHE",
                                  "0") not in ("", "0"):
        return
    import jax

    path = Path(cache_dir or os.environ.get(
        "SEMA_TPU_COMP_CACHE",
        Path.home() / ".cache" / "sema_tpu" / "xla_cache"))
    try:
        # mkdir inside the guard: an unwritable HOME must degrade to
        # no-cache, not crash every entry point over an optional cache
        path.mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", str(path))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        _enabled = True
    except Exception:  # noqa: BLE001 — older jax / RO filesystem: skip
        pass

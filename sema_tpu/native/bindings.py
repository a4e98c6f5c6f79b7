"""ctypes bindings for libsema_native.so (built from /native).

Raises ImportError at import time if the shared library is absent, so that
``from sema_tpu.native import ...`` can be used as a feature probe.
"""

from __future__ import annotations

import ctypes
import json
import os
from pathlib import Path
from typing import List

from sema_tpu.types import Chunk, CrawlerConfig

_CANDIDATES = [
    Path(__file__).resolve().parent / "libsema_native.so",
    Path(__file__).resolve().parents[2] / "native" / "libsema_native.so",
]


def lib_path() -> Path:
    override = os.environ.get("SEMA_TPU_NATIVE_LIB")
    if override:
        return Path(override)
    for p in _CANDIDATES:
        if p.exists():
            return p
    raise ImportError("libsema_native.so not built (run: make -C native)")


_lib = ctypes.CDLL(str(lib_path()))

# All native entry points exchange JSON over a simple C ABI:
#   char* fn(const char* request_json)  — caller frees with sema_free.
# JSON marshalling costs are negligible next to the file I/O these calls
# wrap, and it keeps the ABI robust across compilers.
for name in ("sema_crawl", "sema_chunk_files", "sema_hash_file"):
    fn = getattr(_lib, name)
    fn.argtypes = [ctypes.c_char_p]
    fn.restype = ctypes.c_void_p
_lib.sema_free.argtypes = [ctypes.c_void_p]
_lib.sema_free.restype = None


def _call(name: str, request: dict):
    raw = getattr(_lib, name)(json.dumps(request).encode("utf-8"))
    if not raw:
        raise RuntimeError(f"native {name} returned NULL")
    try:
        payload = ctypes.string_at(raw).decode("utf-8")
    finally:
        _lib.sema_free(raw)
    out = json.loads(payload)
    if "error" in out:
        raise RuntimeError(f"native {name}: {out['error']}")
    return out


def crawl_native(root: str, config: CrawlerConfig) -> List[str]:
    out = _call("sema_crawl", {
        "root": root,
        "max_file_size": config.max_file_size,
        "follow_symlinks": config.follow_symlinks,
        "include_hidden": config.include_hidden,
        "file_extensions": list(config.file_extensions),
        "exclude_patterns": list(config.exclude_patterns),
        "ignore_gitignore": config.ignore_gitignore,
    })
    return out["files"]


def chunk_files_native(files: List[str]) -> List[Chunk]:
    out = _call("sema_chunk_files", {"files": files})
    return [
        Chunk(id=c["id"], file_path=Path(c["file_path"]),
              start_line=c["start_line"], end_line=c["end_line"],
              content=c["content"])
        for c in out["chunks"]
    ]


def hash_file_native(path: str) -> str:
    return _call("sema_hash_file", {"path": path})["hash"]

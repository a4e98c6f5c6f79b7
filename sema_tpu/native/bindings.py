"""ctypes bindings for libsema_native.so (built from /native).

Wire format: every native call returns a malloc'd ``[u64 len][payload]``
buffer freed with ``sema_free``. Payload layouts are documented alongside
each wrapper. Raises ImportError at import time if the library is absent,
so ``from sema_tpu.native import ...`` doubles as a feature probe.
"""

from __future__ import annotations

import ctypes
import os
import struct
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

_lib.sema_free.argtypes = [ctypes.c_void_p]
_lib.sema_free.restype = None
_lib.sema_hash_file.argtypes = [ctypes.c_char_p]
_lib.sema_hash_file.restype = ctypes.c_void_p
_lib.sema_chunk_files.argtypes = [ctypes.c_char_p, ctypes.c_int]
_lib.sema_chunk_files.restype = ctypes.c_void_p
_lib.sema_crawl.argtypes = [
    ctypes.c_char_p, ctypes.c_uint64, ctypes.c_int, ctypes.c_int,
    ctypes.c_int, ctypes.c_char_p, ctypes.c_char_p]
_lib.sema_crawl.restype = ctypes.c_void_p
_lib.sema_text_new.argtypes = []
_lib.sema_text_new.restype = ctypes.c_void_p
_lib.sema_text_free_index.argtypes = [ctypes.c_void_p]
_lib.sema_text_free_index.restype = None
_lib.sema_text_add.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                               ctypes.c_uint64]
_lib.sema_text_add.restype = None
_lib.sema_text_remove_file.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
_lib.sema_text_remove_file.restype = ctypes.c_uint64
_lib.sema_text_num_live.argtypes = [ctypes.c_void_p]
_lib.sema_text_num_live.restype = ctypes.c_uint64
_lib.sema_text_search.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                  ctypes.c_uint32]
_lib.sema_text_search.restype = ctypes.c_void_p
_lib.sema_text_save.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
_lib.sema_text_save.restype = ctypes.c_int
_lib.sema_text_load.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
_lib.sema_text_load.restype = ctypes.c_int
_lib.sema_text_num_docs.argtypes = [ctypes.c_void_p]
_lib.sema_text_num_docs.restype = ctypes.c_uint64
_lib.sema_text_save_segment.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                        ctypes.c_uint64]
_lib.sema_text_save_segment.restype = ctypes.c_int
_lib.sema_text_load_segment.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
_lib.sema_text_load_segment.restype = ctypes.c_int
_lib.sema_text_deleted_ids.argtypes = [ctypes.c_void_p]
_lib.sema_text_deleted_ids.restype = ctypes.c_void_p
_lib.sema_text_set_deleted.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                       ctypes.c_uint64]
_lib.sema_text_set_deleted.restype = None
_lib.sema_text_compact.argtypes = [ctypes.c_void_p]
_lib.sema_text_compact.restype = ctypes.c_uint64


def _take(ptr) -> bytes:
    if not ptr:
        raise RuntimeError("native call returned NULL")
    try:
        (n,) = struct.unpack_from("<Q", ctypes.string_at(ptr, 8))
        return ctypes.string_at(ptr + 8, n)
    finally:
        _lib.sema_free(ptr)


def hash_file_native(path: str) -> str:
    """xxh3-128 unpadded lowercase hex; empty string if unreadable."""
    out = _take(_lib.sema_hash_file(str(path).encode())).decode()
    if not out:
        raise OSError(f"native hash failed for {path}")
    return out


def crawl_native(root: str, config: CrawlerConfig) -> List[str]:
    payload = _take(_lib.sema_crawl(
        str(root).encode(),
        config.max_file_size,
        int(config.follow_symlinks),
        int(config.include_hidden),
        int(config.ignore_gitignore),
        "\n".join(config.file_extensions).encode(),
        "\n".join(config.exclude_patterns).encode()))
    text = payload.decode("utf-8", "surrogateescape")
    return [p for p in text.split("\n") if p]


def chunk_files_native(files: List[str], n_threads: int = 0) -> List[Chunk]:
    """Parallel chunking; payload is
    u32 count then per chunk: str path, u32 ordinal, u64 start, u64 end,
    str content (str = u32 length + utf8 bytes)."""
    payload = _take(_lib.sema_chunk_files(
        "\n".join(str(f) for f in files).encode(), n_threads))
    off = 0

    def u32():
        nonlocal off
        (v,) = struct.unpack_from("<I", payload, off)
        off += 4
        return v

    def u64():
        nonlocal off
        (v,) = struct.unpack_from("<Q", payload, off)
        off += 8
        return v

    def s():
        nonlocal off
        n = u32()
        v = payload[off:off + n]
        off += n
        return v

    count = u32()
    chunks: List[Chunk] = []
    for _ in range(count):
        path = s().decode()
        ordinal = u32()
        start_line = u64()
        end_line = u64()
        content = s().decode()
        chunks.append(Chunk(
            id=f"{path}:{ordinal}", file_path=Path(path),
            start_line=start_line, end_line=end_line, content=content))
    return chunks


class NativeTextIndexHandle:
    """Thin RAII wrapper over the C++ BM25 index handle."""

    def __init__(self):
        self._h = _lib.sema_text_new()

    def __del__(self):
        if getattr(self, "_h", None):
            _lib.sema_text_free_index(self._h)
            self._h = None

    def add(self, docs) -> None:
        """docs: iterable of (id, path, start_line, end_line, content)."""
        docs = list(docs)
        parts = [struct.pack("<I", len(docs))]
        for doc_id, path, start, end, content in docs:
            for s in (doc_id, path):
                b = s.encode("utf-8")
                parts.append(struct.pack("<I", len(b)))
                parts.append(b)
            parts.append(struct.pack("<QQ", start, end))
            b = content.encode("utf-8")
            parts.append(struct.pack("<I", len(b)))
            parts.append(b)
        blob = b"".join(parts)
        _lib.sema_text_add(self._h, blob, len(blob))

    def remove_file(self, path: str) -> int:
        return _lib.sema_text_remove_file(self._h, str(path).encode())

    def num_live(self) -> int:
        return _lib.sema_text_num_live(self._h)

    def search(self, query: str, limit: int):
        payload = _take(_lib.sema_text_search(
            self._h, query.encode("utf-8"), limit))
        off = 0

        def u32():
            nonlocal off
            (v,) = struct.unpack_from("<I", payload, off)
            off += 4
            return v

        def u64():
            nonlocal off
            (v,) = struct.unpack_from("<Q", payload, off)
            off += 8
            return v

        def s():
            nonlocal off
            n = u32()
            v = payload[off:off + n].decode("utf-8")
            off += n
            return v

        out = []
        for _ in range(u32()):
            doc_id, path = s(), s()
            start, end = u64(), u64()
            content = s()
            (score,) = struct.unpack("<d", struct.pack("<Q", u64()))
            out.append((doc_id, path, start, end, content, score))
        return out

    def save(self, path: str) -> None:
        rc = _lib.sema_text_save(self._h, str(path).encode())
        if rc != 0:
            raise OSError(f"native text index save failed ({rc}): {path}")

    def load(self, path: str) -> None:
        rc = _lib.sema_text_load(self._h, str(path).encode())
        if rc != 0:
            raise OSError(f"native text index load failed ({rc}): {path}")

    def num_docs(self) -> int:
        return _lib.sema_text_num_docs(self._h)

    def save_segment(self, path: str, from_doc: int) -> None:
        rc = _lib.sema_text_save_segment(self._h, str(path).encode(),
                                         from_doc)
        if rc != 0:
            raise OSError(f"native segment save failed ({rc}): {path}")

    def load_segment(self, path: str) -> None:
        rc = _lib.sema_text_load_segment(self._h, str(path).encode())
        if rc != 0:
            raise OSError(f"native segment load failed ({rc}): {path}")

    def deleted_ids(self) -> List[int]:
        payload = _take(_lib.sema_text_deleted_ids(self._h))
        (n,) = struct.unpack_from("<Q", payload, 0)
        return list(struct.unpack_from(f"<{n}I", payload, 8))

    def set_deleted(self, ids) -> None:
        ids = list(ids)
        blob = struct.pack("<Q", len(ids)) + struct.pack(
            f"<{len(ids)}I", *ids)
        _lib.sema_text_set_deleted(self._h, blob, len(blob))

    def compact(self) -> int:
        return _lib.sema_text_compact(self._h)

"""Content-change detection hashing.

Parity: the reference hashes file contents with xxh3-128 and formats the
digest as lowercase hex with no zero padding (Rust ``format!("{:x}", u128)``,
src/storage/mod.rs:78,92). Files <= 1 MiB are hashed in one read; larger files
are streamed in 128 KiB blocks (src/storage/mod.rs:72-94) — the digest is
identical either way; the split only bounds memory.
"""

from __future__ import annotations

from pathlib import Path

import xxhash

_STREAM_THRESHOLD = 1_048_576   # 1 MiB (ref storage/mod.rs:75)
_BLOCK = 131_072                # 128 KiB (ref storage/mod.rs:82)


def hash_bytes(data: bytes) -> str:
    """xxh3-128 of ``data`` as unpadded lowercase hex."""
    return format(xxhash.xxh3_128_intdigest(data), "x")


def hash_file(file_path: Path | str) -> str:
    """xxh3-128 of a file's contents, streamed for files > 1 MiB."""
    file_path = Path(file_path)
    size = file_path.stat().st_size
    if size <= _STREAM_THRESHOLD:
        return hash_bytes(file_path.read_bytes())
    h = xxhash.xxh3_128()
    with open(file_path, "rb") as f:
        while True:
            block = f.read(_BLOCK)
            if not block:
                break
            h.update(block)
    return format(h.intdigest(), "x")

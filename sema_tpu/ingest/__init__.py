"""Host-side ingest: chunking and content hashing.

Hot host loops; backed by the C++ native extension when built
(``sema_tpu.native``), with byte-identical pure-Python fallbacks.
"""

from sema_tpu.ingest.chunker import create_chunks, process_files
from sema_tpu.ingest.hashing import hash_bytes, hash_file

__all__ = ["create_chunks", "process_files", "hash_bytes", "hash_file"]

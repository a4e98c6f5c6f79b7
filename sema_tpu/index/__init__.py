"""Index layer: device-resident vector store, BM25 text index, and the
incremental index manager that orchestrates them (≙ reference src/storage/)."""

from sema_tpu.index.vector_store import VectorStore
from sema_tpu.index.text_index import TextIndex
from sema_tpu.index.manager import IndexManager

__all__ = ["VectorStore", "TextIndex", "IndexManager"]

"""Incremental index orchestration (≙ reference ``StorageManager``,
src/storage/mod.rs).

Behavior parity:

- per-file xxh3-128 hash checked against the stored manifest: unchanged →
  skip; changed → remove old chunks from BOTH indexes, then re-index; new →
  index (storage/mod.rs:30-52);
- chunks go to both the vector and text index; a failure in one is warned,
  not fatal (storage/mod.rs:96-110);
- the file hash is recorded only AFTER its chunks are indexed, so a crash
  mid-index retries that file next run (storage/mod.rs:62-66);
- search dispatch: queries starting with ``'`` hit the text index (prefix
  stripped; empty rest → no results), everything else is semantic
  (storage/mod.rs:112-125);
- ``close()`` commits the text index (storage/mod.rs:127-131).

Improvement over the reference: semantic scores are real cosine
similarities instead of the constant 1.0 (storage/mod.rs:123 discards them),
and embedding runs batched on TPU instead of per-chunk on CPU.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path
from typing import Callable, List, Optional, Sequence, Tuple


from sema_tpu.index.text_index import make_text_index
from sema_tpu.index.vector_store import VectorStore
from sema_tpu.ingest.chunker import process_files
from sema_tpu.ingest.hashing import hash_file
from sema_tpu.types import Chunk
from sema_tpu.utils.metrics import Metrics, null_metrics


class IndexManager:
    def __init__(self, data_dir: Path | str, encoder, store_dtype: str = "bfloat16",
                 mesh=None, index_axis: str = "index",
                 slice_axis: Optional[str] = None,
                 metrics: Optional[Metrics] = None, rescore_k: int = 100,
                 hbm_budget_mb: float = 0.0, ivf: bool = False,
                 ivf_nprobe: int = 32, ivf_min_recall: float = 0.0):
        self.encoder = encoder
        self.metrics = metrics or null_metrics()
        self.vector_store = VectorStore(
            data_dir, dim=encoder.spec.dim, model=encoder.spec.name,
            store_dtype=store_dtype, mesh=mesh, index_axis=index_axis,
            slice_axis=slice_axis,
            rescore_k=rescore_k, hbm_budget_mb=hbm_budget_mb, ivf=ivf,
            ivf_nprobe=ivf_nprobe, ivf_min_recall=ivf_min_recall)
        self.text_index = make_text_index(data_dir)

    # -- indexing ------------------------------------------------------------

    def process_and_index_files(
            self, files: Sequence[Path],
            progress: Optional[Callable[[str, int, int], None]] = None,
            purge_missing_under: Optional[Path] = None,
    ) -> int:
        """Index changed/new files; returns number of chunks indexed
        (storage/mod.rs:30-70 returns the same count).

        ``purge_missing_under``: also remove indexed files under that
        root which no longer exist on disk — the reference never purges
        deletions (its global index serves a deleted file's chunks
        forever), which is a bug, not a behavior to keep. Scoped to the
        crawl root because the index is shared across every directory
        the tool has indexed (≙ the reference's config-dir index,
        tui/app.rs:63-70): files of OTHER roots are absent from this
        crawl but not deleted."""
        # (path, check-time hash): the hash recorded after indexing must
        # be the one whose CONTENT was chunked — re-hashing after a
        # minutes-long embed phase would record a mid-run editor save's
        # hash against the old content and mask the staleness forever
        files_to_process: List[tuple] = []
        with self.metrics.timer("hash_check"):
            for f in files:
                f = Path(f)
                if not f.exists():
                    continue
                try:
                    current = hash_file(f)
                except OSError:
                    continue
                stored = self.vector_store.get_file_hash(f)
                if stored == current:
                    continue
                if stored is not None:
                    self.vector_store.remove_file_chunks(f)
                    self.text_index.remove_file_chunks(f)
                files_to_process.append((f, current))

        purged = False
        if purge_missing_under is not None:
            root = str(Path(purge_missing_under))
            sep = root.rstrip("/") + "/"
            for path in list(self.vector_store.file_hashes):
                if not path.startswith(sep):
                    continue
                if Path(path).exists():
                    continue
                self.vector_store.remove_file_chunks(path)
                self.text_index.remove_file_chunks(path)
                self.vector_store.remove_file_hash(path)
                purged = True

        if progress:
            progress("chunking", 0, len(files_to_process))
        with self.metrics.timer("chunk"):
            chunks = process_files([f for f, _ in files_to_process])
        self.metrics.count("chunks", len(chunks))

        if chunks:
            self.index_chunks(chunks, progress=progress)
        if files_to_process or purged:
            # record hashes for EVERY processed file — including ones
            # that yielded zero chunks (e.g. truncated below the 50-byte
            # minimum): gating on the aggregate chunk count made such a
            # file re-detect as changed on every run forever
            with self.metrics.timer("hash_update"):
                for f, h in files_to_process:
                    self.vector_store.update_file_hash(f, h)
                self.vector_store.save_file_hashes()
        return len(chunks)

    # indexing slice size: both indexes are designed around O(batch)
    # commits with amortized tiered merges, and the builders' transient
    # memory (postings maps, position arrays, meta rows, embedding
    # buffers) is proportional to ONE slice, not the corpus. Feeding a
    # million-chunk corpus as a single batch held ~GBs of transients and
    # measured 4.7× slower per doc than the amortized rate on a small
    # host (round-3 1M build: text stage 663 s one-shot); 100M-chunk
    # corpora (BASELINE config 5) would not fit in host RAM at all.
    # Override: SEMA_TPU_INDEX_BATCH.
    INDEX_BATCH = 65_536

    def index_chunks(self, chunks: Sequence[Chunk],
                     progress=None) -> None:
        """Dual-index chunks in bounded slices; failures are warnings
        (storage/mod.rs:96-110). A mid-corpus crash re-indexes the
        affected files next run unchanged: per-file hashes are recorded
        by the caller only after THIS returns (storage/mod.rs:62-66)."""
        import os as _os
        try:
            batch = int(_os.environ.get("SEMA_TPU_INDEX_BATCH",
                                        self.INDEX_BATCH))
        except ValueError:
            batch = self.INDEX_BATCH
        if batch < 1:
            # a non-positive slice would make range() empty and silently
            # index NOTHING while the caller records every hash as done
            batch = self.INDEX_BATCH
        total = len(chunks)
        # encoder capability probe once, not per slice. Encoder-like
        # objects (quality-gate stubs, tools) may not take out_dtype /
        # return_device — probe the signature, don't assume.
        kwargs = {}
        try:
            import inspect
            params = inspect.signature(
                self.encoder.encode_texts).parameters
            if "out_dtype" in params:
                # fetch at the STORE's dtype: the segment write rounds
                # to np_dtype anyway, so casting on device halves the
                # device→host bytes for bf16/int8 stores
                kwargs["out_dtype"] = self.vector_store.np_dtype
            has_return_device = "return_device" in params
        except (TypeError, ValueError):
            has_return_device = False
        for off in range(0, total, batch):
            part = chunks[off:off + batch]
            try:
                with self.metrics.timer("embed"):
                    emb_progress = (
                        (lambda done, _t, off=off:
                         progress("embedding", off + done, total))
                        if progress else None)
                    # serve-time re-index: when the store already holds
                    # a live device copy (it has served searches), keep
                    # the embeddings ON DEVICE — add_chunks' arena-tail
                    # append consumes them directly, skipping the
                    # fetch→re-upload double crossing (the disk copy
                    # still writes from an async host copy before the
                    # manifest commits). Checked per slice: the first
                    # search can land mid-build.
                    if has_return_device and hasattr(
                            self.vector_store, "device_copy_live"):
                        kwargs["return_device"] = \
                            self.vector_store.device_copy_live()
                    embeddings = self.encoder.encode_texts(
                        [c.content for c in part],
                        progress=emb_progress, **kwargs)
                with self.metrics.timer("vector_write"):
                    self.vector_store.add_chunks(part, embeddings)
            except Exception as e:  # noqa: BLE001 — parity: warn, go on
                print("Warning: Failed to index chunks in vector "
                      f"store: {e}", file=sys.stderr)
            try:
                with self.metrics.timer("text_write"):
                    self.text_index.index_chunks(part)
            except Exception as e:  # noqa: BLE001
                print("Warning: Failed to index chunks in text "
                      f"index: {e}", file=sys.stderr)

    # -- search ----------------------------------------------------------------

    def search(self, query: str, limit: int,
               exact: bool = False) -> List[Tuple[Chunk, float]]:
        """Dispatch on the ``'`` prefix (storage/mod.rs:112-125).

        ``exact=True``: per-query recall-contract routing — the vector
        scan bypasses IVF pruning (recall@k 1.0 by construction); no-op
        for text queries and non-IVF stores."""
        query = query.strip()
        if query.startswith("'"):
            stripped = query[1:]
            if not stripped:
                return []
            with self.metrics.timer("text_search"):
                return self.text_index.search(stripped, limit)
        try:
            with self.metrics.timer("embed_query"):
                # device-resident: the embedding feeds the scan without a
                # host round-trip (one fewer fetch per semantic query).
                # Encoder-like objects (quality-gate stubs, tools) may
                # only implement the host-array encode_query — accept
                # either.
                enc = self.encoder
                qvec = (enc.encode_query_device(query)
                        if hasattr(enc, "encode_query_device")
                        else enc.encode_query(query))
            with self.metrics.timer("vector_search"):
                # inside the try: with the embedding left on device, a
                # device-side embed failure only materializes at the
                # scan's fetch — it must hit the same degrade path
                # (review finding, r3)
                return self.vector_store.search(qvec, limit, exact=exact)
        except Exception as e:  # noqa: BLE001 — parity: degrade, don't fail
            # embed-failure fallback: the reference degrades a failed query
            # embedding to a substring scan (lance_indexer.rs:143-148)
            print(f"Warning: semantic query failed ({e}); falling back "
                  "to substring scan", file=sys.stderr)
            with self.metrics.timer("fallback_search"):
                return self.vector_store.substring_scan(query, limit)

    def close(self) -> None:
        self.text_index.close()
        self.vector_store.close()

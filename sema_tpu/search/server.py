"""Concurrent query batching (BASELINE config 5: 1024 concurrent queries).

The reference serves exactly one query at a time from its TUI thread
(tui/engine.rs:102). A TPU scan is throughput-oriented: one (Q, N) matmul
pass costs barely more than a (1, N) pass, so concurrent callers should
ride the same device dispatch. ``QueryBatcher`` coalesces requests from any
number of threads into fixed-size device batches:

- callers block on a per-request event; a single dispatcher thread drains
  the queue, pads the query batch to a static shape (one compiled
  executable), runs the scan, and distributes results;
- batches close either when ``max_batch`` queries are waiting or after
  ``max_wait_ms`` — the usual latency/throughput knob;
- keyword ('-prefixed) queries bypass the batcher (host-side BM25).
"""

from __future__ import annotations

import queue
import threading
from dataclasses import dataclass, field
from typing import List, Optional, Tuple

import numpy as np


@dataclass
class _Request:
    query_vec: np.ndarray
    k: int
    event: threading.Event = field(default_factory=threading.Event)
    # raw (scores, ids) row — chunk metadata materializes in the CALLER
    # thread so the dispatcher's next device batch isn't stalled behind
    # host-side pread/json work (k × max_batch rows per batch otherwise)
    raw: Optional[Tuple[np.ndarray, np.ndarray]] = None
    error: Optional[Exception] = None


class QueryBatcher:
    def __init__(self, vector_store, max_batch: int = 64,
                 max_wait_ms: float = 2.0):
        self.store = vector_store
        self.max_batch = max_batch
        self.max_wait = max_wait_ms / 1e3
        self._queue: "queue.Queue[_Request]" = queue.Queue()
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    # -- caller side -----------------------------------------------------------

    def search(self, query_vec: np.ndarray, k: int,
               timeout: Optional[float] = 60.0):
        req = _Request(np.asarray(query_vec, dtype=np.float32), k)
        self._queue.put(req)
        if not req.event.wait(timeout):
            raise TimeoutError("query batch timed out")
        if req.error is not None:
            raise req.error
        scores, ids = req.raw
        out: List[Tuple[object, float]] = []
        for s, rid in zip(scores, ids):
            if not np.isfinite(s):
                continue
            out.append((self.store.chunk_at(int(rid)), float(s)))
            if len(out) >= k:
                break
        return out

    def close(self) -> None:
        self._stop.set()
        self._thread.join(timeout=5)

    # -- dispatcher -------------------------------------------------------------

    def _drain_batch(self) -> List[_Request]:
        batch: List[_Request] = []
        try:
            batch.append(self._queue.get(timeout=0.1))
        except queue.Empty:
            return batch
        deadline = self.max_wait
        while len(batch) < self.max_batch:
            try:
                batch.append(self._queue.get(timeout=deadline))
            except queue.Empty:
                break
        return batch

    def _loop(self) -> None:
        while not self._stop.is_set():
            batch = self._drain_batch()
            if not batch:
                continue
            try:
                k_max = max(r.k for r in batch)
                dim = batch[0].query_vec.shape[0]
                # pad to the fixed compiled batch shape
                q = np.zeros((self.max_batch, dim), dtype=np.float32)
                for i, r in enumerate(batch):
                    q[i] = r.query_vec
                scores, ids = self.store.search_batch(q, k_max)
                for i, r in enumerate(batch):
                    r.raw = (scores[i], ids[i])
                    r.event.set()
            except Exception as e:  # noqa: BLE001 — deliver to callers
                for r in batch:
                    if not r.event.is_set():
                        r.error = e
                        r.event.set()

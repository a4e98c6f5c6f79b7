"""Concurrent query batching (BASELINE config 5: 1024 concurrent queries).

The reference serves exactly one query at a time from its TUI thread
(tui/engine.rs:102). A TPU scan is throughput-oriented: one (Q, N) matmul
pass costs barely more than a (1, N) pass, so concurrent callers should
ride the same device dispatch. ``QueryBatcher`` coalesces requests from any
number of threads into fixed-size device batches:

- callers block on a per-request event; a DISPATCH thread drains the
  queue, pads the query batch to a static shape (one compiled
  executable) and enqueues the device work WITHOUT waiting for it
  (``search_batch_async``); a COMPLETION thread fetches results
  (``search_batch_finish``) and wakes callers. The two-stage pipeline
  overlaps batch t+1's dispatch with batch t's device time and tunnel
  round-trip — on tunneled hosts the round-trip (~27 ms + trickling
  result transfer) dominated the serving batch p50 (round-3 profiling:
  docs/PERF.md serving breakdown);
- batches close either when ``max_batch`` queries are waiting or after
  ``max_wait_ms`` — the usual latency/throughput knob;
- OVERLOAD DEGRADES FAST, not with 60 s client timeouts: the request
  queue is bounded (``max_queue``, default 16×max_batch) and
  ``search`` raises :class:`ServerOverloaded` immediately when it is
  full; requests that waited longer than ``deadline_ms`` in the queue
  are failed with ServerOverloaded *without* being scanned (the HTTP
  layer maps this to 503 + Retry-After);
- per-stage timings (queue wait, dispatch, device+fetch, distribute)
  accumulate in a ring buffer exposed by :meth:`stats` — the serving
  breakdown is measurable in production, not just in the load test;
- keyword ('-prefixed) queries bypass the batcher (host-side BM25).
"""

from __future__ import annotations

import queue
import threading
import time
from collections import deque
from dataclasses import dataclass, field
from typing import List, Optional, Tuple

import numpy as np


class ServerOverloaded(RuntimeError):
    """Queue full or queue-wait deadline exceeded — shed load now."""


@dataclass
class _Request:
    query_vec: np.ndarray
    k: int
    t_enq: float
    # recall-contract routing (docs/API.md): True bypasses IVF pruning
    # for this request. The dispatcher PARTITIONS each drained batch by
    # this flag — exact and pruned requests never share a device batch,
    # so one exact caller cannot silently drag a whole IVF batch to the
    # exact scan's cost (6-7× at 1M rows)
    exact: bool = False
    event: threading.Event = field(default_factory=threading.Event)
    # raw (scores, ids) row — chunk metadata materializes in the CALLER
    # thread so the dispatcher's next device batch isn't stalled behind
    # host-side pread/json work (k × max_batch rows per batch otherwise)
    raw: Optional[Tuple[np.ndarray, np.ndarray]] = None
    error: Optional[Exception] = None


class QueryBatcher:
    def __init__(self, vector_store, max_batch: int = 64,
                 max_wait_ms: float = 2.0,
                 max_queue: Optional[int] = None,
                 deadline_ms: Optional[float] = None,
                 stats_window: int = 512):
        self.store = vector_store
        self.max_batch = max_batch
        self.max_wait = max_wait_ms / 1e3
        # `is not None`, not truthiness: deadline_ms=0 means "expire
        # anything that waited at all", and max_queue=0 would mean an
        # UNBOUNDED stdlib queue — silently disabling the documented
        # load shedding (review finding, r3)
        self.deadline = (deadline_ms / 1e3) if deadline_ms is not None \
            else None
        if max_queue is not None and max_queue <= 0:
            raise ValueError(
                "max_queue must be positive (queue.Queue treats 0 as "
                "unbounded, which disables overload shedding)")
        self._queue: "queue.Queue[_Request]" = queue.Queue(
            maxsize=max_queue if max_queue is not None else 16 * max_batch)
        # depth 2: one batch in flight on device while the next one is
        # drained/padded/dispatched; deeper pipelines only add queue wait
        self._inflight: "queue.Queue[tuple]" = queue.Queue(maxsize=2)
        self._stats = deque(maxlen=stats_window)
        self._stop = threading.Event()
        self._dispatch_thread = threading.Thread(target=self._dispatch_loop,
                                                 daemon=True)
        self._complete_thread = threading.Thread(target=self._complete_loop,
                                                 daemon=True)
        self._dispatch_thread.start()
        self._complete_thread.start()

    # -- caller side -----------------------------------------------------------

    def search(self, query_vec: np.ndarray, k: int,
               timeout: Optional[float] = 60.0, exact: bool = False):
        # validate at enqueue time: a malformed vector must fail ITS
        # caller, not blow up inside the dispatcher where the exception
        # would be delivered to every request in the batch
        query_vec = np.asarray(query_vec, dtype=np.float32).reshape(-1)
        dim = getattr(self.store, "dim", None)
        if dim is not None and query_vec.shape != (dim,):
            raise ValueError(
                f"query vector has {query_vec.shape[0]} elements, "
                f"store dim is {dim}")
        if self._stop.is_set():
            raise ServerOverloaded("batcher closed")
        req = _Request(query_vec, k, time.perf_counter(), exact=exact)
        try:
            self._queue.put_nowait(req)
        except queue.Full:
            raise ServerOverloaded(
                f"request queue full ({self._queue.maxsize})") from None
        # close() may have drained the queue between our put and its
        # final sweep — a request enqueued into a stopped batcher would
        # otherwise ride out the full client timeout (review finding, r3)
        if self._stop.is_set() and not req.event.is_set():
            req.error = ServerOverloaded("batcher closed")
            req.event.set()
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

    def stats(self) -> dict:
        """Per-stage p50/p99 over the last ``stats_window`` batches (ms)."""
        recs = list(self._stats)
        if not recs:
            return {"batches": 0}
        arr = np.asarray(recs)  # columns: size, wait, dispatch, device, dist

        def pct(col, p):
            return round(float(np.percentile(arr[:, col], p)) * 1e3, 2)

        return {
            "batches": len(recs),
            "batch_size_mean": round(float(arr[:, 0].mean()), 1),
            "queue_wait_p50_ms": pct(1, 50),
            "queue_wait_p99_ms": pct(1, 99),
            "dispatch_p50_ms": pct(2, 50),
            "device_fetch_p50_ms": pct(3, 50),
            "device_fetch_p99_ms": pct(3, 99),
            "distribute_p50_ms": pct(4, 50),
        }

    def close(self) -> None:
        self._stop.set()
        self._dispatch_thread.join(timeout=5)
        self._complete_thread.join(timeout=5)
        # fail requests still sitting in the queue (never dispatched):
        # their callers are blocked on events nobody will set, and would
        # otherwise ride out the full client timeout
        while True:
            try:
                req = self._queue.get_nowait()
            except queue.Empty:
                break
            if not req.event.is_set():
                req.error = ServerOverloaded("batcher closed")
                req.event.set()
        # ... and batches stranded in _inflight: the completion loop's
        # exit check (stop set ∧ inflight empty) can interleave with a
        # concurrent dispatcher put — the put lands just after the
        # empty() observation and nobody consumes it (review finding,
        # r3). Both workers are joined (or stuck) by now, so failing
        # these callers here is safe either way.
        while True:
            try:
                batch = self._inflight.get_nowait()[0]
            except queue.Empty:
                break
            for r in batch:
                if not r.event.is_set():
                    r.error = ServerOverloaded("batcher closed")
                    r.event.set()

    # -- dispatch stage ----------------------------------------------------------

    def _drain_batch(self) -> List[_Request]:
        batch: List[_Request] = []
        try:
            batch.append(self._queue.get(timeout=0.1))
        except queue.Empty:
            return batch
        # the batch closes max_wait after its FIRST request: each get's
        # timeout is the remaining window, not a fresh one — re-arming
        # per request would stretch the documented max_wait_ms deadline
        # to max_batch×max_wait under a steady just-slower trickle
        t_close = time.perf_counter() + self.max_wait
        while len(batch) < self.max_batch:
            remaining = t_close - time.perf_counter()
            if remaining <= 0:
                break
            try:
                batch.append(self._queue.get(timeout=remaining))
            except queue.Empty:
                break
        return batch

    def _expire(self, batch: List[_Request], now: float) -> List[_Request]:
        """Fail queue-expired requests without scanning them: under
        overload the client gets a fast 503 instead of a 60 s timeout,
        and the device batch is spent on requests that still have a
        waiting caller."""
        if self.deadline is None:
            return batch
        live = []
        for r in batch:
            if now - r.t_enq > self.deadline:
                r.error = ServerOverloaded(
                    f"queued {1e3 * (now - r.t_enq):.0f} ms "
                    f"> deadline {1e3 * self.deadline:.0f} ms")
                r.event.set()
            else:
                live.append(r)
        return live

    def _dispatch_loop(self) -> None:
        while not self._stop.is_set():
            batch = self._drain_batch()
            if not batch:
                continue
            t0 = time.perf_counter()
            batch = self._expire(batch, t0)
            if not batch:
                continue
            # recall-contract partition: exact requests dispatch as their
            # own device batch (usually absent or rare — the common case
            # is one group and zero extra work). Both groups pad to the
            # same compiled shape, so no new executables are compiled.
            groups = [[r for r in batch if not r.exact],
                      [r for r in batch if r.exact]]
            for gi, group in enumerate(groups):
                if not group:
                    continue
                self._dispatch_group(group, exact=bool(gi), t0=t0)

    def _dispatch_group(self, batch: List[_Request], exact: bool,
                        t0: float) -> None:
        try:
            k_max = max(r.k for r in batch)
            dim = batch[0].query_vec.shape[0]
            # pad to the fixed compiled batch shape
            q = np.zeros((self.max_batch, dim), dtype=np.float32)
            for i, r in enumerate(batch):
                q[i] = r.query_vec
            # live= keeps the host merge (and int8 rescore preads)
            # off the zero-padded phantom rows of underfilled batches
            handle = self.store.search_batch_async(
                q, k_max, live=len(batch), exact=exact)
            t1 = time.perf_counter()
            # blocks when 2 batches are already in flight — the
            # natural backpressure that keeps device queueing bounded.
            # Bounded put: on shutdown the completion thread stops
            # consuming, and an unbounded put would strand this
            # thread (and this batch's callers) forever
            while not self._stop.is_set():
                try:
                    self._inflight.put((batch, handle, q, t0, t1),
                                       timeout=0.2)
                    break
                except queue.Full:
                    continue
            else:
                raise RuntimeError("batcher shut down")
        except Exception as e:  # noqa: BLE001 — deliver to callers
            for r in batch:
                if not r.event.is_set():
                    r.error = e
                    r.event.set()

    # -- completion stage --------------------------------------------------------

    def _complete_loop(self) -> None:
        # keeps draining after stop until _inflight is empty: dispatched
        # batches have callers blocked on their events — stranding them
        # at shutdown means 60 s client timeouts (review finding, r3)
        while not self._stop.is_set() or not self._inflight.empty():
            try:
                batch, handle, q, t0, t1 = self._inflight.get(timeout=0.1)
            except queue.Empty:
                continue
            try:
                scores, ids = self.store.search_batch_finish(handle, q)
                t2 = time.perf_counter()
                for i, r in enumerate(batch):
                    r.raw = (scores[i], ids[i])
                    r.event.set()
                t3 = time.perf_counter()
                wait = t0 - min(r.t_enq for r in batch)
                self._stats.append(
                    (len(batch), wait, t1 - t0, t2 - t1, t3 - t2))
            except Exception as e:  # noqa: BLE001 — deliver to callers
                for r in batch:
                    if not r.event.is_set():
                        r.error = e
                        r.event.set()

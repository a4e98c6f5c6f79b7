"""Concurrent query batching over the vector store."""

import threading

import numpy as np
import pytest

from sema_tpu.search.server import QueryBatcher
from tests.test_vector_store import chunks_and_vecs, make_store


@pytest.fixture()
def store(tmp_path):
    s = make_store(tmp_path)
    cs, vecs = chunks_and_vecs(300)
    s.add_chunks(cs, vecs)
    s._test_vecs = vecs
    return s


def test_single_query(store):
    b = QueryBatcher(store, max_batch=8)
    try:
        res = b.search(store._test_vecs[42], k=3)
        assert res[0][0].id == "f.txt:42"
        assert len(res) == 3
    finally:
        b.close()


def test_many_concurrent_queries(store):
    b = QueryBatcher(store, max_batch=16, max_wait_ms=5)
    results = {}
    errors = []

    def worker(i):
        try:
            results[i] = b.search(store._test_vecs[i], k=1)
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(64)]
    try:
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=30)
        assert not errors
        assert len(results) == 64
        for i, res in results.items():
            assert res[0][0].id == f"f.txt:{i}"
    finally:
        b.close()


def test_mixed_k(store):
    b = QueryBatcher(store, max_batch=4, max_wait_ms=5)
    try:
        r1 = b.search(store._test_vecs[0], k=1)
        r5 = b.search(store._test_vecs[1], k=5)
        assert len(r1) == 1 and len(r5) == 5
    finally:
        b.close()


def test_error_propagates(store):
    b = QueryBatcher(store, max_batch=4)
    try:
        with pytest.raises(Exception):
            b.search(np.zeros(999, dtype=np.float32), k=1)  # wrong dim
    finally:
        b.close()


def test_streaming_reindex_while_serving(store):
    """Concurrent appends + tombstones while queries are in flight
    (BASELINE config 5: streaming re-index under load)."""
    import numpy as np
    from pathlib import Path
    from tests.test_vector_store import chunks_and_vecs

    b = QueryBatcher(store, max_batch=8, max_wait_ms=2)
    stop = threading.Event()
    errors = []

    def mutate():
        # alternate embedding placements: the serve-time fast path hands
        # add_chunks an EncodedBatch pair (device rows consumed by the
        # arena under the SAME lock the concurrent searches contend on)
        import jax.numpy as jnp
        from sema_tpu.models.encoder import EncodedBatch
        i = 0
        while not stop.is_set():
            cs, vecs = chunks_and_vecs(20, path=f"new{i}.txt", seed=100 + i)
            if i % 2:
                store.add_chunks(cs, EncodedBatch(
                    vecs, jnp.asarray(vecs, dtype=jnp.bfloat16)))
            else:
                store.add_chunks(cs, vecs)
            store.remove_file_chunks(Path(f"new{i - 1}.txt"))
            i += 1

    def query(worker):
        try:
            for j in range(10):
                res = b.search(store._test_vecs[(worker * 10 + j) % 300], k=1)
                assert res, "no results under streaming mutation"
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    mut = threading.Thread(target=mutate)
    workers = [threading.Thread(target=query, args=(w,)) for w in range(4)]
    mut.start()
    try:
        for t in workers:
            t.start()
        for t in workers:
            t.join(timeout=60)
    finally:
        stop.set()
        mut.join(timeout=10)
        b.close()
    assert not errors, errors


def test_overload_sheds_with_503_class_error(store):
    """A full request queue fails FAST with ServerOverloaded (→ HTTP
    503) instead of queueing toward a 60 s client timeout."""
    from sema_tpu.search.server import ServerOverloaded

    class SlowStore:
        def __init__(self, inner):
            self._inner = inner

        def __getattr__(self, name):
            return getattr(self._inner, name)

        def search_batch_async(self, q, k, **kw):
            import time
            time.sleep(0.2)
            return self._inner.search_batch_async(q, k)

    b = QueryBatcher(SlowStore(store), max_batch=1, max_wait_ms=0.1,
                     max_queue=2)
    try:
        errors = []
        done = []

        def worker(i):
            try:
                done.append(b.search(store._test_vecs[i], k=1, timeout=30))
            except ServerOverloaded:
                errors.append(i)

        threads = [threading.Thread(target=worker, args=(i,))
                   for i in range(12)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=60)
        assert errors, "overload must shed some requests"
        assert done, "non-shed requests must still answer"
    finally:
        b.close()


def test_queue_deadline_fails_stale_requests(store):
    """Requests that waited past deadline_ms are failed without being
    scanned — overload degrades instead of serving dead clients."""
    from sema_tpu.search.server import ServerOverloaded, _Request
    import time as _time

    b = QueryBatcher(store, max_batch=4, deadline_ms=500.0)
    try:
        # enqueue a pre-expired request directly (deterministic)
        req = _Request(np.asarray(store._test_vecs[0], dtype=np.float32),
                       1, _time.perf_counter() - 10.0)
        b._queue.put(req)
        assert req.event.wait(10)
        assert isinstance(req.error, ServerOverloaded)
        # fresh requests still answer fine
        res = b.search(store._test_vecs[5], k=1, timeout=30)
        assert res[0][0].id == "f.txt:5"
        assert b.stats()["batches"] >= 1
    finally:
        b.close()


def test_close_fails_undispatched_requests(store):
    """Requests still queued when the batcher shuts down are failed with
    ServerOverloaded instead of stranding their callers until the client
    timeout."""
    from sema_tpu.search.server import ServerOverloaded, _Request
    import time as _time

    b = QueryBatcher(store, max_batch=4)
    b._stop.set()                      # dispatch loop exits
    b._dispatch_thread.join(timeout=5)
    req = _Request(np.asarray(store._test_vecs[0], dtype=np.float32),
                   1, _time.perf_counter())
    b._queue.put_nowait(req)
    b.close()
    assert req.event.is_set()
    assert isinstance(req.error, ServerOverloaded)


def test_batch_closes_at_max_wait_under_trickle(store):
    """The batch-close deadline is max_wait after the FIRST request —
    a steady trickle must not re-arm it indefinitely."""
    import time as _time

    b = QueryBatcher(store, max_batch=64, max_wait_ms=30.0)
    try:
        t0 = _time.perf_counter()
        res = b.search(store._test_vecs[3], k=1, timeout=30)
        dt = _time.perf_counter() - t0
        assert res[0][0].id == "f.txt:3"
        # one lone request: answered ~max_wait after enqueue, not after
        # max_batch×max_wait (1.92 s); generous bound for slow CI hosts
        assert dt < 1.5
    finally:
        b.close()

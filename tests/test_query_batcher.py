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
        i = 0
        while not stop.is_set():
            cs, vecs = chunks_and_vecs(20, path=f"new{i}.txt", seed=100 + i)
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

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

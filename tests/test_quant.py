"""Int8 quantized scan + full-precision rescore (BASELINE config 4)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sema_tpu.index.vector_store import VectorStore
from sema_tpu.ops.quant import (int8_topk_scores, quantize_query,
                                quantize_rows, rescore_exact)
from sema_tpu.parallel import make_mesh
from tests.test_vector_store import chunks_and_vecs


def _data(n=2048, d=64, q=4, seed=0):
    rng = np.random.default_rng(seed)
    store = rng.standard_normal((n, d)).astype(np.float32)
    store /= np.linalg.norm(store, axis=1, keepdims=True)
    queries = rng.standard_normal((q, d)).astype(np.float32)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)
    return store, queries


def test_quantize_roundtrip_error_bounded():
    x, _ = _data(256)
    q, s = quantize_rows(x)
    assert q.dtype == np.int8 and s.dtype == np.float32
    recon = q.astype(np.float32) * s[:, None]
    assert np.max(np.abs(recon - x)) <= np.max(s) * 0.5 + 1e-7


def test_quantize_zero_row_safe():
    x = np.zeros((3, 8), dtype=np.float32)
    q, s = quantize_rows(x)
    assert np.all(q == 0) and np.all(s == 0)


def test_quantize_query_matches_rows():
    _, queries = _data()
    qi, qs = quantize_query(jnp.asarray(queries))
    ref_q, ref_s = quantize_rows(queries)
    np.testing.assert_allclose(np.asarray(qs), ref_s, atol=1e-7)
    # rounding mode: jnp.round is banker's, np.rint also banker's
    np.testing.assert_array_equal(np.asarray(qi), ref_q)


def test_int8_scan_candidates_cover_true_topk():
    """The int8 scan's rescore_k=100 candidates must contain the true
    top-10 (the whole design premise)."""
    store, queries = _data(n=4096)
    valid = np.ones(4096, bool)
    q8, s8 = quantize_rows(store)
    scores, idx = int8_topk_scores(
        jnp.asarray(q8), jnp.asarray(s8), jnp.asarray(queries),
        jnp.asarray(valid), k=100, group=128)
    true = np.argsort(-(queries @ store.T), axis=1)[:, :10]
    idx = np.asarray(idx)
    for qi in range(queries.shape[0]):
        assert set(true[qi]) <= set(idx[qi]), "true top-10 not in candidates"


def test_rescore_exact_restores_order():
    store, queries = _data(n=512)
    cand_ids = np.arange(512)
    s, ids = rescore_exact(store, queries[0], cand_ids, k=10)
    true = np.argsort(-(store @ queries[0]))[:10]
    np.testing.assert_array_equal(ids, true)
    assert np.all(np.diff(s) <= 0)


def test_int8_store_end_to_end(tmp_path):
    store = VectorStore(tmp_path, dim=32, model="test-tiny",
                        store_dtype="int8", rescore_k=50)
    cs, vecs = chunks_and_vecs(300)
    store.add_chunks(cs, vecs)
    results = store.search(vecs[123], k=10)
    assert results[0][0].id == "f.txt:123"
    assert results[0][1] == pytest.approx(1.0, abs=1e-2)
    # rescored scores are full precision (descending, finite)
    scores = [s for _, s in results]
    assert scores == sorted(scores, reverse=True)


def test_int8_store_recall_vs_bf16(tmp_path):
    cs, vecs = chunks_and_vecs(1000, d=64)
    s_int8 = VectorStore(tmp_path / "a", dim=64, model="m",
                         store_dtype="int8", rescore_k=100)
    s_bf16 = VectorStore(tmp_path / "b", dim=64, model="m")
    s_int8.add_chunks(cs, vecs)
    s_bf16.add_chunks(cs, vecs)
    rng = np.random.default_rng(7)
    recalls = []
    for _ in range(5):
        q = rng.standard_normal(64).astype(np.float32)
        q /= np.linalg.norm(q)
        a = {c.id for c, _ in s_int8.search(q, 10)}
        b = {c.id for c, _ in s_bf16.search(q, 10)}
        recalls.append(len(a & b) / 10)
    assert np.mean(recalls) >= 0.9  # int8+rescore ≈ exact


def test_int8_persistence_keeps_full_precision(tmp_path):
    store = VectorStore(tmp_path, dim=32, model="m", store_dtype="int8")
    cs, vecs = chunks_and_vecs(100)
    store.add_chunks(cs, vecs)
    store.close()
    store2 = VectorStore(tmp_path, dim=32, model="m", store_dtype="int8")
    # originals preserved on disk at bf16 precision for rescore
    row = store2.rows_at(np.array([42]))[0]
    np.testing.assert_allclose(row, vecs[42], atol=1e-2)


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
def test_int8_mesh_sharded(tmp_path):
    mesh = make_mesh()
    store = VectorStore(tmp_path, dim=32, model="m", store_dtype="int8",
                        mesh=mesh, rescore_k=50)
    cs, vecs = chunks_and_vecs(600)
    store.add_chunks(cs, vecs)
    results = store.search(vecs[321], k=5)
    assert results[0][0].id == "f.txt:321"


def test_device_bucket_quantization_matches_host_oracle(tmp_path):
    """The int8 bucket build quantizes ON DEVICE (_quantize_rows_device);
    its output must match the host oracle quantize_rows applied to the
    persisted bf16 rows to within 1 quantum — XLA may lower the division
    as a reciprocal multiply, flipping rare round-half boundaries."""
    chunks, vecs = chunks_and_vecs(300, d=64, seed=9)
    vs = VectorStore(tmp_path, dim=64, model="m", store_dtype="int8")
    vs.add_chunks(chunks, vecs)
    buckets = vs.device_buckets()
    assert len(buckets) == 1
    qd, sd = buckets[0]["store"]
    rows = buckets[0]["rows"]
    host_rows = np.asarray(vs.segments[0].vectors, dtype=np.float32)
    q_ref, s_ref = quantize_rows(host_rows)
    _assert_quant_close(np.asarray(qd)[:rows], q_ref,
                        np.asarray(sd)[:rows], s_ref)
    vs.close()


def _assert_quant_close(q, q_ref, s, s_ref):
    np.testing.assert_allclose(s, s_ref, rtol=1e-6)
    diff = np.abs(q.astype(np.int32) - q_ref.astype(np.int32))
    assert diff.max() <= 1
    assert (diff > 0).mean() < 1e-3   # only rare rounding-boundary flips


def test_device_arena_append_quantization_matches_oracle(tmp_path):
    """Arena-tail int8 appends quantize the appended rows on device; the
    extended bucket must equal the oracle over both segments."""
    c1, v1 = chunks_and_vecs(200, d=64, seed=1)
    c2, v2 = chunks_and_vecs(100, d=64, seed=2)
    for c in c2:
        c.file_path = c.file_path.with_name("other_" + c.file_path.name)
    vs = VectorStore(tmp_path, dim=64, model="m", store_dtype="int8")
    vs.add_chunks(c1, v1)
    vs.device_buckets()            # build the unsealed tail bucket
    vs.add_chunks(c2, v2)
    buckets = vs.device_buckets()  # arena-extend on device
    assert len(buckets) == 1
    qd, sd = buckets[0]["store"]
    rows = buckets[0]["rows"]
    host_rows = np.concatenate([
        np.asarray(s.vectors, dtype=np.float32) for s in vs.segments])
    q_ref, s_ref = quantize_rows(host_rows)
    _assert_quant_close(np.asarray(qd)[:rows], q_ref,
                        np.asarray(sd)[:rows], s_ref)
    vs.close()

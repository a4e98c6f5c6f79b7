"""Exact top-k scan: NumPy-oracle recall, masking, and the 8-device
shard_map merge (SURVEY.md §4 device tests)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sema_tpu.ops.topk import batched_topk_scores, exact_topk
from sema_tpu.parallel import make_mesh, sharded_topk


def _data(n=1000, d=64, q=4, seed=0):
    rng = np.random.default_rng(seed)
    store = rng.standard_normal((n, d)).astype(np.float32)
    store /= np.linalg.norm(store, axis=1, keepdims=True)
    queries = rng.standard_normal((q, d)).astype(np.float32)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)
    return store, queries


def _oracle(store, queries, valid, k):
    scores = queries @ store.T
    scores[:, ~valid] = -np.inf
    idx = np.argsort(-scores, axis=1, kind="stable")[:, :k]
    return np.take_along_axis(scores, idx, axis=1), idx


def test_exact_topk_recall_is_one():
    store, queries = _data()
    valid = np.ones(1000, dtype=bool)
    k = 10
    scores, idx = batched_topk_scores(
        jnp.asarray(store), jnp.asarray(queries), jnp.asarray(valid), k)
    ref_scores, ref_idx = _oracle(store, queries, valid, k)
    # exact scan ⇒ identical candidate sets (indices may tie-swap)
    for i in range(queries.shape[0]):
        assert set(np.asarray(idx)[i].tolist()) == set(ref_idx[i].tolist())
    np.testing.assert_allclose(np.asarray(scores), ref_scores, atol=1e-5)


def test_single_query_wrapper():
    store, queries = _data(q=1)
    valid = np.ones(1000, dtype=bool)
    s, i = exact_topk(jnp.asarray(store), jnp.asarray(queries[0]),
                      jnp.asarray(valid), 5)
    assert s.shape == (5,) and i.shape == (5,)
    assert np.all(np.diff(np.asarray(s)) <= 1e-6)  # descending


def test_masked_rows_excluded():
    store, queries = _data(n=100)
    valid = np.ones(100, dtype=bool)
    # make row 7 the best possible match for query 0, then tombstone it
    store[7] = queries[0]
    valid[7] = False
    scores, idx = batched_topk_scores(
        jnp.asarray(store), jnp.asarray(queries), jnp.asarray(valid), 10)
    assert 7 not in np.asarray(idx)[0].tolist()


def test_bf16_store_close_to_f32():
    store, queries = _data(n=512)
    valid = np.ones(512, dtype=bool)
    s32, i32 = batched_topk_scores(
        jnp.asarray(store), jnp.asarray(queries), jnp.asarray(valid), 10)
    sbf, ibf = batched_topk_scores(
        jnp.asarray(store, dtype=jnp.bfloat16), jnp.asarray(queries),
        jnp.asarray(valid), 10)
    # bf16 rounding may swap near-ties but scores agree to bf16 eps
    np.testing.assert_allclose(np.asarray(sbf), np.asarray(s32),
                               atol=2e-2)


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
class TestShardedTopk:
    def test_matches_oracle(self):
        mesh = make_mesh()  # (1, 8) data × index
        store, queries = _data(n=1024, q=3)
        valid = np.ones(1024, dtype=bool)
        valid[::5] = False  # scattered tombstones across shards
        k = 10
        scores, idx = sharded_topk(
            mesh, jnp.asarray(store), jnp.asarray(queries),
            jnp.asarray(valid), k)
        ref_scores, ref_idx = _oracle(store, queries, valid, k)
        for i in range(3):
            assert set(np.asarray(idx)[i].tolist()) == set(ref_idx[i].tolist())
        np.testing.assert_allclose(np.asarray(scores), ref_scores, atol=1e-5)

    def test_global_ids_cross_shards(self):
        mesh = make_mesh()
        n = 800  # 100 rows per shard
        store, queries = _data(n=n, q=1)
        valid = np.ones(n, dtype=bool)
        # plant the best matches in different shards
        for shard, row in [(0, 3), (3, 350), (7, 777)]:
            store[row] = queries[0] * (1 - 0.001 * shard)
        scores, idx = sharded_topk(
            mesh, jnp.asarray(store), jnp.asarray(queries),
            jnp.asarray(valid), 3)
        assert set(np.asarray(idx)[0].tolist()) == {3, 350, 777}

    def test_indivisible_rows_rejected(self):
        mesh = make_mesh()
        store, queries = _data(n=100, q=1)  # 100 % 8 != 0
        with pytest.raises(ValueError, match="not divisible"):
            sharded_topk(mesh, jnp.asarray(store), jnp.asarray(queries),
                         jnp.asarray(np.ones(100, bool)), 3)

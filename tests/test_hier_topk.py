"""Hierarchical exact top-k vs the naive oracle (exactness proof check)."""

import numpy as np
import pytest

import jax.numpy as jnp

from sema_tpu.ops.hier_topk import batched_topk_scores_hier, hier_topk_scores
from sema_tpu.ops.topk import batched_topk_scores


def _data(n, d=32, q=4, seed=0):
    rng = np.random.default_rng(seed)
    store = rng.standard_normal((n, d)).astype(np.float32)
    store /= np.linalg.norm(store, axis=1, keepdims=True)
    queries = rng.standard_normal((q, d)).astype(np.float32)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)
    return store, queries


@pytest.mark.parametrize("group", [8, 64, 128])
@pytest.mark.parametrize("k", [1, 10, 50])
def test_matches_naive_exactly(group, k):
    store, queries = _data(4096)
    valid = np.ones(4096, bool)
    nv, ni = batched_topk_scores(
        jnp.asarray(store), jnp.asarray(queries), jnp.asarray(valid), k)
    hv, hi = batched_topk_scores_hier(
        jnp.asarray(store), jnp.asarray(queries), jnp.asarray(valid), k,
        group=group)
    np.testing.assert_allclose(np.asarray(hv), np.asarray(nv), atol=1e-6)
    for i in range(queries.shape[0]):
        assert set(np.asarray(hi)[i].tolist()) == set(np.asarray(ni)[i].tolist())


def test_adversarial_clustered_topk():
    """All top-k rows packed into ONE group — the case where per-group max
    selection must still recover every one of them."""
    rng = np.random.default_rng(0)
    n, d, k, group = 1024, 16, 8, 64
    store = rng.standard_normal((n, d)).astype(np.float32) * 0.01
    q = rng.standard_normal((1, d)).astype(np.float32)
    q /= np.linalg.norm(q)
    # plant the k best matches all inside group 5
    base = 5 * group
    for j in range(k):
        store[base + j] = q[0] * (1.0 - 0.001 * j)
    valid = np.ones(n, bool)
    hv, hi = batched_topk_scores_hier(
        jnp.asarray(store), jnp.asarray(q), jnp.asarray(valid), k, group=group)
    assert set(np.asarray(hi)[0].tolist()) == {base + j for j in range(k)}


def test_masked_rows_stay_excluded():
    store, queries = _data(512)
    valid = np.ones(512, bool)
    store[100] = queries[0]
    valid[100] = False
    _, hi = batched_topk_scores_hier(
        jnp.asarray(store), jnp.asarray(queries), jnp.asarray(valid), 10,
        group=64)
    assert 100 not in np.asarray(hi)[0].tolist()


def test_indivisible_n_falls_back():
    store, queries = _data(100)  # 100 % 64 != 0 → naive fallback
    valid = np.ones(100, bool)
    hv, hi = batched_topk_scores_hier(
        jnp.asarray(store), jnp.asarray(queries), jnp.asarray(valid), 5)
    nv, ni = batched_topk_scores(
        jnp.asarray(store), jnp.asarray(queries), jnp.asarray(valid), 5)
    np.testing.assert_allclose(np.asarray(hv), np.asarray(nv), atol=1e-6)


def test_k_exceeds_groups():
    # G = 2 groups but k = 5: k_groups clamps to G, candidates = all rows
    scores = jnp.asarray(np.random.default_rng(0)
                         .standard_normal((2, 16)).astype(np.float32))
    vals, idx = hier_topk_scores(scores, k=5, group=8)
    ref_vals, ref_idx = batched_topk_scores(
        jnp.eye(16, dtype=jnp.float32), jnp.zeros((2, 16)), jnp.ones(16, bool), 5)
    # direct oracle on the same scores
    order = np.argsort(-np.asarray(scores), axis=1)[:, :5]
    for i in range(2):
        assert set(np.asarray(idx)[i].tolist()) == set(order[i].tolist())

"""IVF pruned scan: kernels (interpret mode) + clustering helpers.

The pruned kernel's contract: exact top-k over the UNION of the selected
tiles' live rows. When the selection covers every tile it must be
bit-identical to the dense kernel/oracle; when it covers a subset, it
must equal the oracle run with all other rows masked out. Duplicate pad
tile ids must never produce duplicate result rows.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sema_tpu.ops.ivf import cluster_layout, kmeans_cluster, select_tiles
from sema_tpu.ops.pallas_topk import (pallas_topk_int8_pruned,
                                      pallas_topk_pruned)
from sema_tpu.ops.topk import batched_topk_scores


def _data(n, d=128, q=4, seed=0):
    rng = np.random.default_rng(seed)
    store = rng.standard_normal((n, d)).astype(np.float32)
    store /= np.linalg.norm(store, axis=1, keepdims=True)
    queries = rng.standard_normal((q, d)).astype(np.float32)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)
    return store, queries


def _run_pruned(store, queries, valid, tiles, n_live, k, tile_n):
    return pallas_topk_pruned(
        jnp.asarray(store), jnp.asarray(queries), jnp.asarray(valid),
        jnp.asarray(tiles, dtype=jnp.int32),
        jnp.asarray([n_live], dtype=jnp.int32), k, tile_n=tile_n,
        interpret=True)


@pytest.mark.parametrize("k", [1, 10])
def test_all_tiles_matches_oracle(k):
    store, queries = _data(1024)
    valid = np.ones(1024, bool)
    tiles = np.arange(8, dtype=np.int32)  # every tile, tile_n=128
    ps, pi = _run_pruned(store, queries, valid, tiles, 8, k, 128)
    ns, ni = batched_topk_scores(jnp.asarray(store), jnp.asarray(queries),
                                 jnp.asarray(valid), k)
    np.testing.assert_allclose(np.asarray(ps), np.asarray(ns), atol=1e-5)
    for i in range(queries.shape[0]):
        assert set(np.asarray(pi)[i].tolist()) == \
            set(np.asarray(ni)[i].tolist())


def test_subset_equals_masked_oracle():
    store, queries = _data(1024, q=3, seed=1)
    valid = np.ones(1024, bool)
    valid[200:210] = False  # tombstones inside a selected tile
    tiles = np.array([1, 4, 6], dtype=np.int32)
    padded = np.array([1, 4, 6, 6, 6, 6], dtype=np.int32)  # pad repeats
    ps, pi = _run_pruned(store, queries, valid, padded, 3, 5, 128)
    # oracle over only the selected tiles' live rows
    sub_valid = np.zeros(1024, bool)
    for t in tiles:
        sub_valid[t * 128:(t + 1) * 128] = True
    sub_valid &= valid
    ns, ni = batched_topk_scores(jnp.asarray(store), jnp.asarray(queries),
                                 jnp.asarray(sub_valid), 5)
    np.testing.assert_allclose(np.asarray(ps), np.asarray(ns), atol=1e-5)
    for i in range(queries.shape[0]):
        assert np.asarray(pi)[i].tolist() == np.asarray(ni)[i].tolist()


def test_pad_tiles_no_duplicates():
    """Pad steps repeat a live tile id; its rows must not be merged twice."""
    store, queries = _data(512, q=1, seed=2)
    store[300] = queries[0]  # unique best inside the padded tile
    valid = np.ones(512, bool)
    padded = np.array([2, 2, 2, 2], dtype=np.int32)  # 1 live + 3 pads
    ps, pi = _run_pruned(store, queries, valid, padded, 1, 4, 128)
    ids = np.asarray(pi)[0].tolist()
    assert ids[0] == 300
    assert len(set(ids)) == len(ids), ids  # all distinct


def test_int8_pruned_subset():
    from sema_tpu.ops.quant import quantize_rows
    store, queries = _data(1024, q=2, seed=3)
    vals, scales = quantize_rows(store)
    valid = np.ones(1024, bool)
    padded = np.array([0, 3, 7, 7], dtype=np.int32)
    ps, pi = pallas_topk_int8_pruned(
        jnp.asarray(vals), jnp.asarray(scales), jnp.asarray(queries),
        jnp.asarray(valid), jnp.asarray(padded, dtype=jnp.int32),
        jnp.asarray([3], dtype=jnp.int32), 4, tile_n=128, interpret=True)
    # int8 is approximate; check ids land inside selected tiles and the
    # true (planted) winner is found
    sel_rows = set()
    for t in (0, 3, 7):
        sel_rows.update(range(t * 128, (t + 1) * 128))
    for i in range(2):
        assert all(r in sel_rows for r in np.asarray(pi)[i].tolist())


def test_kmeans_layout_roundtrip():
    store, _ = _data(2048, d=64, seed=4)
    assign, cent = kmeans_cluster(jnp.asarray(store), 16, iters=4)
    assign = np.asarray(assign)
    cent = np.asarray(cent)
    assert assign.shape == (2048,) and assign.min() >= 0 \
        and assign.max() < 16
    perm, starts = cluster_layout(assign, 16)
    # perm is a permutation; cluster ranges partition the rows
    assert sorted(perm.tolist()) == list(range(2048))
    assert starts[0] == 0 and starts[-1] == 2048
    for c in range(16):
        rows = perm[starts[c]:starts[c + 1]]
        assert (assign[rows] == c).all()
    # non-empty centroids are unit vectors
    norms = np.linalg.norm(cent, axis=1)
    live = starts[1:] > starts[:-1]
    np.testing.assert_allclose(norms[live], 1.0, atol=1e-5)


def test_kmeans_ignores_zero_padding_rows():
    store, _ = _data(1000, d=64, seed=5)
    padded = np.zeros((1024, 64), dtype=np.float32)
    padded[:1000] = store
    assign, cent = kmeans_cluster(jnp.asarray(padded), 8, iters=4)
    # centroids must be built from real rows only: each centroid is a
    # unit vector or dead-zero, never a small-norm zero-diluted mean
    norms = np.linalg.norm(np.asarray(cent), axis=1)
    assert ((norms > 0.999) | (norms < 1e-6)).all()
    # padding rows park in the overflow cluster (id == c), real rows
    # in [0, c) — the overflow range is never probed
    assign = np.asarray(assign)
    assert (assign[1000:] == 8).all()
    assert (assign[:1000] < 8).all()


def test_kmeans_generic_n_not_block_multiple():
    """N >= 8192 but not a multiple of the 8192 Lloyd block must work
    (generic contract; the store's pow2 n_pad is a lucky multiple)."""
    store, _ = _data(8192 + 4096, d=32, seed=9)
    assign, cent = kmeans_cluster(jnp.asarray(store), 16, iters=2)
    assign = np.asarray(assign)
    assert assign.shape == (12288,)
    assert assign.min() >= 0 and assign.max() < 16
    perm, starts = cluster_layout(assign, 16)
    assert sorted(perm.tolist()) == list(range(12288))


def test_select_tiles_budget_and_padding():
    rng = np.random.default_rng(6)
    cent = rng.standard_normal((8, 32)).astype(np.float32)
    cent /= np.linalg.norm(cent, axis=1, keepdims=True)
    starts = np.array([0, 100, 300, 300, 500, 800, 900, 1000, 1024],
                      dtype=np.int64)  # cluster 2 empty
    q = cent[1:2] + 0.01  # probe lands on cluster 1
    out = select_tiles(cent, starts, q, nprobe=1, tile_n=128, budget=8)
    assert out is not None
    tiles, n_live = out
    # cluster 1 covers rows [100, 300) → tiles 0..2
    assert tiles[:n_live].tolist() == [0, 1, 2]
    assert (tiles[n_live:] == tiles[n_live - 1]).all()
    # over-budget → None (fall back to the exact scan)
    assert select_tiles(cent, starts, np.concatenate([cent] * 2),
                        nprobe=8, tile_n=128, budget=2) is None
    # empty probe → None
    assert select_tiles(cent, np.zeros(9, np.int64), q, nprobe=1,
                        tile_n=128, budget=8) is None


def test_select_tiles_recall_planted():
    """A query equal to a stored row must select that row's tile."""
    store, _ = _data(2048, d=64, seed=7)
    assign, cent = kmeans_cluster(jnp.asarray(store), 16, iters=6)
    perm, starts = cluster_layout(np.asarray(assign), 16)
    permuted = store[perm]
    q = store[123:124]
    out = select_tiles(np.asarray(cent), starts, q, nprobe=4,
                       tile_n=128, budget=16)
    assert out is not None
    tiles, n_live = out
    pos = int(np.where(perm == 123)[0][0])
    assert pos // 128 in tiles[:n_live].tolist()
    # and the pruned kernel then finds it as top-1
    valid = np.ones(2048, bool)
    ps, pi = _run_pruned(permuted, q, valid, tiles, n_live, 1, 128)
    assert perm[int(np.asarray(pi)[0, 0])] == 123


def test_padded_bucket_seeds_no_dead_centroids():
    """A heavily zero-padded bucket (pow2 store padding) must not seed
    dead centroids — the strided init sampled the zero tail, losing the
    padding fraction of the init diversity (review finding, r3)."""
    real, _ = _data(600, d=32, seed=11)
    x = np.zeros((1024, 32), np.float32)
    x[:600] = real
    assign, cent = kmeans_cluster(jnp.asarray(x), 8, iters=4)
    cent = np.asarray(cent)
    norms = np.linalg.norm(cent, axis=1)
    assert (norms > 0).all(), f"dead centroids seeded: {norms}"
    # padding rows still take the overflow id
    assert (np.asarray(assign)[600:] == 8).all()


def test_select_tiles_ignores_dead_centroids():
    """Dead (zero) centroids score 0 against every query and used to
    outrank real anti-aligned clusters, eating probe slots with no
    signal (review finding, r3)."""
    cent = np.zeros((8, 16), np.float32)
    for i in range(5):
        cent[i, i] = 1.0          # 5 real orthogonal clusters
    starts = np.arange(0, 9 * 128, 128, dtype=np.int64)
    starts = np.concatenate([starts[:9]])
    q = -np.ones((1, 16), np.float32) / 4.0   # anti-aligned with all
    out = select_tiles(cent, starts, q, nprobe=2, tile_n=128, budget=8)
    assert out is not None
    tiles, n_live = out
    # both probe slots went to REAL clusters (ids < 5 → tiles < 5)
    assert n_live == 2 and (tiles[:n_live] < 5).all()

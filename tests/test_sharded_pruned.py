"""Sharded IVF: the per-shard pruned scan + all_gather candidate merge.

Contract (parallel/sharded_topk.py:make_sharded_pruned_topk): the store
is row-sharded, each shard clustered independently; every chip scans ONLY
its own probed tiles (tile ids are shard-local) and the merge is the same
exact candidate union as the dense sharded path. With every tile probed
on every shard the result must equal the full-scan oracle; with a subset
it must equal the oracle restricted to the selected rows.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sema_tpu.ops.pallas_topk import pallas_topk_pruned
from sema_tpu.parallel.mesh import make_mesh
from sema_tpu.parallel.sharded_topk import make_sharded_pruned_topk

TILE = 128


def _data(n, d=64, q=3, seed=0):
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


def _local(store_shard, q, valid_shard, tiles, n_live, k):
    return pallas_topk_pruned(store_shard, q, valid_shard, tiles, n_live,
                              k, tile_n=TILE, interpret=True)


def _compile(mesh, n, k):
    return make_sharded_pruned_topk(mesh, n, k, axis="index",
                                    local_fn=_local)


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
class TestShardedPrunedTopk:
    def test_all_tiles_matches_full_oracle(self):
        mesh = make_mesh()  # (1, 8): 8 index shards
        n, tiles_per_shard = 2048, 2  # 256 rows/shard, tile_n=128
        store, queries = _data(n)
        valid = np.ones(n, bool)
        valid[::7] = False
        fn = _compile(mesh, n, k=10)
        tiles = np.broadcast_to(np.arange(tiles_per_shard, dtype=np.int32),
                                (8, tiles_per_shard)).copy()
        n_live = np.full((8, 1), tiles_per_shard, dtype=np.int32)
        s, i = fn(jnp.asarray(store), jnp.asarray(queries),
                  jnp.asarray(valid), jnp.asarray(tiles),
                  jnp.asarray(n_live))
        rs, ri = _oracle(store, queries, valid, 10)
        np.testing.assert_allclose(np.asarray(s), rs, atol=1e-5)
        for q in range(queries.shape[0]):
            assert set(np.asarray(i)[q].tolist()) == set(ri[q].tolist())

    def test_subset_equals_masked_oracle(self):
        """Probe only each shard's FIRST tile; equal to the oracle with
        every unprobed row masked out. Pad entries repeat the live id."""
        mesh = make_mesh()
        n, shard_rows = 2048, 256
        store, queries = _data(n, seed=1)
        valid = np.ones(n, bool)
        fn = _compile(mesh, n, k=5)
        tiles = np.zeros((8, 2), dtype=np.int32)  # live tile 0, pad 0
        n_live = np.ones((8, 1), dtype=np.int32)
        s, i = fn(jnp.asarray(store), jnp.asarray(queries),
                  jnp.asarray(valid), jnp.asarray(tiles),
                  jnp.asarray(n_live))
        sub_valid = np.zeros(n, bool)
        for shard in range(8):
            lo = shard * shard_rows
            sub_valid[lo:lo + TILE] = True
        rs, ri = _oracle(store, queries, sub_valid, 5)
        np.testing.assert_allclose(np.asarray(s), rs, atol=1e-5)
        for q in range(queries.shape[0]):
            assert set(np.asarray(i)[q].tolist()) == set(ri[q].tolist())
        # nothing from an unprobed tile may leak in
        assert all(sub_valid[r] for r in np.asarray(i).ravel().tolist())

    def test_per_shard_heterogeneous_probes_and_global_ids(self):
        """Different shards probe DIFFERENT local tiles; planted winners in
        three shards come back with correct global permuted positions."""
        mesh = make_mesh()
        n, shard_rows = 2048, 256
        store, queries = _data(n, q=1, seed=2)
        valid = np.ones(n, bool)
        # winners: shard 0 tile 1, shard 3 tile 0, shard 7 tile 1
        plants = [(0, 1, 5), (3, 0, 17), (7, 1, 99)]
        rows = []
        for rank, (shard, tile, off) in enumerate(plants):
            r = shard * shard_rows + tile * TILE + off
            store[r] = queries[0] * (1.0 - 0.001 * rank)
            rows.append(r)
        tiles = np.zeros((8, 2), dtype=np.int32)
        n_live = np.ones((8, 1), dtype=np.int32)
        for shard, tile, _ in plants:
            tiles[shard, 0] = tile
        fn = _compile(mesh, n, k=3)
        s, i = fn(jnp.asarray(store), jnp.asarray(queries),
                  jnp.asarray(valid), jnp.asarray(tiles),
                  jnp.asarray(n_live))
        assert np.asarray(i)[0].tolist() == rows
        assert np.all(np.diff(np.asarray(s)[0]) <= 1e-6)

    def test_indivisible_rows_rejected(self):
        mesh = make_mesh()
        with pytest.raises(ValueError, match="not divisible"):
            make_sharded_pruned_topk(mesh, 100, 3, axis="index",
                                     local_fn=_local)


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
def test_default_local_fn_full_coverage():
    """make_sharded_pruned_topk without local_fn works (review: the
    documented default was a trace-time TypeError) and, at full probe
    coverage, equals the oracle. Default tile is the kernel's 512."""
    mesh = make_mesh(shape=[8], axis_names=("index",))
    n, k, t = 8 * 2 * 512, 5, 512
    store, queries = _data(n)
    valid = np.ones(n, dtype=bool)
    per = (n // 8) // t
    tiles = np.tile(np.arange(per, dtype=np.int32), (8, 1))
    n_live = np.full((8, 1), per, dtype=np.int32)
    fn = make_sharded_pruned_topk(mesh, n, k, axis="index")
    s, i = fn(jnp.asarray(store), jnp.asarray(queries),
              jnp.asarray(valid), jnp.asarray(tiles),
              jnp.asarray(n_live))
    os_, oi = _oracle(store, queries, valid, k)
    np.testing.assert_array_equal(np.asarray(i), oi)
    np.testing.assert_allclose(np.asarray(s), os_, atol=1e-4)

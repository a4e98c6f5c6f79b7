"""Two-level (ICI + DCN) top-k merge on a (2, 4) virtual mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sema_tpu.parallel.mesh import make_mesh
from sema_tpu.parallel.multislice import make_multislice_topk

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 virtual devices")


def _data(n, d=32, q=3, seed=0):
    rng = np.random.default_rng(seed)
    store = rng.standard_normal((n, d)).astype(np.float32)
    store /= np.linalg.norm(store, axis=1, keepdims=True)
    queries = rng.standard_normal((q, d)).astype(np.float32)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)
    return store, queries


def _oracle(store, queries, valid, k):
    scores = queries @ store.T
    scores[:, ~valid] = -np.inf
    idx = np.argsort(-scores, axis=1)[:, :k]
    return np.take_along_axis(scores, idx, axis=1), idx


def test_two_level_matches_oracle():
    mesh = make_mesh(shape=[2, 4], axis_names=("slice", "index"))
    n, k = 1024, 10
    store, queries = _data(n)
    valid = np.ones(n, bool)
    valid[::7] = False
    fn = make_multislice_topk(mesh, n, k)
    from jax.sharding import NamedSharding, PartitionSpec as P
    store_d = jax.device_put(
        jnp.asarray(store), NamedSharding(mesh, P(("slice", "index"), None)))
    valid_d = jax.device_put(
        jnp.asarray(valid), NamedSharding(mesh, P(("slice", "index"))))
    scores, idx = fn(store_d, jnp.asarray(queries), valid_d)
    ref_s, ref_i = _oracle(store, queries, valid, k)
    for i in range(queries.shape[0]):
        assert set(np.asarray(idx)[i].tolist()) == set(ref_i[i].tolist())
    np.testing.assert_allclose(np.asarray(scores), ref_s, atol=1e-5)


def test_winners_across_slices():
    mesh = make_mesh(shape=[2, 4], axis_names=("slice", "index"))
    n, k = 512, 4
    store, queries = _data(n, q=1)
    valid = np.ones(n, bool)
    # plant winners in both slices and multiple chips: shard size 64
    for rank, row in enumerate([5, 100, 300, 480]):
        store[row] = queries[0] * (1 - 0.001 * rank)
    fn = make_multislice_topk(mesh, n, k)
    from jax.sharding import NamedSharding, PartitionSpec as P
    store_d = jax.device_put(
        jnp.asarray(store), NamedSharding(mesh, P(("slice", "index"), None)))
    valid_d = jax.device_put(
        jnp.asarray(valid), NamedSharding(mesh, P(("slice", "index"))))
    scores, idx = fn(store_d, jnp.asarray(queries), valid_d)
    assert np.asarray(idx)[0].tolist() == [5, 100, 300, 480]


def test_indivisible_rejected():
    mesh = make_mesh(shape=[2, 4], axis_names=("slice", "index"))
    with pytest.raises(ValueError, match="not divisible"):
        make_multislice_topk(mesh, 100, 5)


def test_pruned_two_level_full_coverage():
    """make_multislice_pruned_topk with every tile probed must equal the
    exact oracle — the two-level merge and slice-major shard-id
    globalization are what's under test, not the pruning."""
    from sema_tpu.ops.pallas_topk import pallas_topk_pruned
    from sema_tpu.parallel.multislice import make_multislice_pruned_topk

    mesh = make_mesh(shape=[2, 4], axis_names=("slice", "index"))
    tile_n, tiles_per_shard, k = 128, 2, 6
    shard_rows = tile_n * tiles_per_shard
    n = shard_rows * 8
    store, queries = _data(n, q=4, seed=3)
    valid = np.ones(n, bool)
    valid[::11] = False
    tiles = np.broadcast_to(np.arange(tiles_per_shard, dtype=np.int32),
                            (8, tiles_per_shard)).copy()
    n_live = np.full((8, 1), tiles_per_shard, dtype=np.int32)

    def local_fn(st, q, v, ti, nl, kk):
        return pallas_topk_pruned(st, q, v, ti, nl, kk, tile_n=tile_n,
                                  interpret=True)

    fn = make_multislice_pruned_topk(mesh, n, k, local_fn=local_fn)
    from jax.sharding import NamedSharding, PartitionSpec as P
    row = NamedSharding(mesh, P(("slice", "index"), None))
    scores, idx = fn(
        jax.device_put(jnp.asarray(store), row),
        jnp.asarray(queries),
        jax.device_put(jnp.asarray(valid),
                       NamedSharding(mesh, P(("slice", "index")))),
        jax.device_put(jnp.asarray(tiles), row),
        jax.device_put(jnp.asarray(n_live), row))
    ref_s, ref_i = _oracle(store, queries, valid, k)
    for i in range(queries.shape[0]):
        assert set(np.asarray(idx)[i].tolist()) == set(ref_i[i].tolist())
    np.testing.assert_allclose(np.asarray(scores), ref_s, atol=2e-2)

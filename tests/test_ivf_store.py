"""VectorStore IVF mode end-to-end (CPU, Pallas interpret).

Sealed buckets cluster + permute at build; small-batch searches go
through the pruned scalar-prefetch kernel and map hits back through the
permutation; tombstones, persistence reload, and the over-budget →
exact-scan fallback all keep working.
"""

from pathlib import Path

import numpy as np
import pytest

from sema_tpu.index.vector_store import VectorStore
from sema_tpu.types import Chunk


def chunks_and_vecs(n, d=128, path="f.txt", seed=0, start=0):
    rng = np.random.default_rng(seed)
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    cs = [Chunk(id=f"{path}:{start + i}", file_path=Path(path),
                start_line=i + 1, end_line=i + 2,
                content=f"content {start + i}")
          for i in range(n)]
    return cs, vecs


@pytest.fixture()
def ivf_env(monkeypatch):
    # interpret-mode Pallas on CPU; tiny tiles so a 2048-row padded
    # bucket has enough of them for a meaningful probe/budget split
    monkeypatch.setenv("SEMA_TPU_SCAN_BACKEND", "pallas")
    monkeypatch.setattr(VectorStore, "SEAL_ROWS", 256)
    monkeypatch.setattr(VectorStore, "IVF_TILE", 128)
    monkeypatch.setattr(VectorStore, "IVF_CLUSTER_ROWS", 128)
    monkeypatch.setenv("SEMA_TPU_IVF_NPROBE", "3")


def make_store(tmp_path, **kw):
    return VectorStore(tmp_path, dim=128, model="test-ivf", ivf=True,
                       **kw)


def _sealed_ivf_buckets(store):
    return [b for b in store.device_buckets()
            if b.get("ivf") is not None]


def test_ivf_bucket_built_and_probed(tmp_path, ivf_env):
    store = make_store(tmp_path)
    cs, vecs = chunks_and_vecs(300)
    store.add_chunks(cs, vecs)
    assert _sealed_ivf_buckets(store), "sealed bucket should cluster"
    b = _sealed_ivf_buckets(store)[0]
    perm = b["ivf"]["perm"]
    assert sorted(perm.tolist()) == list(range(b["n_pad"]))
    # a stored row as its own query must come back as the top hit
    for probe_row in (0, 57, 123, 299):
        if probe_row >= b["rows"] + 100:
            continue
        res = store.search(vecs[probe_row], k=3)
        assert res[0][0].id == f"f.txt:{probe_row}"
        assert res[0][1] == pytest.approx(1.0, abs=1e-2)
    store.close()


def test_ivf_dispatch_is_pruned_not_fallback(tmp_path, ivf_env):
    """The probe must actually take the pruned path (compile-cache key
    proves it) and scan fewer tiles than the full bucket."""
    store = make_store(tmp_path)
    cs, vecs = chunks_and_vecs(300, seed=3)
    store.add_chunks(cs, vecs)
    store.search(vecs[7], k=2)
    assert any(k[0] == "ivf" for k in store._topk_fns), \
        "single-query search should dispatch the pruned kernel"
    store.close()


def test_ivf_tombstones_respected(tmp_path, ivf_env):
    store = make_store(tmp_path)
    cs, vecs = chunks_and_vecs(280, path="a.txt", seed=1)
    store.add_chunks(cs, vecs)
    removed = store.remove_file_chunks("a.txt")
    assert removed == 280
    res = store.search(vecs[11], k=2)
    assert res == []
    store.close()


def test_ivf_matches_exact_scan(tmp_path, ivf_env, monkeypatch):
    """With nprobe == every cluster (and a budget that admits them all),
    the pruned scan must equal the exact scan bit-for-bit."""
    monkeypatch.setenv("SEMA_TPU_IVF_NPROBE", "4096")
    monkeypatch.setattr(VectorStore, "IVF_BUDGET_DIV", 1)
    store = make_store(tmp_path)
    cs, vecs = chunks_and_vecs(300, seed=2)
    store.add_chunks(cs, vecs)
    queries = vecs[17:21]
    s_ivf, i_ivf = store.search_batch(queries, k=5)
    assert any(k[0] == "ivf" for k in store._topk_fns)

    exact = VectorStore(tmp_path, dim=128, model="test-ivf", ivf=False)
    s_ex, i_ex = exact.search_batch(queries, k=5)
    np.testing.assert_allclose(s_ivf, s_ex, atol=1e-6)
    np.testing.assert_array_equal(np.sort(i_ivf, 1), np.sort(i_ex, 1))
    exact.close()
    store.close()


def test_ivf_overbudget_falls_back_exact(tmp_path, ivf_env, monkeypatch):
    """A probe whose tile union exceeds the budget takes the exact scan
    of the permuted bucket — results must still map correctly."""
    monkeypatch.setenv("SEMA_TPU_IVF_NPROBE", "4096")  # probe everything
    monkeypatch.setattr(VectorStore, "IVF_BUDGET_DIV", 4096)  # budget ~2
    store = make_store(tmp_path)
    cs, vecs = chunks_and_vecs(300, seed=4)
    store.add_chunks(cs, vecs)
    res = store.search(vecs[123], k=1)
    assert res[0][0].id == "f.txt:123"
    assert not any(k[0] == "ivf" for k in store._topk_fns), \
        "over-budget probe must not compile the pruned kernel"
    store.close()


def test_ivf_survives_reload(tmp_path, ivf_env):
    store = make_store(tmp_path)
    cs, vecs = chunks_and_vecs(300, seed=5)
    store.add_chunks(cs, vecs)
    store.close()
    store2 = make_store(tmp_path)
    assert _sealed_ivf_buckets(store2)
    res = store2.search(vecs[200], k=1)
    assert res[0][0].id == "f.txt:200"
    store2.close()


def test_ivf_off_by_default(tmp_path, ivf_env, monkeypatch):
    monkeypatch.delenv("SEMA_TPU_IVF", raising=False)
    store = VectorStore(tmp_path, dim=128, model="test-ivf")
    cs, vecs = chunks_and_vecs(300, seed=6)
    store.add_chunks(cs, vecs)
    assert not _sealed_ivf_buckets(store)
    store.close()


def test_ivf_int8_store(tmp_path, ivf_env):
    store = make_store(tmp_path, store_dtype="int8")
    cs, vecs = chunks_and_vecs(300, seed=7)
    store.add_chunks(cs, vecs)
    assert _sealed_ivf_buckets(store)
    res = store.search(vecs[42], k=3)
    # int8 scan + full-precision rescore: planted winner exact
    assert res[0][0].id == "f.txt:42"
    assert res[0][1] == pytest.approx(1.0, abs=1e-3)
    store.close()


def test_ivf_arena_seal_clusters(tmp_path, ivf_env):
    """A bucket sealed IN PLACE by arena extension (streamed appends
    crossing SEAL_ROWS) must be rebuilt clustered — not left as an
    unclustered exact-scan bucket until the next reopen."""
    store = make_store(tmp_path)
    cs, vecs = chunks_and_vecs(100, seed=8)
    store.add_chunks(cs, vecs)
    store.search(vecs[0], k=1)   # materialize the unsealed arena bucket
    assert not _sealed_ivf_buckets(store)
    cs2, vecs2 = chunks_and_vecs(200, seed=9, start=100, path="g.txt")
    store.add_chunks(cs2, vecs2)  # 300 rows >= SEAL_ROWS: seals in place
    res = store.search(vecs2[150], k=1)
    assert res[0][0].id == "g.txt:250"
    sealed = [b for b in store.device_buckets() if b["sealed"]]
    assert sealed and all(b.get("ivf") is not None for b in sealed)
    assert any(k[0] == "ivf" for k in store._topk_fns), \
        "post-seal search should take the pruned path"
    store.close()


# ---------------------------------------------------------------------------
# mesh-sharded IVF: per-shard clustering + the sharded pruned dispatch
# (parallel/sharded_topk.py:make_sharded_pruned_topk) on the 8-device
# virtual CPU mesh
# ---------------------------------------------------------------------------

import jax  # noqa: E402

from sema_tpu.parallel import make_mesh  # noqa: E402


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
class TestMeshIVF:
    def _store(self, tmp_path, **kw):
        return make_store(tmp_path, mesh=make_mesh(), **kw)

    def test_per_shard_clustering_block_local(self, tmp_path, ivf_env):
        store = self._store(tmp_path)
        cs, vecs = chunks_and_vecs(300, seed=10)
        store.add_chunks(cs, vecs)
        bs = _sealed_ivf_buckets(store)
        assert bs, "sealed mesh bucket should cluster"
        ivf = bs[0]["ivf"]
        assert ivf["centroids"].ndim == 3          # (shards, C, d)
        shards = ivf["centroids"].shape[0]
        sr = bs[0]["n_pad"] // shards
        perm = ivf["perm"]
        for s in range(shards):                    # permutation is block-local
            blk = perm[s * sr:(s + 1) * sr]
            assert blk.min() >= s * sr and blk.max() < (s + 1) * sr
        store.close()

    def test_planted_winners_across_shards(self, tmp_path, ivf_env,
                                           monkeypatch):
        """Live rows spanning several shard blocks: each probed shard must
        recover its own planted winner through the sharded pruned path."""
        # fully live shards spread nprobe=3 clusters over more tiles than
        # the default 1/4 budget admits — allow half the shard's tiles so
        # the dispatch stays on the pruned path
        monkeypatch.setattr(VectorStore, "IVF_BUDGET_DIV", 2)
        store = self._store(tmp_path)
        cs, vecs = chunks_and_vecs(4400, seed=11)
        store.add_chunks(cs, vecs)
        assert _sealed_ivf_buckets(store)
        for row in (100, 2500, 4300):              # shards 0, 1, 2
            res = store.search(vecs[row], k=1)
            assert res[0][0].id == f"f.txt:{row}"
            assert res[0][1] == pytest.approx(1.0, abs=1e-2)
        assert any(k[0] == "ivf" for k in store._topk_fns), \
            "mesh searches should dispatch the sharded pruned kernel"
        store.close()

    def test_full_probe_matches_exact(self, tmp_path, ivf_env, monkeypatch):
        monkeypatch.setenv("SEMA_TPU_IVF_NPROBE", "4096")
        monkeypatch.setattr(VectorStore, "IVF_BUDGET_DIV", 1)
        store = self._store(tmp_path)
        cs, vecs = chunks_and_vecs(300, seed=12)
        store.add_chunks(cs, vecs)
        queries = vecs[40:44]
        s_ivf, i_ivf = store.search_batch(queries, k=5)
        assert any(k[0] == "ivf" for k in store._topk_fns)

        exact = VectorStore(tmp_path, dim=128, model="test-ivf",
                            ivf=False, mesh=make_mesh())
        s_ex, i_ex = exact.search_batch(queries, k=5)
        np.testing.assert_allclose(s_ivf, s_ex, atol=1e-6)
        np.testing.assert_array_equal(np.sort(i_ivf, 1), np.sort(i_ex, 1))
        exact.close()
        store.close()

    def test_tombstones_respected(self, tmp_path, ivf_env):
        store = self._store(tmp_path)
        cs, vecs = chunks_and_vecs(280, path="a.txt", seed=13)
        store.add_chunks(cs, vecs)
        assert store.remove_file_chunks("a.txt") == 280
        assert store.search(vecs[11], k=2) == []
        store.close()

"""VectorStore over a (slice, index) multislice mesh (VERDICT r3 #2).

BASELINE config 5 (100M rows on v5p-32) spans TPU slices: chips within a
slice talk over ICI, slices over DCN. The store must (a) shard rows over
BOTH axes slice-major, (b) route exact scans through the two-level merge
(parallel/multislice.py:make_multislice_topk), and (c) route IVF probes
through make_multislice_pruned_topk — all end-to-end through the public
add_chunks/search surface, on the 8-device virtual CPU mesh as a
2-slice x 4-chip topology.
"""

from pathlib import Path

import numpy as np
import pytest

import jax

from sema_tpu.index.vector_store import VectorStore
from sema_tpu.parallel.mesh import make_mesh
from sema_tpu.types import Chunk

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 virtual devices")


def chunks_and_vecs(n, d=128, path="f.txt", seed=0, start=0):
    rng = np.random.default_rng(seed)
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    cs = [Chunk(id=f"{path}:{start + i}", file_path=Path(path),
                start_line=i + 1, end_line=i + 2,
                content=f"content {start + i}")
          for i in range(n)]
    return cs, vecs


def ms_mesh(axes=("slice", "index"), shape=(2, 4)):
    return make_mesh(shape=list(shape), axis_names=axes)


def make_store(tmp_path, d=128, mesh=None, **kw):
    return VectorStore(tmp_path, dim=d, model="test-tiny",
                       mesh=mesh or ms_mesh(), slice_axis="slice", **kw)


def test_multislice_exact_search(tmp_path):
    store = make_store(tmp_path)
    assert store._shards() == 8          # 2 slices x 4 chips
    cs, vecs = chunks_and_vecs(500)
    store.add_chunks(cs, vecs)
    # winners in both slices and several chips of each
    for row in (3, 123, 321, 499):
        res = store.search(vecs[row], k=3)
        assert res[0][0].id == f"f.txt:{row}"
        assert res[0][1] == pytest.approx(1.0, abs=1e-2)
    dev_store, _ = store.device_arrays()
    assert len(dev_store.sharding.device_set) == 8
    store.close()


def test_multislice_matches_single_axis(tmp_path):
    """Two-level merge through the store returns the same hits as the
    flat single-axis merge over the same 8 chips."""
    cs, vecs = chunks_and_vecs(400, seed=5)
    ms = make_store(tmp_path / "ms")
    ms.add_chunks(cs, vecs)
    flat = VectorStore(tmp_path / "flat", dim=128, model="test-tiny",
                       mesh=make_mesh())
    flat.add_chunks(cs, vecs)
    queries = vecs[7:11]
    s_ms, i_ms = ms.search_batch(queries, k=10)
    s_fl, i_fl = flat.search_batch(queries, k=10)
    np.testing.assert_allclose(s_ms, s_fl, atol=1e-6)
    np.testing.assert_array_equal(np.sort(i_ms, 1), np.sort(i_fl, 1))
    ms.close()
    flat.close()


def test_multislice_int8(tmp_path):
    store = make_store(tmp_path, store_dtype="int8")
    cs, vecs = chunks_and_vecs(500, seed=2)
    store.add_chunks(cs, vecs)
    res = store.search(vecs[250], k=5)
    assert res[0][0].id == "f.txt:250"
    store.close()


def test_multislice_cli_shaped_mesh(tmp_path):
    """cli.py builds (slice, data, index); unused axes replicate."""
    mesh = make_mesh(shape=[2, 1, 4], axis_names=("slice", "data", "index"))
    store = make_store(tmp_path, mesh=mesh)
    cs, vecs = chunks_and_vecs(300, seed=3)
    store.add_chunks(cs, vecs)
    res = store.search(vecs[42], k=2)
    assert res[0][0].id == "f.txt:42"
    store.close()


def test_slice_axis_ignored_when_absent(tmp_path):
    """A slice_axis that names no mesh axis degrades to single-axis."""
    store = VectorStore(tmp_path, dim=128, model="test-tiny",
                        mesh=make_mesh(), slice_axis="slice")
    assert store.slice_axis is None
    assert store._shards() == 8
    cs, vecs = chunks_and_vecs(200, seed=4)
    store.add_chunks(cs, vecs)
    assert store.search(vecs[9], k=1)[0][0].id == "f.txt:9"
    store.close()


def test_multislice_tombstones(tmp_path):
    store = make_store(tmp_path)
    cs_a, v_a = chunks_and_vecs(250, path="a.txt", seed=6)
    cs_b, v_b = chunks_and_vecs(250, path="b.txt", seed=7)
    store.add_chunks(cs_a, v_a)
    store.add_chunks(cs_b, v_b)
    assert store.remove_file_chunks("a.txt") == 250
    assert store.search(v_a[11], k=1)[0][0].id != "a.txt:11"
    assert store.search(v_b[11], k=1)[0][0].id == "b.txt:11"
    store.close()


def test_slice_production_config_wiring(tmp_home, monkeypatch):
    """[mesh] slice_axis reaches the store through the PRODUCTION path:
    Config -> cli.make_index_manager ((slice, data, index) mesh) ->
    IndexManager -> VectorStore. Also guards the explicit-shape
    requirement and the slice+model 4-axis combination."""
    from sema_tpu.cli import make_index_manager
    from sema_tpu.config import Config

    cfg = Config()
    cfg.model.name = "test-tiny"
    cfg.model.batch_size = 8
    cfg.mesh.slice_axis = "slice"
    cfg.mesh.shape = [2, 1, 4]
    mgr = make_index_manager(cfg)
    store = mgr.vector_store
    assert store.slice_axis == "slice"
    assert store._shards() == 8
    assert tuple(store.mesh.axis_names) == ("slice", "data", "index")
    mgr.close()

    cfg.mesh.shape = []   # slice_axis without an explicit 3-entry shape
    with pytest.raises(SystemExit):
        make_index_manager(cfg)

    # slice + model TP compose on one 4-axis mesh
    cfg.mesh.model_axis = "model"
    cfg.mesh.shape = [2, 1, 2, 2]
    mgr = make_index_manager(cfg)
    assert tuple(mgr.vector_store.mesh.axis_names) == (
        "slice", "data", "model", "index")
    assert mgr.vector_store._shards() == 4   # 2 slices x 2 index chips
    out = mgr.encoder.encode_texts(["multislice tp doc"])
    assert out.shape == (1, mgr.encoder.spec.dim)
    mgr.close()


class TestMultisliceIVF:
    """IVF per-shard clustering + the two-level pruned dispatch."""

    @pytest.fixture()
    def ivf_env(self, monkeypatch):
        monkeypatch.setenv("SEMA_TPU_SCAN_BACKEND", "pallas")
        monkeypatch.setattr(VectorStore, "SEAL_ROWS", 256)
        monkeypatch.setattr(VectorStore, "IVF_TILE", 128)
        monkeypatch.setattr(VectorStore, "IVF_CLUSTER_ROWS", 128)
        monkeypatch.setenv("SEMA_TPU_IVF_NPROBE", "3")

    def test_planted_winners_both_slices(self, tmp_path, ivf_env,
                                         monkeypatch):
        monkeypatch.setattr(VectorStore, "IVF_BUDGET_DIV", 2)
        store = make_store(tmp_path, ivf=True)
        cs, vecs = chunks_and_vecs(4400, seed=11)
        store.add_chunks(cs, vecs)
        bucket = [b for b in store.device_buckets()
                  if b.get("ivf") is not None]
        assert bucket, "sealed multislice bucket should cluster"
        # per-shard centroid tables: one block per (slice, chip) shard
        assert bucket[0]["ivf"]["centroids"].shape[0] == 8
        # winners in shard blocks of both slices
        for row in (100, 2500, 4300):
            res = store.search(vecs[row], k=1)
            assert res[0][0].id == f"f.txt:{row}"
            assert res[0][1] == pytest.approx(1.0, abs=1e-2)
        assert any(k[0] == "ivf" for k in store._topk_fns), \
            "multislice searches should dispatch the pruned kernel"
        store.close()

    def test_full_probe_matches_exact(self, tmp_path, ivf_env,
                                      monkeypatch):
        monkeypatch.setenv("SEMA_TPU_IVF_NPROBE", "4096")
        monkeypatch.setattr(VectorStore, "IVF_BUDGET_DIV", 1)
        store = make_store(tmp_path, ivf=True)
        cs, vecs = chunks_and_vecs(300, seed=12)
        store.add_chunks(cs, vecs)
        queries = vecs[40:44]
        s_ivf, i_ivf = store.search_batch(queries, k=5)
        assert any(k[0] == "ivf" for k in store._topk_fns)
        exact = VectorStore(tmp_path, dim=128, model="test-tiny",
                            ivf=False, mesh=ms_mesh(),
                            slice_axis="slice")
        s_ex, i_ex = exact.search_batch(queries, k=5)
        np.testing.assert_allclose(s_ivf, s_ex, atol=1e-6)
        np.testing.assert_array_equal(np.sort(i_ivf, 1),
                                      np.sort(i_ex, 1))
        exact.close()
        store.close()

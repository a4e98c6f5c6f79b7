"""IVF recall contract (docs/API.md "IVF recall contract").

Covers the two contract levers:
- per-query routing: ``exact=True`` on VectorStore.search/search_batch,
  QueryBatcher.search, IndexManager.search and the HTTP layer bypasses
  IVF pruning for that request only (recall@k 1.0 by construction);
- declarative target: ``ivf_min_recall`` maps a mean-recall@10 target to
  nprobe through the measured frontier (VectorStore.IVF_RECALL_FRONTIER)
  and routes everything exact above the ANN plateau.

The reference's recall story is exact-scan parity (LanceDB nearest_to,
lance_indexer.rs:121-126); ANN is a capability add here, and the
contract keeps it from silently serving low-recall tail queries.
"""

import threading
from pathlib import Path

import numpy as np
import pytest

from sema_tpu.index.vector_store import VectorStore
from sema_tpu.types import Chunk


def chunks_and_vecs(n, d=128, path="f.txt", seed=0):
    rng = np.random.default_rng(seed)
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    cs = [Chunk(id=f"{path}:{i}", file_path=Path(path),
                start_line=i + 1, end_line=i + 2, content=f"content {i}")
          for i in range(n)]
    return cs, vecs


@pytest.fixture()
def ivf_env(monkeypatch):
    monkeypatch.setenv("SEMA_TPU_SCAN_BACKEND", "pallas")
    monkeypatch.setattr(VectorStore, "SEAL_ROWS", 256)
    monkeypatch.setattr(VectorStore, "IVF_TILE", 128)
    monkeypatch.setattr(VectorStore, "IVF_CLUSTER_ROWS", 128)
    monkeypatch.setenv("SEMA_TPU_IVF_NPROBE", "1")


# ---------------------------------------------------------------------------
# the frontier mapping
# ---------------------------------------------------------------------------

def test_nprobe_for_recall_mapping():
    f = VectorStore.nprobe_for_recall
    assert f(0.5) == 8
    assert f(0.934) == 8
    assert f(0.935) == 16
    assert f(0.94) == 32
    assert f(0.945) == 64
    assert f(0.950) == 64
    # past the measured ANN plateau: only the exact scan is honest
    assert f(0.955) is None
    assert f(0.97) is None
    assert f(1.0) is None


def test_min_recall_maps_to_nprobe(tmp_path, monkeypatch):
    monkeypatch.delenv("SEMA_TPU_IVF_NPROBE", raising=False)
    s = VectorStore(tmp_path, dim=32, model="t", ivf=True,
                    ivf_nprobe=8, ivf_min_recall=0.945)
    assert s.ivf_nprobe == 64 and not s._ivf_route_exact
    s.close()


def test_min_recall_never_lowers_nprobe(tmp_path, monkeypatch):
    monkeypatch.delenv("SEMA_TPU_IVF_NPROBE", raising=False)
    s = VectorStore(tmp_path, dim=32, model="t", ivf=True,
                    ivf_nprobe=128, ivf_min_recall=0.9)
    assert s.ivf_nprobe == 128  # the explicit wider probe wins
    s.close()


def test_min_recall_above_plateau_routes_exact(tmp_path, monkeypatch):
    monkeypatch.delenv("SEMA_TPU_IVF_NPROBE", raising=False)
    s = VectorStore(tmp_path, dim=32, model="t", ivf=True,
                    ivf_min_recall=1.0)
    assert s._ivf_route_exact
    s.close()


def test_explicit_nprobe_env_overrides_mapping(tmp_path, monkeypatch):
    monkeypatch.setenv("SEMA_TPU_IVF_NPROBE", "4")
    s = VectorStore(tmp_path, dim=32, model="t", ivf=True,
                    ivf_min_recall=0.945)
    assert s.ivf_nprobe == 4  # expert override beats the contract map
    s.close()


def test_min_recall_env(tmp_path, monkeypatch):
    monkeypatch.delenv("SEMA_TPU_IVF_NPROBE", raising=False)
    monkeypatch.setenv("SEMA_TPU_IVF_MIN_RECALL", "0.99")
    s = VectorStore(tmp_path, dim=32, model="t", ivf=True)
    assert s._ivf_route_exact
    s.close()


def test_min_recall_noop_without_ivf(tmp_path):
    s = VectorStore(tmp_path, dim=32, model="t", ivf_min_recall=1.0)
    assert not s._ivf_route_exact  # non-IVF scans are already exact
    s.close()


# ---------------------------------------------------------------------------
# per-query routing on the store
# ---------------------------------------------------------------------------

def _spy(monkeypatch, obj, name):
    calls = []
    orig = getattr(obj, name)

    def wrapper(*a, **kw):
        calls.append(1)
        return orig(*a, **kw)
    monkeypatch.setattr(obj, name, wrapper)
    return calls


def test_search_exact_bypasses_ivf_dispatch(tmp_path, ivf_env,
                                            monkeypatch):
    store = VectorStore(tmp_path, dim=128, model="t", ivf=True)
    cs, vecs = chunks_and_vecs(300, seed=3)
    store.add_chunks(cs, vecs)
    assert any(b.get("ivf") is not None for b in store.device_buckets())
    calls = _spy(monkeypatch, store, "_ivf_dispatch")

    q = vecs[:8]
    s_pruned, _ = store.search_batch(q, 5)
    assert calls, "pruned path should engage IVF dispatch"
    n_pruned = len(calls)

    s_exact, i_exact = store.search_batch(q, 5, exact=True)
    assert len(calls) == n_pruned, \
        "exact=True must not touch the IVF dispatch"
    # exact routing IS the oracle: recall 1.0 by construction
    oracle = (q @ vecs.T)
    top1 = oracle.argmax(axis=1)
    np.testing.assert_array_equal(i_exact[:, 0], top1)

    # single-query form
    res = store.search(vecs[42], k=3, exact=True)
    assert res[0][0].id == "f.txt:42"
    assert len(calls) == n_pruned
    store.close()


def test_route_exact_store_never_prunes(tmp_path, ivf_env, monkeypatch):
    monkeypatch.setenv("SEMA_TPU_IVF_MIN_RECALL", "0.99")
    store = VectorStore(tmp_path, dim=128, model="t", ivf=True)
    cs, vecs = chunks_and_vecs(300, seed=4)
    store.add_chunks(cs, vecs)
    # clustering still happens at seal (the knob can relax w/o rebuild)
    assert any(b.get("ivf") is not None for b in store.device_buckets())
    calls = _spy(monkeypatch, store, "_ivf_dispatch")
    res = store.search(vecs[7], k=3)
    assert not calls
    assert res[0][0].id == "f.txt:7"
    store.close()


@pytest.fixture()
def spill_ivf_env(monkeypatch):
    monkeypatch.setenv("SEMA_TPU_SCAN_BACKEND", "pallas")
    monkeypatch.setattr(VectorStore, "SEAL_ROWS", 512)
    monkeypatch.setattr(VectorStore, "IVF_TILE", 128)
    monkeypatch.setattr(VectorStore, "IVF_CLUSTER_ROWS", 128)
    monkeypatch.setattr(VectorStore, "IVF_BUDGET_DIV", 2)
    monkeypatch.setenv("SEMA_TPU_IVF_NPROBE", "2")
    monkeypatch.setenv("SEMA_TPU_HBM_BUDGET_MB", "0.000001")


def test_spilled_exact_streams_whole_bucket(tmp_path, spill_ivf_env,
                                            monkeypatch):
    store = VectorStore(tmp_path, dim=128, model="t", ivf=True)
    cs, vecs = chunks_and_vecs(600, seed=5)
    store.add_chunks(cs, vecs)
    assert any(b.get("host_resident") and b.get("ivf_spill") is not None
               for b in store.device_buckets()), "spilled IVF expected"
    calls = _spy(monkeypatch, store, "_ivf_spill_dispatch")

    q = vecs[:4]
    _, i_exact = store.search_batch(q, 3, exact=True)
    assert not calls, "exact=True must not engage the spill probe"
    oracle_top1 = (q @ vecs.T).argmax(axis=1)
    np.testing.assert_array_equal(i_exact[:, 0], oracle_top1)

    store.search_batch(q, 3)
    assert calls, "pruned path should engage the spill probe"
    store.close()


# ---------------------------------------------------------------------------
# batcher partition + plumbing
# ---------------------------------------------------------------------------

def test_batcher_partitions_exact(tmp_path, ivf_env, monkeypatch):
    from sema_tpu.search.server import QueryBatcher

    store = VectorStore(tmp_path, dim=128, model="t", ivf=True)
    cs, vecs = chunks_and_vecs(300, seed=6)
    store.add_chunks(cs, vecs)

    seen_exact = []
    orig = store.search_batch_async

    def spy(q, k, live=None, exact=False):
        seen_exact.append(exact)
        return orig(q, k, live=live, exact=exact)
    monkeypatch.setattr(store, "search_batch_async", spy)

    # wide max_wait so the mixed requests coalesce into ONE drain window
    b = QueryBatcher(store, max_batch=8, max_wait_ms=50)
    results = {}

    def worker(i, exact):
        results[(i, exact)] = b.search(vecs[i], k=1, exact=exact)

    try:
        threads = [threading.Thread(target=worker, args=(i, bool(i % 2)))
                   for i in range(6)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=30)
        assert len(results) == 6
        for (i, _), res in results.items():
            assert res[0][0].id == f"f.txt:{i}"
        # both routes dispatched, as separate device batches
        assert True in seen_exact and False in seen_exact
    finally:
        b.close()
        store.close()


def test_config_toml_min_recall():
    from sema_tpu.config import loads_toml
    cfg = loads_toml("[index]\nivf = true\nivf_min_recall = 0.95\n")
    assert cfg.index.ivf_min_recall == 0.95


def test_manager_search_exact_plumbs(tmp_path, ivf_env, monkeypatch):
    from sema_tpu.index.manager import IndexManager

    class StubSpec:
        dim = 128
        name = "stub"

    class StubEncoder:
        spec = StubSpec()

        def __init__(self, vecs):
            self.vecs = vecs

        def encode_query(self, q):
            return self.vecs[int(q)]

    cs, vecs = chunks_and_vecs(300, seed=7)
    mgr = IndexManager(tmp_path, StubEncoder(vecs), ivf=True)
    mgr.vector_store.add_chunks(cs, vecs)
    calls = _spy(monkeypatch, mgr.vector_store, "_ivf_dispatch")
    res = mgr.search("42", 3, exact=True)
    assert not calls
    assert res[0][0].id == "f.txt:42"
    res = mgr.search("42", 3)
    assert calls
    assert res and res[0][0].id == "f.txt:42"
    mgr.close()

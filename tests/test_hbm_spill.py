"""HBM spill: stores larger than the device-bucket byte budget keep
their sealed buckets HOST-resident and stream them through the scan in
fixed-shape slices (vector_store._scan_host_bucket). The reference's
disk-based store (LanceDB, src/storage/lance_indexer.rs) has no hard
corpus ceiling; these tests pin the same property for the device store:
results stay EXACT (vs a brute-force oracle) whether buckets live in
HBM, on the host, or mixed — including tombstones, int8 rescore, and
appends landing after the spill point."""

from pathlib import Path

import numpy as np
import pytest

from sema_tpu.index.vector_store import VectorStore
from sema_tpu.types import Chunk


def chunks_and_vecs(n, d=32, path="f.txt", seed=0, start=0):
    rng = np.random.default_rng(seed)
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    cs = [Chunk(id=f"{path}:{start + i}", file_path=Path(path),
                start_line=i + 1, end_line=i + 2,
                content=f"content {start + i}")
          for i in range(n)]
    return cs, vecs


def oracle_topk(store_vecs, dead_rows, q, k):
    scores = store_vecs @ q
    scores[list(dead_rows)] = -np.inf
    order = np.argsort(-scores, kind="stable")[:k]
    return scores[order], order


@pytest.fixture
def spill_env(monkeypatch):
    """Tiny budget: EVERY sealed bucket spills to host; buckets and
    slices are small enough that one test store exercises multiple
    buckets × multiple slices (incl. a partial tail slice)."""
    monkeypatch.setattr(VectorStore, "SEAL_ROWS", 64)
    monkeypatch.setattr(VectorStore, "SPILL_SLICE_ROWS", 96)  # pads→128
    monkeypatch.setenv("SEMA_TPU_HBM_BUDGET_MB", "0.000001")


def make_store(tmp_path, d=32, **kw):
    # float32 store: the numpy oracle is then bit-exact (no bf16 noise)
    return VectorStore(tmp_path, dim=d, model="test-tiny",
                       store_dtype=kw.pop("store_dtype", "float32"), **kw)


def test_all_buckets_spill_exact_parity(tmp_path, spill_env):
    store = make_store(tmp_path)
    all_vecs = []
    for i in range(5):
        cs, v = chunks_and_vecs(64, path=f"f{i}.txt", seed=i)
        store.add_chunks(cs, v)
        all_vecs.append(v)
    buckets = store.device_buckets()
    assert buckets and all(b.get("host_resident") for b in buckets)
    assert all(b["store"] is None for b in buckets)

    mat = np.concatenate(all_vecs)
    rng = np.random.default_rng(99)
    qs = rng.standard_normal((7, 32)).astype(np.float32)
    scores, ids = store.search_batch(qs, k=5)
    for qi in range(len(qs)):
        o_s, o_i = oracle_topk(mat, [], qs[qi], 5)
        np.testing.assert_array_equal(ids[qi], o_i)
        np.testing.assert_allclose(scores[qi], o_s, rtol=1e-5)


def test_multi_slice_bucket_with_partial_tail(tmp_path, spill_env):
    """One 300-row segment → one spilled bucket → slices of 128 rows:
    [0,128) [128,256) [256,300) — the last one partially filled."""
    store = make_store(tmp_path)
    cs, v = chunks_and_vecs(300, seed=3)
    store.add_chunks(cs, v)
    [b] = store.device_buckets()
    assert b.get("host_resident") and b["rows"] == 300

    q = v[271]  # lives in the partial tail slice
    results = store.search(q, k=3)
    assert results[0][0].id == "f.txt:271"
    assert results[0][1] == pytest.approx(1.0, abs=1e-5)


def test_mixed_device_and_host_buckets(tmp_path, spill_env, monkeypatch):
    """Budget sized for exactly one sealed bucket on device: the rest
    spill, and the merge combines both kinds."""
    # one sealed bucket: _pad_rows(64)=128 rows × 32 d × 4 B = 16 KiB
    monkeypatch.setenv("SEMA_TPU_HBM_BUDGET_MB", "0.02")
    store = make_store(tmp_path)
    all_vecs = []
    for i in range(3):
        cs, v = chunks_and_vecs(64, path=f"f{i}.txt", seed=10 + i)
        store.add_chunks(cs, v)
        all_vecs.append(v)
    buckets = store.device_buckets()
    kinds = [bool(b.get("host_resident")) for b in buckets]
    assert kinds == [False, True, True]

    mat = np.concatenate(all_vecs)
    rng = np.random.default_rng(5)
    qs = rng.standard_normal((4, 32)).astype(np.float32)
    scores, ids = store.search_batch(qs, k=4)
    for qi in range(len(qs)):
        o_s, o_i = oracle_topk(mat, [], qs[qi], 4)
        np.testing.assert_array_equal(ids[qi], o_i)


def test_spill_sees_fresh_tombstones(tmp_path, spill_env):
    """Host buckets rebuild validity per slice at scan time — a delete
    that lands after the bucket was built must mask its rows with no
    device mask re-upload."""
    store = make_store(tmp_path)
    cs0, v0 = chunks_and_vecs(64, path="dead.txt", seed=20)
    cs1, v1 = chunks_and_vecs(64, path="live.txt", seed=21)
    store.add_chunks(cs0, v0)
    store.add_chunks(cs1, v1)
    store.device_buckets()            # spill happens here
    assert store.remove_file_chunks(Path("dead.txt")) == 64

    q = v0[7]                          # its exact row is tombstoned
    scores, ids = store.search_batch(q[None, :], k=3)
    assert all(i >= 64 for i in ids[0])       # only live.txt rows
    mat = np.concatenate([v0, v1])
    o_s, o_i = oracle_topk(mat, range(64), q, 3)
    np.testing.assert_array_equal(ids[0], o_i)


def test_append_after_spill(tmp_path, spill_env):
    """New rows after the spill point land in a DEVICE tail bucket; the
    merge spans spilled + device buckets and finds them."""
    store = make_store(tmp_path)
    cs, v = chunks_and_vecs(64, path="old.txt", seed=30)
    store.add_chunks(cs, v)
    store.device_buckets()
    cs2, v2 = chunks_and_vecs(8, path="new.txt", seed=31)
    store.add_chunks(cs2, v2)
    buckets = store.device_buckets()
    assert [bool(b.get("host_resident")) for b in buckets] == [True, False]

    results = store.search(v2[3], k=1)
    assert results[0][0].id == "new.txt:3"
    results = store.search(v[5], k=1)
    assert results[0][0].id == "old.txt:5"


def test_spill_int8_scans_bf16_originals(tmp_path, spill_env):
    """An int8 store's spilled slices stream the bf16 disk originals
    (full-precision candidate selection) and still go through the exact
    rescore — ids must match the full-precision oracle."""
    store = make_store(tmp_path, store_dtype="int8")
    all_vecs = []
    for i in range(2):
        cs, v = chunks_and_vecs(64, path=f"f{i}.txt", seed=40 + i)
        store.add_chunks(cs, v)
        all_vecs.append(v)
    assert all(b.get("host_resident") for b in store.device_buckets())

    mat = np.concatenate(all_vecs).astype(np.float32)
    # the disk originals are bf16 — round the oracle matrix the same way
    import ml_dtypes
    mat = mat.astype(ml_dtypes.bfloat16).astype(np.float32)
    rng = np.random.default_rng(8)
    qs = rng.standard_normal((3, 32)).astype(np.float32)
    scores, ids = store.search_batch(qs, k=5)
    for qi in range(len(qs)):
        o_s, o_i = oracle_topk(mat, [], qs[qi], 5)
        np.testing.assert_array_equal(ids[qi], o_i)
        np.testing.assert_allclose(scores[qi], o_s, rtol=1e-2)


def test_oom_fallback_spills(tmp_path, monkeypatch):
    """A RESOURCE_EXHAUSTED from XLA during a sealed bucket's upload
    degrades to a host bucket instead of crashing (no budget set)."""
    monkeypatch.setattr(VectorStore, "SEAL_ROWS", 64)
    monkeypatch.setattr(VectorStore, "SPILL_SLICE_ROWS", 96)
    monkeypatch.delenv("SEMA_TPU_HBM_BUDGET_MB", raising=False)
    store = make_store(tmp_path)
    orig = store._build_bucket

    def exploding(seg_range, row_offset, sealed, min_capacity_rows=0):
        if sealed:
            raise RuntimeError(
                "RESOURCE_EXHAUSTED: Out of memory allocating x bytes")
        return orig(seg_range, row_offset, sealed,
                    min_capacity_rows=min_capacity_rows)

    monkeypatch.setattr(store, "_build_bucket", exploding)
    cs, v = chunks_and_vecs(64, seed=50)
    store.add_chunks(cs, v)
    [b] = store.device_buckets()
    assert b.get("host_resident")
    results = store.search(v[10], k=1)
    assert results[0][0].id == "f.txt:10"


def test_persistence_roundtrip_with_spill(tmp_path, spill_env):
    """Spill is a scan-time policy, not an on-disk state: reopening the
    store (same budget) rebuilds host buckets and results are intact."""
    store = make_store(tmp_path)
    cs, v = chunks_and_vecs(128, seed=60)
    store.add_chunks(cs, v)
    store.close()

    store2 = make_store(tmp_path)
    assert all(b.get("host_resident")
               for b in store2.device_buckets())
    results = store2.search(v[100], k=1)
    assert results[0][0].id == "f.txt:100"
    store2.close()


def test_query_batcher_over_spilled_store(tmp_path, spill_env):
    """Serving integration: the QueryBatcher's dispatch/completion
    pipeline must work when search_batch_async blocks to stream spilled
    buckets (concurrent callers, exact winners, clean close)."""
    import threading
    from sema_tpu.search.server import QueryBatcher

    store = make_store(tmp_path)
    vecs_all = []
    for i in range(3):
        cs, v = chunks_and_vecs(64, path=f"f{i}.txt", seed=70 + i)
        store.add_chunks(cs, v)
        vecs_all.append(v)
    assert all(b.get("host_resident") for b in store.device_buckets())
    vecs = np.concatenate(vecs_all)

    b = QueryBatcher(store, max_batch=8, max_wait_ms=5)
    results, errors = {}, []

    def worker(i):
        try:
            results[i] = b.search(vecs[i * 7], k=1)
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    threads = [threading.Thread(target=worker, args=(i,))
               for i in range(24)]
    try:
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=60)
        assert not errors
        assert len(results) == 24
        for i, res in results.items():
            row = i * 7
            fi, local = divmod(row, 64)
            assert res[0][0].id == f"f{fi}.txt:{local}"
    finally:
        b.close()


def test_constructor_budget_knob(tmp_path, monkeypatch):
    """[index] hbm_budget_mb flows through IndexManager/VectorStore and
    forces spill without any env var; the env var still overrides."""
    monkeypatch.setattr(VectorStore, "SEAL_ROWS", 64)
    monkeypatch.setattr(VectorStore, "SPILL_SLICE_ROWS", 96)
    monkeypatch.delenv("SEMA_TPU_HBM_BUDGET_MB", raising=False)
    store = VectorStore(tmp_path, dim=32, model="test-tiny",
                        store_dtype="float32", hbm_budget_mb=1e-6)
    cs, v = chunks_and_vecs(64, seed=80)
    store.add_chunks(cs, v)
    [b] = store.device_buckets()
    assert b.get("host_resident")
    assert store.search(v[9], k=1)[0][0].id == "f.txt:9"
    # env override wins over the constructor knob
    monkeypatch.setenv("SEMA_TPU_HBM_BUDGET_MB", "1024")
    store._invalidate_device()
    [b2] = store.device_buckets()
    assert not b2.get("host_resident")


def test_config_roundtrip_budget(tmp_path):
    from sema_tpu.config import Config, dumps_toml, loads_toml
    c = Config()
    assert c.index.hbm_budget_mb == 0.0
    c.index.hbm_budget_mb = 12288.0
    c2 = loads_toml(dumps_toml(c))
    assert c2.index.hbm_budget_mb == 12288.0


def test_concurrent_deletes_during_spilled_search(tmp_path, spill_env):
    """remove_file_chunks mutates seg.deleted (a set) while spilled
    scans read tombstones lock-free; the scan must snapshot them under
    the lock (_deleted_snapshot) — iterating the live set races with
    the mutator ("set changed size during iteration")."""
    import threading

    store = make_store(tmp_path)
    for i in range(4):
        cs, v = chunks_and_vecs(64, path=f"f{i}.txt", seed=90 + i)
        # one file per row so deletes trickle one tombstone at a time
        for c in cs:
            c.file_path = Path(f"f{i}_{c.start_line}.txt")
        store.add_chunks(cs, v)
    assert all(b.get("host_resident") for b in store.device_buckets())

    errors = []
    stop = threading.Event()

    def deleter():
        try:
            for i in range(4):
                for ln in range(1, 65):
                    store.remove_file_chunks(Path(f"f{i}_{ln}.txt"))
        except Exception as e:  # noqa: BLE001
            errors.append(e)
        finally:
            stop.set()

    t = threading.Thread(target=deleter)
    t.start()
    rng = np.random.default_rng(1)
    try:
        while not stop.is_set():
            q = rng.standard_normal(32).astype(np.float32)
            store.search_batch(q[None, :], k=5)
    finally:
        t.join(timeout=30)
    assert not errors
    # everything deleted: the store must return no finite hits
    scores, ids = store.search_batch(
        rng.standard_normal((1, 32)).astype(np.float32), k=5)
    assert not np.isfinite(scores).any()


def test_spill_staging_window_is_global(tmp_path, spill_env):
    """Bulk builds split spilled buckets at SEAL_ROWS ≈ one slice each;
    the SPILL_INFLIGHT staging bound must therefore span ALL spilled
    buckets of one search — after search_batch_async returns, at most
    SPILL_INFLIGHT slices may still be un-fetched device arrays."""
    store = make_store(tmp_path)
    all_vecs = []
    for i in range(6):
        cs, v = chunks_and_vecs(64, path=f"f{i}.txt", seed=100 + i)
        store.add_chunks(cs, v)
        all_vecs.append(v)
    assert all(b.get("host_resident") for b in store.device_buckets())

    qs = np.random.default_rng(2).standard_normal(
        (3, 32)).astype(np.float32)
    handle = store.search_batch_async(qs, k=4)
    pending = handle[3]
    assert len(pending) >= 6
    n_device = sum(1 for e in pending
                   if not isinstance(e[1], np.ndarray))
    assert n_device <= VectorStore.SPILL_INFLIGHT

    scores, ids = store.search_batch_finish(handle, qs)
    mat = np.concatenate(all_vecs)
    for qi in range(len(qs)):
        o_s, o_i = oracle_topk(mat, [], qs[qi], 4)
        np.testing.assert_array_equal(ids[qi], o_i)


def test_device_residency_stats(tmp_path, spill_env):
    """device_residency() reports spill state without forcing a cold
    full-store upload (the bucket list is peeked, not built)."""
    store = make_store(tmp_path)
    cs, v = chunks_and_vecs(128, seed=110)
    store.add_chunks(cs, v)
    r0 = store.device_residency()
    assert r0 == {"buckets": 0, "host_buckets": 0, "spilled_rows": 0,
                  "device_bytes": 0, "busy": False}  # nothing built yet
    store.search(v[0], k=1)                     # builds (and spills)
    r1 = store.device_residency()
    assert r1["buckets"] == 1 and r1["host_buckets"] == 1
    assert r1["spilled_rows"] == 128 and r1["device_bytes"] == 0


def test_consolidation_respects_budget(tmp_path, monkeypatch):
    """Review finding: tail consolidation used to bypass the budget —
    an over-budget store could OOM mid-serve when >MAX_TAIL_BUCKETS
    unsealed buckets merged into one sealing-size DEVICE bucket. The
    merged bucket must obey the same spill policy."""
    monkeypatch.setattr(VectorStore, "SEAL_ROWS", 256)
    monkeypatch.setattr(VectorStore, "SPILL_SLICE_ROWS", 96)
    monkeypatch.setattr(VectorStore, "MAX_TAIL_BUCKETS", 2)
    monkeypatch.setenv("SEMA_TPU_HBM_BUDGET_MB", "0.000001")
    store = make_store(tmp_path)
    all_vecs = []
    for i in range(5):
        # 100-row appends: the arena (pad 256) absorbs one extension
        # then overflows, so unsealed device buckets accumulate (200,
        # 200, 100) until consolidation merges 500 rows (>= SEAL_ROWS
        # -> sealed -> must spill under the tiny budget)
        cs, v = chunks_and_vecs(100, path=f"f{i}.txt", seed=120 + i)
        store.add_chunks(cs, v)
        all_vecs.append(v)
        store.device_buckets()
    buckets = store.device_buckets()
    sealed = [b for b in buckets if b["sealed"]]
    assert sealed and all(b.get("host_resident") for b in sealed)

    mat = np.concatenate(all_vecs)
    q = mat[377]
    scores, ids = store.search_batch(q[None, :], k=3)
    o_s, o_i = oracle_topk(mat, [], q, 3)
    np.testing.assert_array_equal(ids[0], o_i)


def test_residency_nonblocking_when_lock_held(tmp_path):
    """Review finding: /healthz must not hang behind a mutator holding
    the store lock (a cold multi-GB build can hold it for minutes)."""
    import threading

    store = make_store(tmp_path)
    cs, v = chunks_and_vecs(16, seed=130)
    store.add_chunks(cs, v)
    acquired = threading.Event()
    release = threading.Event()

    def holder():
        with store._lock:
            acquired.set()
            release.wait(timeout=10)

    t = threading.Thread(target=holder)
    t.start()
    try:
        assert acquired.wait(timeout=5)
        r = store.device_residency()
        assert r["busy"] is True and r["buckets"] is None
    finally:
        release.set()
        t.join(timeout=5)
    r = store.device_residency()
    assert r["busy"] is False


def test_malformed_env_budget_falls_through(tmp_path, monkeypatch,
                                            capsys):
    """Review finding: SEMA_TPU_HBM_BUDGET_MB='2GB' (unparseable) must
    warn and fall through to the config knob, not silently disable the
    budget."""
    monkeypatch.setattr(VectorStore, "SEAL_ROWS", 64)
    monkeypatch.setattr(VectorStore, "SPILL_SLICE_ROWS", 96)
    monkeypatch.setenv("SEMA_TPU_HBM_BUDGET_MB", "2GB")
    store = VectorStore(tmp_path, dim=32, model="test-tiny",
                        store_dtype="float32", hbm_budget_mb=1e-6)
    cs, v = chunks_and_vecs(64, seed=140)
    store.add_chunks(cs, v)
    [b] = store.device_buckets()
    assert b.get("host_resident")    # the knob still applied
    assert "malformed" in capsys.readouterr().err


def test_int8_admission_charges_bf16_transient(tmp_path):
    """Review finding: an int8 bucket build stages bf16 rows on device
    before quantizing — budget admission must charge that transient
    (2x dim bytes), not just the steady int8+scales footprint."""
    store = make_store(tmp_path, store_dtype="int8")
    steady = store._bucket_dev_bytes(1024)
    transient = store._bucket_dev_bytes(1024, transient=True)
    assert steady == 1024 * (32 + 4)
    assert transient == 1024 * 32 * 2 > steady


def test_manager_end_to_end_with_spill(tmp_path, spill_env):
    """Full IndexManager path (encode -> dual index -> search dispatch)
    over a spilled store: the config knob flows through make-manager
    glue, semantic search streams host buckets, keyword search is
    untouched, and incremental re-index still works."""
    import numpy as np
    from sema_tpu.index.manager import IndexManager

    class StubEncoder:
        class spec:
            dim = 32
            name = "test-tiny"

        def encode_texts(self, texts, progress=None):
            rng = np.random.default_rng(
                [len(t) for t in texts] or [1])
            v = rng.standard_normal((len(texts), 32)).astype(np.float32)
            v /= np.linalg.norm(v, axis=1, keepdims=True)
            return v

        def encode_query(self, text):
            return self.encode_texts([text])[0]

    mgr = IndexManager(tmp_path, StubEncoder(), store_dtype="float32",
                       hbm_budget_mb=1e-6)
    chunks = [Chunk(id=f"f{i // 64}.txt:{i}",
                    file_path=Path(f"f{i // 64}.txt"),
                    start_line=1, end_line=2,
                    content=f"chunk body number {i}")
              for i in range(192)]
    mgr.index_chunks(chunks)
    assert all(b.get("host_resident")
               for b in mgr.vector_store.device_buckets())

    # semantic search over the spilled store returns ranked chunks
    hits = mgr.search("chunk body number 7", limit=5)
    assert len(hits) == 5 and all(np.isfinite(s) for _, s in hits)
    # keyword dispatch unaffected
    khits = mgr.search("'number AND 190", limit=5)
    assert [c.id for c, _ in khits] == ["f2.txt:190"]

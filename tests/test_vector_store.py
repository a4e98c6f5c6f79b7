"""Device vector store: segments, tombstones, compaction, persistence,
mesh sharding (runs on the 8-device virtual CPU mesh)."""

from pathlib import Path

import numpy as np
import pytest

import jax

from sema_tpu.index.vector_store import VectorStore
from sema_tpu.parallel import make_mesh
from sema_tpu.types import Chunk


def chunks_and_vecs(n, d=32, path="f.txt", seed=0, start=0):
    rng = np.random.default_rng(seed)
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    cs = [Chunk(id=f"{path}:{start + i}", file_path=Path(path),
                start_line=i + 1, end_line=i + 2, content=f"content {start + i}")
          for i in range(n)]
    return cs, vecs


def make_store(tmp_path, d=32, **kw):
    return VectorStore(tmp_path, dim=d, model="test-tiny", **kw)


def test_seal_rows_env_override(tmp_path, monkeypatch):
    """SEMA_TPU_SEAL_ROWS lets rehearsals engage sealing at small scale;
    malformed values warn and keep the class default."""
    monkeypatch.setenv("SEMA_TPU_SEAL_ROWS", "4096")
    store = make_store(tmp_path / "a")
    assert store.SEAL_ROWS == 4096
    assert VectorStore.SEAL_ROWS == 262_144  # class constant untouched
    monkeypatch.setenv("SEMA_TPU_SEAL_ROWS", "2GB")
    store2 = make_store(tmp_path / "b")
    assert store2.SEAL_ROWS == 262_144


def test_add_and_search_exact(tmp_path):
    store = make_store(tmp_path)
    cs, vecs = chunks_and_vecs(100)
    store.add_chunks(cs, vecs)
    q = vecs[42]
    results = store.search(q, k=5)
    assert results[0][0].id == "f.txt:42"
    assert results[0][1] == pytest.approx(1.0, abs=1e-2)  # bf16 store
    assert len(results) == 5


def test_multiple_segments(tmp_path):
    store = make_store(tmp_path)
    cs1, v1 = chunks_and_vecs(60, path="a.txt", seed=1)
    cs2, v2 = chunks_and_vecs(40, path="b.txt", seed=2)
    store.add_chunks(cs1, v1)
    store.add_chunks(cs2, v2)
    assert store.total_rows == 100
    # search for a vector in the second segment
    results = store.search(v2[10], k=1)
    assert results[0][0].id == "b.txt:10"


def test_orphan_segments_swept_at_load(tmp_path):
    """A crash between a segment write and its manifest commit leaves
    orphan seg-* files; load must converge to exactly the committed
    state and reclaim the disk (the manifest is the commit point)."""
    store = make_store(tmp_path)
    cs, vecs = chunks_and_vecs(40)
    store.add_chunks(cs, vecs)
    manifest = (store.dir / "manifest.json").read_text()
    cs2, v2 = chunks_and_vecs(30, path="g.txt", seed=9)
    store.add_chunks(cs2, v2)
    store.close()
    # simulate the crash: the second segment's files are on disk but the
    # manifest still reflects only the first commit
    (store.dir / "manifest.json").write_text(manifest)
    orphans = {p.name for p in store.dir.glob("seg-000001*")}
    assert orphans  # the uncommitted segment's files exist pre-load
    # the sweep is age-gated: a FRESH uncommitted file may be a
    # concurrent writer's in-flight append and must survive a reader's
    # load untouched
    reader = make_store(tmp_path)
    reader.close()
    assert {p.name for p in store.dir.glob("seg-000001*")} == orphans
    # age the leftovers past the gate — now they are crash debris
    import os as _os
    for p in store.dir.glob("seg-000001*"):
        _os.utime(p, (1, 1))

    store2 = make_store(tmp_path)
    assert store2.total_rows == 40
    left = {p.name for p in store2.dir.glob("seg-*")}
    assert not (left & orphans)          # swept
    # committed data intact, and a fresh append reuses the slot cleanly
    store2.add_chunks(cs2, v2)
    assert store2.search(v2[4], k=1)[0][0].id == "g.txt:4"
    assert store2.search(vecs[7], k=1)[0][0].id == "f.txt:7"


def test_persistence_roundtrip(tmp_path):
    store = make_store(tmp_path)
    cs, vecs = chunks_and_vecs(50)
    store.add_chunks(cs, vecs)
    store.update_file_hash(Path("f.txt"), "abc123")
    store.close()

    store2 = make_store(tmp_path)
    assert store2.total_rows == 50
    assert store2.get_file_hash(Path("f.txt")) == "abc123"
    results = store2.search(vecs[7], k=1)
    assert results[0][0].id == "f.txt:7"
    assert results[0][0].content == "content 7"


def test_remove_file_chunks_tombstones(tmp_path):
    store = make_store(tmp_path)
    cs1, v1 = chunks_and_vecs(30, path="a.txt", seed=1)
    cs2, v2 = chunks_and_vecs(30, path="b.txt", seed=2)
    store.add_chunks(cs1, v1)
    store.add_chunks(cs2, v2)
    removed = store.remove_file_chunks(Path("a.txt"))
    assert removed == 30
    assert store.live_rows == 30
    results = store.search(v1[5], k=3)
    assert all(str(r[0].file_path) == "b.txt" for r in results)


def test_model_mismatch_raises(tmp_path):
    store = make_store(tmp_path)
    cs, vecs = chunks_and_vecs(10)
    store.add_chunks(cs, vecs)
    store.close()
    with pytest.raises(ValueError, match="Re-index"):
        VectorStore(tmp_path, dim=32, model="other-model")


def test_compaction_on_load(tmp_path):
    store = make_store(tmp_path)
    cs1, v1 = chunks_and_vecs(80, path="a.txt", seed=1)
    cs2, v2 = chunks_and_vecs(20, path="b.txt", seed=2)
    store.add_chunks(cs1, v1)
    store.add_chunks(cs2, v2)
    store.remove_file_chunks(Path("a.txt"))  # 80% dead
    store.close()

    store2 = make_store(tmp_path)
    assert store2.total_rows == 20           # compacted
    assert store2.live_rows == 20
    assert len(store2.segments) == 1
    results = store2.search(v2[3], k=1)
    assert results[0][0].id == "b.txt:3"
    # dead segment files unlinked
    bins = list((Path(tmp_path) / "vector_index").glob("seg-*.bin"))
    assert len(bins) == 1


def test_search_empty_store(tmp_path):
    store = make_store(tmp_path)
    assert store.search(np.ones(32, np.float32), k=5) == []


def test_k_larger_than_store(tmp_path):
    store = make_store(tmp_path)
    cs, vecs = chunks_and_vecs(3)
    store.add_chunks(cs, vecs)
    results = store.search(vecs[0], k=50)
    assert len(results) == 3  # padding rows filtered


def test_search_then_append_then_search(tmp_path):
    """Regression (advisor r1, high): tail-only device invalidation after
    add_chunks left a bucket list that no longer covered the new segments;
    the follow-up search crashed (empty bucket list) or silently missed the
    freshly-added rows — the streaming re-index-while-serving path."""
    store = make_store(tmp_path)
    cs1, v1 = chunks_and_vecs(20, path="a.txt", seed=1)
    store.add_chunks(cs1, v1)
    assert store.search(v1[3], k=1)[0][0].id == "a.txt:3"
    cs2, v2 = chunks_and_vecs(20, path="b.txt", seed=2)
    store.add_chunks(cs2, v2)        # drops the (unsealed) tail bucket
    res = store.search(v2[7], k=1)   # must cover the new segment
    assert res[0][0].id == "b.txt:7"
    buckets = store.device_buckets()
    assert buckets and buckets[-1]["seg_range"][1] == len(store.segments)


def test_k_class_sharing_boundary(tmp_path):
    """k values map onto the (16, 64, 128, 1024) class ladder; callers
    within a class share one compiled scan."""
    store = make_store(tmp_path)
    cs, vecs = chunks_and_vecs(300)
    store.add_chunks(cs, vecs)
    store.search(vecs[0], k=17)
    store.search(vecs[0], k=64)      # same class (64) — no new compile
    assert len(store._topk_fns) == 1
    store.search(vecs[0], k=65)      # crosses into class 128
    assert len(store._topk_fns) == 2


def test_incremental_reindex_flow(tmp_path):
    """delete-then-reindex keeps ids coherent (storage/mod.rs:42-47)."""
    store = make_store(tmp_path)
    cs, vecs = chunks_and_vecs(10, path="f.txt")
    store.add_chunks(cs, vecs)
    store.remove_file_chunks(Path("f.txt"))
    cs2, vecs2 = chunks_and_vecs(12, path="f.txt", seed=9)
    store.add_chunks(cs2, vecs2)
    assert store.live_rows == 12
    results = store.search(vecs2[11], k=1)
    assert results[0][0].id == "f.txt:11"


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
def test_mesh_sharded_store(tmp_path):
    mesh = make_mesh()
    store = make_store(tmp_path, mesh=mesh)
    cs, vecs = chunks_and_vecs(500)
    store.add_chunks(cs, vecs)
    results = store.search(vecs[123], k=5)
    assert results[0][0].id == "f.txt:123"
    # device store must actually be sharded over the index axis
    dev_store, _ = store.device_arrays()
    assert len(dev_store.sharding.device_set) == 8


class TestPallasBackendSelection:
    """SEMA_TPU_SCAN_BACKEND=pallas runs the fused kernel (interpret mode
    off-TPU) — single-device, int8, and as local_fn under the shard_map
    merge — with results matching the default backend (VERDICT r1 #4)."""

    def _results(self, tmp_path, monkeypatch, backend, n=300, **kw):
        if backend:
            monkeypatch.setenv("SEMA_TPU_SCAN_BACKEND", backend)
        else:
            monkeypatch.delenv("SEMA_TPU_SCAN_BACKEND", raising=False)
        store = make_store(tmp_path / (backend or "auto"), **kw)
        cs, vecs = chunks_and_vecs(n)
        store.add_chunks(cs, vecs)
        out = [store.search(vecs[i], k=5) for i in (0, 123, 299)]
        return [[(c.id, round(s, 3)) for c, s in r] for r in out]

    def test_single_device_parity(self, tmp_path, monkeypatch):
        a = self._results(tmp_path, monkeypatch, "pallas")
        b = self._results(tmp_path, monkeypatch, "hier")
        assert a == b
        assert a[0][0][0] == "f.txt:0"

    def test_int8_parity(self, tmp_path, monkeypatch):
        a = self._results(tmp_path, monkeypatch, "pallas",
                          store_dtype="int8")
        b = self._results(tmp_path, monkeypatch, "hier",
                          store_dtype="int8")
        assert a == b  # rescore is full-precision in both paths
        assert a[1][0][0] == "f.txt:123"

    @pytest.mark.skipif(jax.device_count() < 8,
                        reason="needs 8 virtual devices")
    def test_mesh_sharded_pallas(self, tmp_path, monkeypatch):
        mesh = make_mesh()
        a = self._results(tmp_path, monkeypatch, "pallas", mesh=mesh)
        b = self._results(tmp_path, monkeypatch, None, mesh=mesh)
        assert a == b
        assert a[2][0][0] == "f.txt:299"


class TestBucketedDevice:
    """Streaming mutation: appends rebuild only the tail bucket; tombstones
    re-upload only masks (SURVEY.md §7 hard part)."""

    def test_multi_bucket_search(self, tmp_path, monkeypatch):
        monkeypatch.setattr(VectorStore, "SEAL_ROWS", 100)
        store = make_store(tmp_path)
        for s in range(4):
            cs, vecs = chunks_and_vecs(80, path=f"f{s}.txt", seed=s)
            store.add_chunks(cs, vecs)
            store._last = vecs
        buckets = store.device_buckets()
        assert len(buckets) >= 2
        # hits found across buckets with correct global ids
        cs0, v0 = chunks_and_vecs(80, path="f0.txt", seed=0)
        res = store.search(v0[17], k=1)
        assert res[0][0].id == "f0.txt:17"
        res = store.search(store._last[33], k=1)
        assert res[0][0].id == "f3.txt:33"

    def test_sealed_buckets_reused_on_append(self, tmp_path, monkeypatch):
        monkeypatch.setattr(VectorStore, "SEAL_ROWS", 100)
        store = make_store(tmp_path)
        cs, vecs = chunks_and_vecs(150, path="a.txt", seed=1)
        store.add_chunks(cs, vecs)
        first = store.device_buckets()
        sealed_ids = [id(b["store"]) for b in first if b["sealed"]]
        assert sealed_ids
        cs2, vecs2 = chunks_and_vecs(50, path="b.txt", seed=2)
        store.add_chunks(cs2, vecs2)
        second = store.device_buckets()
        # the sealed device arrays are the same objects (no re-upload)
        reused = [id(b["store"]) for b in second if b["sealed"]]
        assert sealed_ids[0] in reused
        # and the rebuilt bucket list covers every segment: the appended
        # rows are searchable (advisor r1: identity alone let a stale
        # bucket list pass)
        assert second[-1]["seg_range"][1] == len(store.segments)
        res = store.search(vecs2[10], k=1)
        assert res[0][0].id == "b.txt:10"

    def test_search_append_search_with_sealed_prefix(self, tmp_path,
                                                     monkeypatch):
        monkeypatch.setattr(VectorStore, "SEAL_ROWS", 100)
        store = make_store(tmp_path)
        cs, vecs = chunks_and_vecs(150, path="a.txt", seed=1)
        store.add_chunks(cs, vecs)
        assert store.search(vecs[0], k=1)[0][0].id == "a.txt:0"
        cs2, vecs2 = chunks_and_vecs(50, path="b.txt", seed=2)
        store.add_chunks(cs2, vecs2)
        # previously: sealed prefix remained, tail coverage silently missing
        res = store.search(vecs2[10], k=1)
        assert res[0][0].id == "b.txt:10"

    def test_tombstone_keeps_store_arrays(self, tmp_path, monkeypatch):
        monkeypatch.setattr(VectorStore, "SEAL_ROWS", 100)
        store = make_store(tmp_path)
        cs, vecs = chunks_and_vecs(150, path="a.txt", seed=1)
        store.add_chunks(cs, vecs)
        cs2, vecs2 = chunks_and_vecs(60, path="b.txt", seed=2)
        store.add_chunks(cs2, vecs2)
        before = [id(b["store"]) for b in store.device_buckets()]
        store.remove_file_chunks(Path("b.txt"))
        after_buckets = store.device_buckets()
        after = [id(b["store"]) for b in after_buckets]
        assert before == after  # vectors untouched, only masks refreshed
        res = store.search(vecs2[10], k=3)
        assert all(str(r[0].file_path) == "a.txt" for r in res)

    def test_pad_rows_growth_bounded(self, tmp_path):
        store = make_store(tmp_path)
        sizes = {store._pad_rows(n) for n in range(1, 5000)}
        # power-of-two ladder: few distinct compiled shapes
        assert len(sizes) <= 7


def test_compaction_twice(tmp_path):
    """Repeated compactions keep names and files coherent."""
    store = make_store(tmp_path)
    cs1, v1 = chunks_and_vecs(80, path="a.txt", seed=1)
    cs2, v2 = chunks_and_vecs(20, path="b.txt", seed=2)
    store.add_chunks(cs1, v1)
    store.add_chunks(cs2, v2)
    store.remove_file_chunks(Path("a.txt"))
    store.close()

    s2 = make_store(tmp_path)              # compaction #1
    cs3, v3 = chunks_and_vecs(60, path="c.txt", seed=3)
    s2.add_chunks(cs3, v3)
    s2.remove_file_chunks(Path("b.txt"))
    s2.remove_file_chunks(Path("c.txt"))   # most rows dead again
    s2.close()

    s3 = make_store(tmp_path)              # compaction #2 → empty
    assert s3.live_rows == 0
    cs4, v4 = chunks_and_vecs(10, path="d.txt", seed=4)
    s3.add_chunks(cs4, v4)
    res = s3.search(v4[5], k=1)
    assert res[0][0].id == "d.txt:5"
    s3.close()
    s4 = make_store(tmp_path)
    assert s4.live_rows == 10


class TestScalableMetadata:
    """Offset-indexed segment metadata (VERDICT r1 weak #5): chunk_at /
    rows_at / tombstoning touch one row at a time via sidecars + memmap —
    no whole-segment residency — and pre-sidecar indexes migrate."""

    def test_chunk_at_reads_single_rows(self, tmp_path):
        store = make_store(tmp_path)
        cs, vecs = chunks_and_vecs(100, path="a.txt")
        store.add_chunks(cs, vecs)
        store.close()
        s2 = make_store(tmp_path)
        c = s2.chunk_at(37)
        assert c.id == "a.txt:37" and c.content == "content 37"
        seg = s2.segments[0]
        # metadata was served via pread, vectors never paged in
        assert seg._vectors is None
        assert seg._file_rows is None

    def test_rows_at_across_segments(self, tmp_path):
        store = make_store(tmp_path)
        cs1, v1 = chunks_and_vecs(40, path="a.txt", seed=1)
        cs2, v2 = chunks_and_vecs(40, path="b.txt", seed=2)
        store.add_chunks(cs1, v1)
        store.add_chunks(cs2, v2)
        got = store.rows_at(np.array([3, 41, 79]))
        ref = np.stack([v1[3], v2[1], v2[39]]).astype(np.float32)
        np.testing.assert_allclose(got, ref, atol=1e-2)  # bf16 store

    def test_remove_uses_file_sidecar_not_content(self, tmp_path):
        store = make_store(tmp_path)
        cs1, v1 = chunks_and_vecs(30, path="a.txt", seed=1)
        cs2, v2 = chunks_and_vecs(30, path="b.txt", seed=2)
        store.add_chunks(cs1, v1)
        store.add_chunks(cs2, v2)
        store.close()
        s2 = make_store(tmp_path)
        assert s2.remove_file_chunks(Path("a.txt")) == 30
        assert s2.live_rows == 30
        # tombstoning consulted only the file→rows sidecar
        assert all(seg._vectors is None for seg in s2.segments)

    def test_migration_from_presidecar_layout(self, tmp_path):
        """Indexes written before the sidecars existed rebuild them by one
        streaming pass on first touch (back-compat with round-1 stores)."""
        store = make_store(tmp_path)
        cs1, v1 = chunks_and_vecs(25, path="a.txt", seed=1)
        cs2, v2 = chunks_and_vecs(25, path="b.txt", seed=2)
        store.add_chunks(cs1, v1)
        store.add_chunks(cs2, v2)
        store.close()
        vdir = Path(tmp_path) / "vector_index"
        for p in list(vdir.glob("*.meta.idx")) + \
                list(vdir.glob("*.files.json")):
            p.unlink()

        s2 = make_store(tmp_path)
        assert s2.search(v2[7], k=1)[0][0].id == "b.txt:7"
        assert s2.remove_file_chunks(Path("a.txt")) == 25
        assert (vdir / f"{s2.segments[0].name}.meta.idx").exists()
        assert (vdir / f"{s2.segments[0].name}.files.json").exists()

    def test_unicode_content_offsets(self, tmp_path):
        """Byte-offset indexing stays correct for multibyte content."""
        store = make_store(tmp_path)
        texts = ["日本語のテキスト", "ascii text", "mixé 🚀 emoji", "중간"]
        cs = [Chunk(id=f"u.txt:{i}", file_path=Path("u.txt"),
                    start_line=i, end_line=i + 1, content=t)
              for i, t in enumerate(texts)]
        rng = np.random.default_rng(0)
        vecs = rng.standard_normal((4, 32)).astype(np.float32)
        store.add_chunks(cs, vecs)
        store.close()
        s2 = make_store(tmp_path)
        for i, t in enumerate(texts):
            assert s2.chunk_at(i).content == t

    def test_compaction_preserves_sidecars(self, tmp_path):
        store = make_store(tmp_path)
        cs1, v1 = chunks_and_vecs(80, path="a.txt", seed=1)
        cs2, v2 = chunks_and_vecs(20, path="b.txt", seed=2)
        store.add_chunks(cs1, v1)
        store.add_chunks(cs2, v2)
        store.remove_file_chunks(Path("a.txt"))
        store.close()
        s2 = make_store(tmp_path)   # streaming compaction on load
        assert s2.total_rows == 20
        seg = s2.segments[0]
        assert seg.idx_path.exists() and seg.files_path.exists()
        assert seg.file_rows() == {"b.txt": list(range(20))}
        assert s2.chunk_at(5).id == "b.txt:5"
        assert s2.remove_file_chunks(Path("b.txt")) == 20


class TestStreamingBuckets:
    """LSM-style device buckets: each streamed append uploads ONLY its own
    mini-bucket (earlier buckets' device arrays are untouched), and a tail
    fragmented past MAX_TAIL_BUCKETS consolidates into one bucket."""

    def test_append_extends_arena_in_place(self, tmp_path):
        """Streamed appends land in the unsealed tail bucket's spare
        padded capacity via a device-side write (arena extension): the
        tail stays ONE bucket — one scan dispatch per query — until its
        capacity overflows, which allocates a doubled arena."""
        store = make_store(tmp_path)
        cs, vecs = chunks_and_vecs(64, path="base.txt", seed=0)
        store.add_chunks(cs, vecs)
        [b0] = store.device_buckets()
        assert b0["n_pad"] >= 2 * 64      # headroom for in-place appends
        cap = b0["n_pad"]
        appended = []
        for g in range(3):
            cs2, v2 = chunks_and_vecs(32, path=f"s{g}.txt", seed=10 + g)
            store.add_chunks(cs2, v2)
            appended.append(v2)
            buckets = store.device_buckets()
            rows_total = 64 + 32 * (g + 1)
            if rows_total <= cap:
                # in-place: still one bucket, same capacity, more rows
                assert len(buckets) == 1
                assert buckets[0]["n_pad"] == cap
                assert buckets[0]["rows"] == rows_total
            else:
                # overflow: a fresh arena bucket for the new rows
                assert len(buckets) == 2
        # results correct across in-place and overflow appends
        assert store.search(appended[1][7], k=1)[0][0].id == "s1.txt:7"
        assert store.search(appended[2][9], k=1)[0][0].id == "s2.txt:9"
        assert store.search(vecs[3], k=1)[0][0].id == "base.txt:3"

    def test_arena_append_int8(self, tmp_path):
        """Arena extension updates both the quantized values and the
        per-row scales in int8 mode."""
        store = make_store(tmp_path, store_dtype="int8")
        cs, vecs = chunks_and_vecs(64, path="base.txt", seed=0)
        store.add_chunks(cs, vecs)
        cs2, v2 = chunks_and_vecs(32, path="new.txt", seed=9)
        store.add_chunks(cs2, v2)
        assert len(store.device_buckets()) == 1
        assert store.search(v2[5], k=1)[0][0].id == "new.txt:5"
        assert store.search(vecs[3], k=1)[0][0].id == "base.txt:3"

    def test_arena_tombstones_after_extension(self, tmp_path):
        """Tombstoning rows that live in the extended part of an arena
        refreshes the (device-updated) validity mask correctly."""
        store = make_store(tmp_path)
        cs, vecs = chunks_and_vecs(64, path="base.txt", seed=0)
        store.add_chunks(cs, vecs)
        cs2, v2 = chunks_and_vecs(32, path="new.txt", seed=9)
        store.add_chunks(cs2, v2)
        assert len(store.device_buckets()) == 1
        assert store.remove_file_chunks(Path("new.txt")) == 32
        got = store.search(v2[5], k=1)
        assert not got or got[0][0].id != "new.txt:5"
        assert store.search(vecs[3], k=1)[0][0].id == "base.txt:3"

    def test_tail_consolidation(self, tmp_path, monkeypatch):
        monkeypatch.setattr(VectorStore, "MAX_TAIL_BUCKETS", 3)
        store = make_store(tmp_path)
        last = None
        for g in range(6):
            cs, v = chunks_and_vecs(16, path=f"s{g}.txt", seed=g)
            store.add_chunks(cs, v)
            last = v
            n = len(store.device_buckets())
            assert n <= 4  # never more than MAX_TAIL+1 before consolidation
        buckets = store.device_buckets()
        assert len(buckets) < 6          # tail consolidated at least once
        assert buckets[-1]["seg_range"][1] == len(store.segments)
        assert store.search(last[5], k=1)[0][0].id == "s5.txt:5"
        cs0, v0 = chunks_and_vecs(16, path="s0.txt", seed=0)
        assert store.search(v0[2], k=1)[0][0].id == "s0.txt:2"

    def test_consolidation_skips_sealed_after_unsealed(self, tmp_path,
                                                       monkeypatch):
        """A bulk append behind a small unsealed tail produces
        unsealed-then-sealed bucket ordering; consolidation must anchor at
        the all-unsealed SUFFIX and never re-upload the sealed bucket."""
        monkeypatch.setattr(VectorStore, "SEAL_ROWS", 100)
        monkeypatch.setattr(VectorStore, "MAX_TAIL_BUCKETS", 2)
        store = make_store(tmp_path)
        cs, v_small = chunks_and_vecs(16, path="small.txt", seed=0)
        store.add_chunks(cs, v_small)          # unsealed bucket A
        cs, v_bulk = chunks_and_vecs(150, path="bulk.txt", seed=1)
        store.add_chunks(cs, v_bulk)           # sealing bucket B behind A
        buckets = store.device_buckets()
        # A gets FROZEN sealed when B bypasses it (it can never be
        # arena-extended again), so every unsealed bucket stays a suffix
        assert all(b["sealed"] for b in buckets)
        bulk_bucket = [b for b in buckets if b["rows"] >= 100]
        assert len(bulk_bucket) == 1
        sealed_store_id = id(bulk_bucket[0]["store"])
        sealed_range = bulk_bucket[0]["seg_range"]
        # fragment the tail with appends too big for the arena headroom
        vs = []
        for g, n in enumerate((60, 70, 80, 90)):
            cs, v = chunks_and_vecs(n, path=f"t{g}.txt", seed=10 + g)
            store.add_chunks(cs, v)
            vs.append(v)
        buckets = store.device_buckets()
        # the sealed bucket survived consolidation UNTOUCHED (same device
        # array — no re-upload), and only the unsealed suffix merged
        survivors = [b for b in buckets if b["seg_range"] == sealed_range]
        assert survivors and id(survivors[0]["store"]) == sealed_store_id
        assert store.search(v_small[3], k=1)[0][0].id == "small.txt:3"
        assert store.search(v_bulk[42], k=1)[0][0].id == "bulk.txt:42"
        assert store.search(vs[2][5], k=1)[0][0].id == "t2.txt:5"

    def test_tombstone_refreshes_masks_on_all_buckets(self, tmp_path):
        store = make_store(tmp_path)
        for g in range(3):
            cs, v = chunks_and_vecs(32, path=f"s{g}.txt", seed=g)
            store.add_chunks(cs, v)
        store.device_buckets()
        store.remove_file_chunks(Path("s0.txt"))
        cs0, v0 = chunks_and_vecs(32, path="s0.txt", seed=0)
        res = store.search(v0[4], k=3)
        assert all(str(r[0].file_path) != "s0.txt" for r in res)


def test_all_valid_bucket_flag(tmp_path, monkeypatch):
    """Buckets track all_valid (mask-free scan eligibility): unsealed
    tail buckets carry arena headroom (padding) so they are never
    eligible; an exactly-filled SEALED bucket is — until tombstoned.
    Searches stay correct in every state."""
    store = make_store(tmp_path)
    cs, vecs = chunks_and_vecs(100, path="a.txt")   # padded + headroom
    store.add_chunks(cs, vecs)
    [b] = store.device_buckets()
    assert b["all_valid"] is False                   # padding rows
    assert store.search(vecs[7], k=1)[0][0].id == "a.txt:7"

    monkeypatch.setattr(VectorStore, "SEAL_ROWS", 128)
    store2 = make_store(tmp_path / "exact", d=32)
    cs2, v2 = chunks_and_vecs(128, path="b.txt")     # one sealed bucket
    store2.add_chunks(cs2, v2)
    b2 = store2.device_buckets()[0]
    assert b2["sealed"] and b2["all_valid"] is True
    assert store2.search(v2[9], k=1)[0][0].id == "b.txt:9"
    store2.remove_file_chunks(Path("b.txt"))
    b3 = store2.device_buckets()[0]
    assert b3["all_valid"] is False                  # tombstones


def test_search_batch_async_finish_split(tmp_path):
    """The serving pipeline's two-phase API: async dispatch returns
    immediately-usable handles; finish produces results identical to the
    one-shot search_batch, including with multiple handles in flight."""
    store = make_store(tmp_path)
    cs, vecs = chunks_and_vecs(200)
    store.add_chunks(cs, vecs)
    q = vecs[:8]
    want = store.search_batch(q, 5)
    handles = [store.search_batch_async(q, 5) for _ in range(3)]
    for h in handles:
        scores, ids = store.search_batch_finish(h, q)
        np.testing.assert_array_equal(ids, want[1])
        np.testing.assert_array_equal(scores, want[0])
    # empty store path
    empty = make_store(tmp_path / "e")
    s, i = empty.search_batch_finish(empty.search_batch_async(q, 5), q)
    assert s.shape == (8, 5) and not np.isfinite(s).any()


def test_second_open_is_not_owner(tmp_path):
    """A second process/instance opening a live store must not run
    destructive maintenance (compaction/sweep unlink committed files a
    concurrent writer still references) — the flock ownership gate."""
    store = make_store(tmp_path)
    cs, vecs = chunks_and_vecs(30)
    store.add_chunks(cs, vecs)
    assert store._owner
    reader = make_store(tmp_path)
    assert not reader._owner          # first instance holds the flock
    assert reader.total_rows == 30    # still fully readable
    reader.close()
    store.close()
    third = make_store(tmp_path)      # lock released: owner again
    assert third._owner
    third.close()


def test_finish_slices_to_live_rows(tmp_path):
    """search_batch_async(live=) drops the zero-padded phantom rows
    before the host merge — the serving batcher pads to a fixed shape."""
    import numpy as np
    store = make_store(tmp_path)
    cs, vecs = chunks_and_vecs(100)
    store.add_chunks(cs, vecs)
    q = np.zeros((8, 32), dtype=np.float32)
    q[0] = vecs[5]
    q[1] = vecs[77]
    handle = store.search_batch_async(q, 3, live=2)
    scores, ids = store.search_batch_finish(handle, q)
    assert scores.shape[0] == 2 and ids.shape[0] == 2
    assert ids[0][0] == 5 and ids[1][0] == 77

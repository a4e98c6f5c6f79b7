"""Persisted IVF layouts (index/ivf_cache.py) + the spilled-IVF probe.

Covers: sidecar roundtrip (with/without the vectors blob, corruption,
truncation), reopen-without-reclustering (the sidecar makes device
k-means a once-per-bucket cost, not once-per-open), the stale sweep, and
the pruned probe over HOST-RESIDENT (HBM-spilled) buckets — the path
that makes over-HBM stores servable by uploading only probed tiles from
the cluster-major disk blob instead of streaming every byte.
"""

from pathlib import Path

import numpy as np
import pytest

from sema_tpu.index import ivf_cache
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


# ---------------------------------------------------------------------------
# sidecar file format
# ---------------------------------------------------------------------------

def _layout(n_pad=256, d=16, c=4, with_vectors=False, seed=0):
    rng = np.random.default_rng(seed)
    perm = rng.permutation(n_pad).astype(np.int32)
    cents = rng.standard_normal((c, d)).astype(np.float32)
    starts = np.sort(rng.integers(0, n_pad, c + 2)).astype(np.int64)
    vecs = (rng.standard_normal((n_pad, d)).astype(np.float32)
            if with_vectors else None)
    return perm, cents, starts, vecs


class TestSidecarFormat:
    SEGS = [("seg-000000", 200), ("seg-000001", 56)]

    def test_roundtrip_layout_only(self, tmp_path):
        perm, cents, starts, _ = _layout()
        key = ivf_cache.layout_key(self.SEGS, 256, 16, "float32", 1,
                                   128, 128)
        ivf_cache.save_layout(tmp_path, key, self.SEGS, perm, cents,
                              starts)
        got = ivf_cache.load_layout(tmp_path, key)
        np.testing.assert_array_equal(got["perm"], perm)
        np.testing.assert_array_equal(got["centroids"], cents)
        np.testing.assert_array_equal(got["starts"], starts)
        assert "vectors" not in got
        # a layout-only sidecar cannot serve the spill path
        assert ivf_cache.load_layout(tmp_path, key,
                                     need_vectors=True) is None

    def test_roundtrip_with_vectors(self, tmp_path):
        perm, cents, starts, vecs = _layout(with_vectors=True)
        key = ivf_cache.layout_key(self.SEGS, 256, 16, "float32", 1,
                                   128, 128)
        ivf_cache.save_layout(tmp_path, key, self.SEGS, perm, cents,
                              starts, vectors=vecs)
        got = ivf_cache.load_layout(tmp_path, key, need_vectors=True)
        np.testing.assert_array_equal(np.asarray(got["vectors"]), vecs)
        # the blob comes back as a read-only memmap, not a resident copy
        assert isinstance(got["vectors"], np.memmap)

    def test_roundtrip_with_scales(self, tmp_path):
        """int8 blob + per-row scales (v3): both come back as memmaps;
        scales without vectors is a caller bug; a file truncated inside
        the scales region is rejected whole."""
        perm, cents, starts, _ = _layout()
        rng = np.random.default_rng(3)
        vecs = rng.integers(-127, 128, (256, 16)).astype(np.int8)
        scales = rng.random(256).astype(np.float32)
        key = ivf_cache.layout_key(self.SEGS, 256, 16, "int8", 1,
                                   128, 128, spill=True)
        with pytest.raises(ValueError):
            ivf_cache.save_layout(tmp_path, key, self.SEGS, perm, cents,
                                  starts, scales=scales)
        ivf_cache.save_layout(tmp_path, key, self.SEGS, perm, cents,
                              starts, vectors=vecs, scales=scales)
        got = ivf_cache.load_layout(tmp_path, key, need_vectors=True)
        np.testing.assert_array_equal(np.asarray(got["vectors"]), vecs)
        np.testing.assert_array_equal(np.asarray(got["scales"]), scales)
        assert got["vectors"].dtype == np.int8
        # layout-only read skips the blob AND the scales
        assert "scales" not in ivf_cache.load_layout(tmp_path, key)
        p = ivf_cache.sidecar_path(tmp_path, key)
        whole = p.read_bytes()
        p.write_bytes(whole[:-128])   # cut into the scales region
        assert ivf_cache.load_layout(tmp_path, key,
                                     need_vectors=True) is None

    def test_mesh_shaped_tables(self, tmp_path):
        """(shards, C, d) centroids / (shards, C+2) starts roundtrip."""
        rng = np.random.default_rng(1)
        perm = rng.permutation(512).astype(np.int32)
        cents = rng.standard_normal((4, 8, 16)).astype(np.float32)
        starts = rng.integers(0, 128, (4, 10)).astype(np.int64)
        key = ivf_cache.layout_key(self.SEGS, 512, 16, "bfloat16", 4,
                                   128, 128)
        ivf_cache.save_layout(tmp_path, key, self.SEGS, perm, cents,
                              starts)
        got = ivf_cache.load_layout(tmp_path, key)
        assert got["centroids"].shape == (4, 8, 16)
        assert got["starts"].shape == (4, 10)

    def test_missing_corrupt_truncated(self, tmp_path):
        key = ivf_cache.layout_key(self.SEGS, 256, 16, "float32", 1,
                                   128, 128)
        assert ivf_cache.load_layout(tmp_path, key) is None  # missing
        p = ivf_cache.sidecar_path(tmp_path, key)
        p.write_bytes(b"garbage not a sidecar")
        assert ivf_cache.load_layout(tmp_path, key) is None  # corrupt
        perm, cents, starts, _ = _layout()
        ivf_cache.save_layout(tmp_path, key, self.SEGS, perm, cents,
                              starts)
        whole = p.read_bytes()
        p.write_bytes(whole[:len(whole) // 2])
        assert ivf_cache.load_layout(tmp_path, key) is None  # truncated

    def test_key_sensitivity(self):
        base = dict(n_pad=256, dim=16, dtype="float32", shards=1,
                    tile=128, cluster_rows=128)
        k0 = ivf_cache.layout_key(self.SEGS, **base)
        assert k0 != ivf_cache.layout_key([("seg-000000", 200)], **base)
        assert k0 != ivf_cache.layout_key(
            self.SEGS, **{**base, "shards": 2})
        assert k0 != ivf_cache.layout_key(
            self.SEGS, **{**base, "n_pad": 512})

    def test_sweep(self, tmp_path):
        import os
        perm, cents, starts, _ = _layout()
        key_live = ivf_cache.layout_key(self.SEGS, 256, 16, "f4", 1,
                                        128, 128)
        key_dead = ivf_cache.layout_key([("seg-gone", 10)], 256, 16,
                                        "f4", 1, 128, 128)
        ivf_cache.save_layout(tmp_path, key_live, self.SEGS, perm,
                              cents, starts)
        ivf_cache.save_layout(tmp_path, key_dead, [("seg-gone", 10)],
                              perm, cents, starts)
        live = {"seg-000000", "seg-000001"}
        # fresh files survive any sweep (concurrent-writer age gate)
        ivf_cache.sweep_stale(tmp_path, live, keep_any=True)
        assert ivf_cache.sidecar_path(tmp_path, key_dead).exists()
        # age both files past the gate
        old = (0, 0)
        for key in (key_live, key_dead):
            os.utime(ivf_cache.sidecar_path(tmp_path, key), old)
        ivf_cache.sweep_stale(tmp_path, live, keep_any=True)
        assert ivf_cache.sidecar_path(tmp_path, key_live).exists()
        assert not ivf_cache.sidecar_path(tmp_path, key_dead).exists()
        # IVF mode off: every sidecar goes (blobs are a full bucket copy)
        os.utime(ivf_cache.sidecar_path(tmp_path, key_live), old)
        ivf_cache.sweep_stale(tmp_path, live, keep_any=False)
        assert not ivf_cache.sidecar_path(tmp_path, key_live).exists()


# ---------------------------------------------------------------------------
# device buckets: reopen reuses the persisted layout (no re-clustering)
# ---------------------------------------------------------------------------

@pytest.fixture()
def ivf_env(monkeypatch):
    monkeypatch.setenv("SEMA_TPU_SCAN_BACKEND", "pallas")
    monkeypatch.setattr(VectorStore, "SEAL_ROWS", 256)
    monkeypatch.setattr(VectorStore, "IVF_TILE", 128)
    monkeypatch.setattr(VectorStore, "IVF_CLUSTER_ROWS", 128)
    monkeypatch.setenv("SEMA_TPU_IVF_NPROBE", "3")


def make_store(tmp_path, **kw):
    return VectorStore(tmp_path, dim=128, model="test-ivf", ivf=True,
                       **kw)


def test_reopen_skips_kmeans(tmp_path, ivf_env, monkeypatch):
    store = make_store(tmp_path)
    cs, vecs = chunks_and_vecs(300, seed=5)
    store.add_chunks(cs, vecs)
    res1 = store.search(vecs[42], k=3)
    assert any(b.get("ivf") is not None for b in store.device_buckets())
    assert list(Path(store.dir).glob("ivf-*.bin")), \
        "sealed IVF bucket should persist its layout"
    store.close()

    import sema_tpu.ops.ivf as ivf_mod

    def boom(*a, **k):
        raise AssertionError("k-means re-ran on reopen")
    monkeypatch.setattr(ivf_mod, "kmeans_cluster", boom)
    store2 = make_store(tmp_path)
    res2 = store2.search(vecs[42], k=3)
    assert any(b.get("ivf") is not None for b in store2.device_buckets())
    assert [(c.id, pytest.approx(s, abs=1e-5)) for c, s in res1] == \
        [(c.id, s) for c, s in res2]
    store2.close()


def test_compaction_invalidates_layout(tmp_path, ivf_env, monkeypatch):
    """Rewriting segments under fresh names changes the key: the reopen
    must re-cluster (fresh sidecar) and the stale one must sweep."""
    import os
    store = make_store(tmp_path)
    cs, vecs = chunks_and_vecs(300, seed=6)
    store.add_chunks(cs, vecs)
    cs2, vecs2 = chunks_and_vecs(40, path="g.txt", seed=7)
    store.add_chunks(cs2, vecs2)
    store.search(vecs[0], k=1)
    old_sidecars = set(Path(store.dir).glob("ivf-*.bin"))
    assert old_sidecars
    # kill >25% of rows → load-time compaction rewrites the segments
    assert store.remove_file_chunks("f.txt") == 300
    store.close()

    store2 = make_store(tmp_path)
    assert all(s.name.startswith("seg-") for s in store2.segments)
    res = store2.search(vecs2[11], k=1)
    assert res[0][0].id == "g.txt:11"
    # stale sidecars are age-gated; force them old and re-sweep
    for p in old_sidecars:
        if p.exists():
            os.utime(p, (0, 0))
    store2._sweep_orphans()
    for p in old_sidecars:
        assert not p.exists()
    store2.close()


# ---------------------------------------------------------------------------
# spilled buckets: the pruned probe over the cluster-major disk blob
# ---------------------------------------------------------------------------

@pytest.fixture()
def spill_ivf_env(monkeypatch):
    """Every sealed bucket spills; layouts are blob-backed; probes admit
    half the tiles so the pruned path engages on single queries."""
    monkeypatch.setenv("SEMA_TPU_SCAN_BACKEND", "pallas")
    monkeypatch.setattr(VectorStore, "SEAL_ROWS", 512)
    monkeypatch.setattr(VectorStore, "IVF_TILE", 128)
    monkeypatch.setattr(VectorStore, "IVF_CLUSTER_ROWS", 128)
    monkeypatch.setattr(VectorStore, "IVF_BUDGET_DIV", 2)
    monkeypatch.setenv("SEMA_TPU_IVF_NPROBE", "2")
    monkeypatch.setenv("SEMA_TPU_HBM_BUDGET_MB", "0.000001")


def test_spilled_ivf_probe(tmp_path, spill_ivf_env, monkeypatch):
    store = make_store(tmp_path)
    cs, vecs = chunks_and_vecs(1000, seed=8)
    store.add_chunks(cs, vecs)
    buckets = store.device_buckets()
    assert buckets and all(b.get("host_resident") for b in buckets)
    assert all(b.get("ivf_spill") is not None for b in buckets)
    assert list(Path(store.dir).glob("ivf-*.bin"))

    streamed = []
    orig = VectorStore._scan_host_bucket
    monkeypatch.setattr(
        VectorStore, "_scan_host_bucket",
        lambda self, *a, **k: streamed.append(1) or orig(self, *a, **k))
    for row in (3, 456, 999):
        res = store.search(vecs[row], k=2)
        assert res[0][0].id == f"f.txt:{row}"
        assert res[0][1] == pytest.approx(1.0, abs=1e-2)
    assert not streamed, "probes must not fall back to the full stream"
    assert any(k[0] == "ivf" for k in store._topk_fns)
    store.close()


def test_spilled_ivf_overbudget_falls_back_exact(tmp_path, spill_ivf_env,
                                                 monkeypatch):
    """A probe whose tile union exceeds the budget streams the whole
    bucket — and the result is then EXACT (oracle parity)."""
    monkeypatch.setenv("SEMA_TPU_IVF_NPROBE", "4096")
    monkeypatch.setattr(VectorStore, "IVF_BUDGET_DIV", 4096)
    store = make_store(tmp_path)
    cs, vecs = chunks_and_vecs(700, seed=9)
    store.add_chunks(cs, vecs)
    streamed = []
    orig = VectorStore._scan_host_bucket
    monkeypatch.setattr(
        VectorStore, "_scan_host_bucket",
        lambda self, *a, **k: streamed.append(1) or orig(self, *a, **k))
    qs = vecs[100:103]
    scores, ids = store.search_batch(qs, k=5)
    assert streamed
    full = vecs @ qs.T
    for qi in range(3):
        oracle = np.argsort(-full[:, qi], kind="stable")[:5]
        np.testing.assert_array_equal(ids[qi], oracle)
    store.close()


def test_spilled_ivf_tombstones(tmp_path, spill_ivf_env):
    store = make_store(tmp_path)
    cs, vecs = chunks_and_vecs(600, path="a.txt", seed=10)
    store.add_chunks(cs, vecs)
    cs2, vecs2 = chunks_and_vecs(600, path="b.txt", seed=11, start=600)
    store.add_chunks(cs2, vecs2)
    assert store.remove_file_chunks("a.txt") == 600
    res = store.search(vecs[5], k=3)
    assert res and all(c.id.startswith("b.txt") for c, _ in res)
    store.close()


def test_spilled_ivf_reopen_probes_from_disk(tmp_path, spill_ivf_env,
                                             monkeypatch):
    """Reopen: the blob sidecar serves the probe with no re-cluster and
    no full-bucket read."""
    store = make_store(tmp_path)
    cs, vecs = chunks_and_vecs(1000, seed=12)
    store.add_chunks(cs, vecs)
    store.search(vecs[0], k=1)
    store.close()

    import sema_tpu.ops.ivf as ivf_mod
    monkeypatch.setattr(ivf_mod, "kmeans_cluster",
                        lambda *a, **k: (_ for _ in ()).throw(
                            AssertionError("re-clustered on reopen")))
    store2 = make_store(tmp_path)
    res = store2.search(vecs[777], k=1)
    assert res[0][0].id == "f.txt:777"
    assert all(b.get("ivf_spill") is not None
               for b in store2.device_buckets())
    store2.close()


def test_spilled_ivf_int8_store(tmp_path, spill_ivf_env):
    """int8 stores persist a QUANTIZED blob (int8 rows + f32 scales —
    half the staged probe upload), select on the int8 pruned kernel,
    and the rescore_k full-precision re-rank still returns exact
    scores."""
    store = VectorStore(tmp_path, dim=128, model="test-ivf", ivf=True,
                        store_dtype="int8")
    cs, vecs = chunks_and_vecs(700, seed=13)
    store.add_chunks(cs, vecs)
    buckets = store.device_buckets()
    assert all(b.get("host_resident") for b in buckets)
    for b in buckets:
        iv = b.get("ivf_spill")
        assert iv is not None
        assert np.asarray(iv["vectors"]).dtype == np.int8
        assert iv.get("scales") is not None
        assert iv["scales"].shape == (iv["n_pad"],)
    res = store.search(vecs[321], k=2)
    assert res[0][0].id == "f.txt:321"
    # the rescore re-ranks from the bf16 disk originals: the top score
    # is the exact cosine, not an int8 approximation
    assert res[0][1] == pytest.approx(1.0, abs=1e-2)
    store.close()


def test_spilled_ivf_int8_blob_quantization_matches_oracle(
        tmp_path, spill_ivf_env):
    """Blob rows/scales must equal quantize_rows of the cluster-major
    bf16 originals (gap slots stay zero with scale 0)."""
    from sema_tpu.ops.quant import quantize_rows
    store = VectorStore(tmp_path, dim=128, model="test-ivf", ivf=True,
                        store_dtype="int8")
    cs, vecs = chunks_and_vecs(600, seed=14)
    store.add_chunks(cs, vecs)
    b = store.device_buckets()[0]
    iv = b["ivf_spill"]
    rows = b["rows"]
    perm = iv["perm"]
    blob = np.asarray(iv["vectors"])
    scales = np.asarray(iv["scales"])
    # reconstruct the expected blob from the store's own disk originals
    orig = store.rows_at(np.arange(rows))
    live = perm < rows
    expect_rows = np.zeros((len(perm), 128), dtype=np.float32)
    expect_rows[live] = orig[perm[live]].astype(np.float32)
    eq, es = quantize_rows(expect_rows)
    np.testing.assert_array_equal(blob, eq)
    np.testing.assert_allclose(scales, es, rtol=1e-6)
    assert (scales[~live] == 0).all()
    store.close()


def test_spilled_ivf_blob_tile_aligned(tmp_path, spill_ivf_env):
    """v2 blob invariants (ivf_cache._VERSION=2): every real cluster
    starts on a _spill_tile boundary, the k-means overflow cluster is
    dropped, gap slots carry the ``rows`` sentinel + zero vectors, and
    the live perm entries are exactly a permutation of the bucket's
    rows — so a probed tile never stages a neighbor cluster's rows."""
    store = make_store(tmp_path)
    cs, vecs = chunks_and_vecs(1000, seed=21)
    store.add_chunks(cs, vecs)
    b = store.device_buckets()[0]
    iv = b["ivf_spill"]
    assert iv is not None
    t = store._spill_tile()
    c = iv["centroids"].shape[0]
    starts = iv["starts"]
    assert all(int(s) % t == 0 for s in starts[:c + 1])
    # overflow cluster (id c, zero-pad rows) dropped: empty trailing range
    assert int(starts[c]) == int(starts[c + 1]) == iv["n_pad"]
    assert iv["n_pad"] % t == 0
    assert iv["vectors"].shape[0] == iv["n_pad"]
    rows = b["rows"]
    perm = np.asarray(iv["perm"])
    pad = perm == rows
    assert sorted(perm[~pad].tolist()) == list(range(rows))
    assert not np.asarray(iv["vectors"])[pad].any()
    # probes still exact on the aligned blob
    res = store.search(vecs[123], k=1)
    assert res[0][0].id == "f.txt:123"
    store.close()


def test_spilled_ivf_probe_split_halves(tmp_path, spill_ivf_env,
                                        monkeypatch):
    """Probes of >= IVF_SPLIT_MIN_TILES live tiles stage in TWO halves
    (the second half's memmap gather overlaps the first half's async
    host->device upload): the halves split the SAME _stage_tiles buffer
    — total staged tiles identical to an unsplit probe — and their
    merged candidates stay oracle-exact."""
    monkeypatch.setattr(VectorStore, "SEAL_ROWS", 4096)
    monkeypatch.setenv("SEMA_TPU_IVF_NPROBE", "16")
    store = make_store(tmp_path)
    cs, vecs = chunks_and_vecs(4096, seed=13)
    store.add_chunks(cs, vecs)
    assert all(b.get("ivf_spill") is not None
               for b in store.device_buckets())

    # Pin the probe size: whatever tiles k-means happens to produce,
    # extend the live set to exactly IVF_SPLIT_MIN_TILES (extra tiles
    # only ADD scan candidates — exactness is preserved — and the split
    # condition stops hinging on clustering outcomes; ADVICE r3).
    import sema_tpu.ops.ivf as ivf_ops
    orig_sel = ivf_ops.select_tiles

    def pinned_select(centroids, starts, queries, nprobe, tile_n,
                      budget):
        out = orig_sel(centroids, starts, queries, nprobe, tile_n,
                       budget)
        assert out is not None, "probe must fit the budget"
        tiles, n_live = out
        want = min(VectorStore.IVF_SPLIT_MIN_TILES, budget)
        live = sorted(set(tiles[:n_live].tolist()))
        n_tiles = int(starts[-1]) // tile_n
        for extra in range(n_tiles):
            if len(live) >= want:
                break
            if extra not in live:
                live.append(extra)
        live = np.asarray(sorted(live), dtype=np.int32)
        padded = np.full(budget, live[-1], dtype=np.int32)
        padded[:len(live)] = live
        return padded, len(live)

    monkeypatch.setattr(ivf_ops, "select_tiles", pinned_select)

    stages, streamed = [], []
    orig_stage = VectorStore._ivf_spill_stage
    monkeypatch.setattr(
        VectorStore, "_ivf_spill_stage",
        lambda self, b, iv, lt, be, *a, **k:
            stages.append((len(lt), be))
            or orig_stage(self, b, iv, lt, be, *a, **k))
    orig_stream = VectorStore._scan_host_bucket
    monkeypatch.setattr(
        VectorStore, "_scan_host_bucket",
        lambda self, *a, **k: streamed.append(1)
        or orig_stream(self, *a, **k))

    scores, ids = store.search_batch(vecs[123:124], k=5)
    assert not streamed, "split probe must not fall back to the stream"
    assert len(stages) == 2, stages
    n_live = sum(n for n, _ in stages)
    assert n_live >= VectorStore.IVF_SPLIT_MIN_TILES
    from sema_tpu.index.vector_store import (_split_stage_halves,
                                             _stage_tiles)
    b = store.device_buckets()[0]
    n_tiles = b["ivf_spill"]["n_pad"] // store._spill_tile()
    budget = max(2, n_tiles // VectorStore.IVF_BUDGET_DIV)
    b_eff = _stage_tiles(n_live, budget)
    # halves split the SAME staging buffer (total staged tiles identical
    # to an unsplit probe) on the _stage_tiles size grid
    assert (stages[0][1], stages[1][1]) == _split_stage_halves(b_eff)
    assert sum(be for _, be in stages) == b_eff
    assert all(n <= be for n, be in stages)  # each half fits its buffer
    assert ids[0][0] == 123
    assert scores[0][0] == pytest.approx(1.0, abs=1e-2)
    store.close()


# ---------------------------------------------------------------------------
# union probe over MULTIPLE spilled buckets (the live-build spill shape)
# ---------------------------------------------------------------------------

def test_spilled_ivf_union_probe_multibucket(tmp_path, spill_ivf_env,
                                             monkeypatch):
    """A live build that spills MANY buckets probes them as ONE logical
    index: a single union dispatch (one staged upload + kernel), nprobe
    clusters selected per query across ALL buckets' centroids, unprobed
    buckets skipped outright. Per-bucket probes lose their selectivity
    exactly when spills multiply — nprobe clusters PER BUCKET per query
    approaches whole-bucket staging on batched queries (4M config-5
    rehearsal served at ~33 s/batch that way; r4). Correctness: each
    bucket's planted winner surfaces with its exact GLOBAL row id (the
    union rowmap folds per-bucket offsets), tombstoned winners don't.

    nprobe scales with the union: the fixture's nprobe=2 is tuned for
    ONE bucket's 16 clusters — across 6x16 union clusters the winner's
    own centroid can lose a top-2 race on random data (that's the
    recall/cost dial, not a routing bug), so probe 8 of 96 here."""
    monkeypatch.setenv("SEMA_TPU_IVF_NPROBE", "8")
    monkeypatch.setattr(VectorStore, "IVF_BUDGET_DIV", 1)
    store = make_store(tmp_path)
    n_b = 6
    all_vecs = []
    for b in range(n_b):
        cs, vecs = chunks_and_vecs(512, path=f"f{b}.txt", seed=20 + b)
        store.add_chunks(cs, vecs)
        all_vecs.append(vecs)
    buckets = store.device_buckets()
    assert len([b for b in buckets if b.get("host_resident")]) == n_b
    assert all(b.get("ivf_spill") is not None for b in buckets)

    calls = []
    orig_disp = VectorStore._ivf_spill_dispatch
    monkeypatch.setattr(
        VectorStore, "_ivf_spill_dispatch",
        lambda self, bs, *a, **k: calls.append(len(bs))
        or orig_disp(self, bs, *a, **k))
    streamed = []
    orig_stream = VectorStore._scan_host_bucket
    monkeypatch.setattr(
        VectorStore, "_scan_host_bucket",
        lambda self, *a, **k: streamed.append(1)
        or orig_stream(self, *a, **k))

    # one probe aimed at each bucket: every bucket's winner must surface
    q = np.stack([all_vecs[b][7] for b in range(n_b)])
    scores, ids = store.search_batch(q, k=3)
    assert calls == [n_b], "ONE union dispatch over all spilled buckets"
    assert not streamed
    for b in range(n_b):
        assert ids[b][0] == b * 512 + 7, f"bucket {b} winner id"
        assert scores[b][0] == pytest.approx(1.0, abs=1e-2)

    # tombstones hold across the union: delete bucket 2's file — its
    # winner must vanish while every other bucket's still surfaces
    store.remove_file_chunks(Path("f2.txt"))
    calls.clear()
    scores2, ids2 = store.search_batch(q, k=3)
    assert calls == [n_b]
    finite2 = [int(i) for i, s in zip(ids2[2], scores2[2])
               if np.isfinite(s)]
    assert all(not (2 * 512 <= i < 3 * 512) for i in finite2), \
        "tombstoned bucket rows must not surface"
    for b in (0, 1, 3, 4, 5):
        assert ids2[b][0] == b * 512 + 7
    store.close()


def test_spilled_ivf_union_budget_fallback(tmp_path, spill_ivf_env,
                                           monkeypatch):
    """A union probe past its global budget retries per bucket: buckets
    whose own probes fit still serve pruned; results stay correct.
    (The fixture's nprobe=2 per bucket keeps each per-bucket probe
    inside its own budget — the union "failure" is forced below.)"""
    store = make_store(tmp_path)
    n_b = 3
    all_vecs = []
    for b in range(n_b):
        cs, vecs = chunks_and_vecs(512, path=f"f{b}.txt", seed=40 + b)
        store.add_chunks(cs, vecs)
        all_vecs.append(vecs)
    buckets = store.device_buckets()
    assert all(b.get("ivf_spill") is not None for b in buckets)
    n_union = sum(len(b["ivf_spill"]["centroids"]) for b in buckets)

    import sema_tpu.ops.ivf as ivf_ops
    orig_sel = ivf_ops.select_tiles

    def sel(centroids, starts, queries, nprobe, tile_n, budget):
        if len(centroids) == n_union:
            return None     # force "union over budget"
        return orig_sel(centroids, starts, queries, nprobe, tile_n,
                        budget)

    monkeypatch.setattr(ivf_ops, "select_tiles", sel)
    calls = []
    orig_disp = VectorStore._ivf_spill_dispatch
    monkeypatch.setattr(
        VectorStore, "_ivf_spill_dispatch",
        lambda self, bs, *a, **k: calls.append(len(bs))
        or orig_disp(self, bs, *a, **k))
    streamed = []
    orig_stream = VectorStore._scan_host_bucket
    monkeypatch.setattr(
        VectorStore, "_scan_host_bucket",
        lambda self, *a, **k: streamed.append(1)
        or orig_stream(self, *a, **k))

    q = np.stack([all_vecs[b][11] for b in range(n_b)])
    scores, ids = store.search_batch(q, k=2)
    # one failed union call, then one per bucket
    assert calls == [n_b] + [1] * n_b
    assert not streamed, "per-bucket probes fit — nothing streams"
    for b in range(n_b):
        assert ids[b][0] == b * 512 + 11
        assert scores[b][0] == pytest.approx(1.0, abs=1e-2)
    store.close()

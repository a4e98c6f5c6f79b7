"""Randomized differential test for the device vector store.

Seeded random op sequences — batched adds (sizes crossing the arena
headroom and SEAL boundaries), per-file deletes, searches, reopens —
against a numpy brute-force oracle. Exercises the LSM bucket state
machine: arena in-place extension, overflow rebuilds, bulk-append
sealing + bypassed-bucket freezing, tail consolidation, tombstone mask
refresh, and disk compaction on reload.
"""

import random
from pathlib import Path

import numpy as np
import pytest

from sema_tpu.index.vector_store import VectorStore
from sema_tpu.types import Chunk


@pytest.mark.parametrize("spill", [None, "all", "mixed", "ivf",
                                   "ivf+spill"])
@pytest.mark.parametrize("seed", [3, 41])
def test_differential_fuzz(tmp_path, seed, spill, monkeypatch):
    monkeypatch.setattr(VectorStore, "SEAL_ROWS", 96)
    monkeypatch.setattr(VectorStore, "MAX_TAIL_BUCKETS", 3)
    # the spill axis reruns the whole state machine with sealed buckets
    # forced host-resident ("all") or split across device + host
    # ("mixed" — ~2 sealed device buckets of 8 KiB fit the 0.02 MB
    # budget); slices are smaller than buckets so multi-slice streaming
    # with partial tails is exercised too. "ivf+spill" combines both:
    # host-resident buckets big enough (≥2 IVF tiles) probe through the
    # cluster-major disk blob (_ivf_spill_dispatch), smaller ones fall
    # back to the streamed scan — mixed per bucket, same oracle.
    ivf = spill in ("ivf", "ivf+spill")
    if spill in ("all", "ivf+spill"):
        monkeypatch.setenv("SEMA_TPU_HBM_BUDGET_MB", "0.000001")
        monkeypatch.setattr(VectorStore, "SPILL_SLICE_ROWS", 64)
    elif spill == "mixed":
        monkeypatch.setenv("SEMA_TPU_HBM_BUDGET_MB", "0.02")
        monkeypatch.setattr(VectorStore, "SPILL_SLICE_ROWS", 64)
    else:
        monkeypatch.delenv("SEMA_TPU_HBM_BUDGET_MB", raising=False)
    if ivf:
        # the IVF axis drives the full state machine with sealed buckets
        # k-means-clustered (permuted cluster-major) and searches routed
        # through the PRUNED scalar-prefetch kernel — at FULL probe
        # coverage (nprobe ∞, budget = every tile) so results stay
        # bit-equal to the exact scan and the same oracle applies; what
        # this fuzzes is the permutation machinery (id map-back,
        # tombstone masks permuted per bucket, arena/seal/consolidate/
        # reopen transitions on clustered buckets). The recall trade of
        # real pruning is covered by test_ivf + tools/ivf_bench.py.
        monkeypatch.setenv("SEMA_TPU_SCAN_BACKEND", "pallas")
        monkeypatch.setenv("SEMA_TPU_IVF_NPROBE", "99999")
        # ivf+spill: buckets split at SEAL_ROWS stay under ~250 rows, so
        # the blob probe's ≥2-tile gate needs the smaller tile to engage.
        # On REAL TPU hardware (sweeps — CI runs CPU interpret) Mosaic
        # requires 128-lane blocks: keep tile=128 and raise SEAL_ROWS so
        # buckets reach the 2-tile gate instead.
        import jax
        on_tpu_hw = jax.default_backend() == "tpu"
        tile = (128 if on_tpu_hw else 64) if spill == "ivf+spill" else 128
        if spill == "ivf+spill" and on_tpu_hw:
            monkeypatch.setattr(VectorStore, "SEAL_ROWS", 256)
        monkeypatch.setattr(VectorStore, "IVF_TILE", tile)
        monkeypatch.setattr(VectorStore, "IVF_CLUSTER_ROWS", tile)
        monkeypatch.setattr(VectorStore, "IVF_BUDGET_DIV", 1)
    rng = np.random.default_rng(seed)
    pyrng = random.Random(seed)
    d = 32
    store = VectorStore(tmp_path, dim=d, model="fuzz", ivf=ivf)

    rows = []          # (id, vec, alive)
    by_file = {}       # path -> [row indices]
    next_ord = 0

    def add_batch(n, path):
        nonlocal next_ord
        vecs = rng.standard_normal((n, d)).astype(np.float32)
        vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
        cs = [Chunk(id=f"{path}:{next_ord + j}", file_path=Path(path),
                    start_line=1, end_line=2, content="c")
              for j in range(n)]
        next_ord += n
        # randomize the embedding placement: host array, device-resident
        # jax.Array, or an EncodedBatch-like (host, device) pair — the
        # serve-time fast path's pending-device machinery must be
        # indistinguishable from the host path across every bucket
        # transition this fuzz drives (arena extension, overflow rebuild,
        # sealing, consolidation, reopen)
        placement = pyrng.random()
        if placement < 0.4:
            store.add_chunks(cs, vecs)
        elif placement < 0.7:
            import jax.numpy as jnp
            store.add_chunks(cs, jnp.asarray(vecs))
        else:
            import jax.numpy as jnp
            from sema_tpu.models.encoder import EncodedBatch
            store.add_chunks(cs, EncodedBatch(
                vecs.astype(store.np_dtype),
                jnp.asarray(vecs, dtype=jnp.bfloat16)))
        for c, v in zip(cs, vecs):
            by_file.setdefault(path, []).append(len(rows))
            rows.append([c.id, v, True])

    def check(k=5):
        live = [(r[0], r[1]) for r in rows if r[2]]
        if not live:
            assert store.search(rng.standard_normal(d).astype(
                np.float32), k=k) == []
            return
        q = rng.standard_normal(d).astype(np.float32)
        q /= np.linalg.norm(q)
        mat = np.stack([v for _, v in live]).astype(np.float32)
        # oracle in bf16 like the store (scores rounded identically)
        import ml_dtypes
        mat16 = mat.astype(ml_dtypes.bfloat16).astype(np.float32)
        want = mat16 @ q
        order = np.argsort(-want, kind="stable")[:k]
        want_ids = [live[i][0] for i in order]
        got = store.search(q, k=k)
        got_ids = [c.id for c, _ in got]
        # scores can tie at bf16 precision; compare score sequences and
        # membership rather than exact id order
        got_scores = np.array([s for _, s in got], dtype=np.float32)
        want_scores = want[order][:len(got)]
        np.testing.assert_allclose(got_scores, want_scores, atol=2e-3)
        assert len(got_ids) == len(want_ids)
        mism = [i for i, (g, w) in enumerate(zip(got_ids, want_ids))
                if g != w]
        for i in mism:   # any mismatch must be a genuine near-tie
            assert abs(got_scores[i] - want_scores[i]) <= 2e-3

    for step in range(40):
        op = pyrng.random()
        if op < 0.5 or not rows:
            n = pyrng.choice((3, 7, 16, 40, 100, 150))
            add_batch(n, f"f{pyrng.randint(0, 12)}.txt")
        elif op < 0.65 and by_file:
            path = pyrng.choice(list(by_file))
            want_n = sum(1 for i in by_file[path] if rows[i][2])
            got_n = store.remove_file_chunks(Path(path))
            assert got_n == want_n, (seed, step, path)
            for i in by_file[path]:
                rows[i][2] = False
        elif op < 0.75:
            store.close()
            store = VectorStore(tmp_path, dim=d, model="fuzz", ivf=ivf)
        else:
            check(pyrng.choice((1, 5, 20)))
        assert store.live_rows == sum(1 for r in rows if r[2]), (
            seed, step)
    check(10)
    if spill == "ivf":
        # non-vacuity: at least one sealed device bucket must have
        # clustered (incl. ones sealed in place by arena extension),
        # and the final check must have gone through the PRUNED
        # scalar-prefetch executable, not the exact-scan fallback
        sealed = [b for b in store.device_buckets()
                  if b["sealed"] and not b.get("host_resident")]
        # bulk-freeze can seal small fragments in place without
        # clustering them (they stay exact-scan buckets) — so `any`,
        # with the pruned-executable check as the real non-vacuity gate
        if sealed and any(r[2] for r in rows):
            assert any(b.get("ivf") is not None for b in sealed)
            assert any(key[0] == "ivf" for key in store._topk_fns)
    elif spill == "ivf+spill":
        # non-vacuity: a ≥2-tile spilled bucket must carry the blob
        # layout and the pruned executable must have been exercised
        host = [b for b in store.device_buckets()
                if b.get("host_resident")]
        if any(b["rows"] >= 2 * VectorStore.IVF_TILE for b in host):
            assert any(b.get("ivf_spill") is not None for b in host)
            assert any(key[0] == "ivf" for key in store._topk_fns)
    store.close()

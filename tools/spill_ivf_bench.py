"""Spilled-IVF hardware benchmark: probe vs streamed exact over an
over-HBM (host-resident) store.

Builds a REAL on-disk VectorStore whose one sealed bucket is forced
host-resident (SEMA_TPU_HBM_BUDGET_MB), with IVF on — so the build
persists the cluster-major blob sidecar (index/ivf_cache.py) — and
measures END-TO-END ``search_batch`` wall time for:

  1. the pruned probe (gather probed tiles from the blob, upload a
     probe-sized staging buffer, pruned kernel), and
  2. the streamed exact scan (same store reopened with SEMA_TPU_IVF=0:
     every byte of the bucket staged host→device per batch),

plus recall@k of (1) against (2)'s oracle ids and the staged upload
bytes of each. Wall time is the honest metric here: the spill path is
host-dominated (disk gather + H2D), not kernel-dominated.

On the tunneled dev box H2D is ~0.03-0.05 GB/s, so the ratio mostly
measures upload-byte savings; on local-PCIe hardware (8-32 GB/s) the
same byte ratio holds but absolute times shrink ~1000x. The corpus is
synthetic-but-clustered like tools/ivf_bench.py (see its docstring for
why iid-random corpora say nothing about IVF recall).

Prints ONE JSON line. Usage:
    python tools/spill_ivf_bench.py [--rows 262144] [--dim 384] [--q 4]

100M-class runs (BASELINE config 5's corpus scale on ONE chip) build in
slices, use int8 quantized blobs (half the staged upload; exact scores
via the store's full-precision rescore), and time the streamed-exact leg
as a single oracle pass:
    python tools/spill_ivf_bench.py --rows 67108864 --slice-rows 4194304 \
        --store-dtype int8 --centers 131072 --exact-oracle-only \
        --keep /path/with/100G/free
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def _centers(centers: int, dim: int) -> np.ndarray:
    rng = np.random.default_rng(0)
    cent = rng.standard_normal((centers, dim), dtype=np.float32)
    cent /= np.linalg.norm(cent, axis=1, keepdims=True)
    return cent


def _slice_corpus(cent: np.ndarray, n: int, dim: int, noise: float,
                  slice_idx: int) -> np.ndarray:
    """One slice of the clustered corpus — deterministic per
    (slice_idx), so 100M-class builds never materialize the whole
    corpus and the query prep can regenerate slice 0 alone."""
    rng = np.random.default_rng([1234, slice_idx])
    g = rng.integers(0, len(cent), size=n)
    x = cent[g] + (noise / np.sqrt(dim)) * rng.standard_normal(
        (n, dim), dtype=np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    return x


def _queries(x0: np.ndarray, dim: int, qnoise: float,
             qn: int) -> tuple:
    """Perturbed-row queries drawn from slice 0 (their true nearest
    neighbors may live in ANY slice — same-center rows are spread
    uniformly). Returns (queries, source rows)."""
    rng = np.random.default_rng(99)
    qrows = rng.integers(0, len(x0), size=qn)
    q = x0[qrows] + (qnoise / np.sqrt(dim)) * rng.standard_normal(
        (qn, dim), dtype=np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    return q, qrows


def _chunks(lo: int, hi: int, fname: str):
    from sema_tpu.types import Chunk
    return [Chunk(id=f"{fname}:{i}", file_path=Path(fname),
                  start_line=i, end_line=i, content=f"row {i}")
            for i in range(lo, hi)]


def _measure(store, queries: np.ndarray, k: int, repeats: int):
    """Median end-to-end search_batch wall seconds (after one warm-up
    dispatch that pays compiles)."""
    store.search_batch(queries, k)
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        scores, ids = store.search_batch(queries, k)
        times.append(time.perf_counter() - t0)
    return float(np.median(times)), ids


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=262144)
    ap.add_argument("--dim", type=int, default=384)
    ap.add_argument("--q", type=int, default=1,
                    help="query batch (interactive default 1: a large "
                         "batch's tile union exceeds the probe budget "
                         "by design and streams instead)")
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--centers", type=int, default=2048)
    ap.add_argument("--noise", type=float, default=1.5)
    ap.add_argument("--qnoise", type=float, default=1.0)
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--recall-queries", type=int, default=16,
                    help="extra single-query probes scored against one "
                         "streamed exact batch for the recall estimate")
    ap.add_argument("--keep", type=str, default=None,
                    help="reuse/keep the store at this dir (skips the "
                         "build when the manifest already exists)")
    ap.add_argument("--seal-rows", type=int, default=None,
                    help="override SEAL_ROWS/IVF geometry for small "
                         "CPU smoke runs")
    ap.add_argument("--slice-rows", type=int, default=0,
                    help="build the store in slices of this many rows "
                         "(one segment ≈ one spilled bucket each; 0 = "
                         "one-shot). Required past ~10M rows: the "
                         "corpus is generated per slice and never "
                         "materialized whole")
    ap.add_argument("--store-dtype", type=str, default="bfloat16",
                    choices=("bfloat16", "int8"),
                    help="int8: quantized spill blobs — half the "
                         "staged probe upload; full-precision rescore")
    ap.add_argument("--nprobe", type=int, default=None,
                    help="override SEMA_TPU_IVF_NPROBE for this run")
    ap.add_argument("--exact-oracle-only", action="store_true",
                    help="time the streamed exact leg as ONE oracle "
                         "batch instead of warmup+repeats — for stores "
                         "whose full stream takes tens of minutes")
    ap.add_argument("--split-ab", action="store_true",
                    help="same-process interleaved A/B of the two-half "
                         "staging overlap (SEMA_TPU_IVF_SPLIT=1 vs 0)")
    ap.add_argument("--deadline-s", type=float, default=None,
                    help="soft wall-clock budget: the tool sheds work "
                         "(fewer recall queries, one-batch streamed "
                         "leg) and exits cleanly with partial evidence "
                         "instead of overrunning — a parent that "
                         "SIGKILLs a JAX process mid-dispatch wedges "
                         "the device for minutes (docs/PERF.md "
                         "\"Environment gotchas\")")
    args = ap.parse_args()

    t_start = time.perf_counter()

    def overtime() -> bool:
        return (args.deadline_s is not None
                and time.perf_counter() - t_start > args.deadline_s)

    # force the sealed bucket host-resident BEFORE the store is built
    os.environ.setdefault("SEMA_TPU_HBM_BUDGET_MB", "16")
    if args.nprobe is not None:
        os.environ["SEMA_TPU_IVF_NPROBE"] = str(args.nprobe)
    from sema_tpu.utils.jaxcache import enable as enable_comp_cache
    enable_comp_cache()
    import jax
    from sema_tpu.index.vector_store import VectorStore

    if args.seal_rows:
        VectorStore.SEAL_ROWS = args.seal_rows
        VectorStore.IVF_TILE = max(128, args.seal_rows // 8)
        VectorStore.IVF_CLUSTER_ROWS = VectorStore.IVF_TILE

    rows = args.rows - args.rows % VectorStore.IVF_TILE
    slice_rows = args.slice_rows or rows
    slice_rows -= slice_rows % VectorStore.IVF_TILE
    work = Path(args.keep) if args.keep else Path(
        tempfile.mkdtemp(prefix="spill-ivf-"))
    work.mkdir(parents=True, exist_ok=True)
    dev = jax.devices()[0]
    print(f"# device {dev}  rows {rows}x{args.dim} {args.store_dtype}"
          f"  slices of {slice_rows}  dir {work}",
          file=sys.stderr, flush=True)

    rq = max(args.q, args.recall_queries)
    cent = _centers(args.centers, args.dim)
    x0 = _slice_corpus(cent, min(slice_rows, rows), args.dim,
                       args.noise, 0)
    q_all, _ = _queries(x0, args.dim, args.qnoise, rq)
    q = q_all[:args.q]

    os.environ["SEMA_TPU_IVF"] = "1"
    store = VectorStore(work, args.dim, "bench", ivf=True,
                        store_dtype=args.store_dtype)
    built = store.total_rows
    if built == 0:
        t0 = time.perf_counter()
        for s, lo in enumerate(range(0, rows, slice_rows)):
            hi = min(lo + slice_rows, rows)
            x = x0 if s == 0 else _slice_corpus(
                cent, hi - lo, args.dim, args.noise, s)
            store.add_chunks(_chunks(lo, hi, f"corpus-{s}.txt"),
                             x[:hi - lo])
            print(f"# slice {s}: rows {lo}..{hi} written "
                  f"({time.perf_counter() - t0:.0f}s)",
                  file=sys.stderr, flush=True)
        build_s = time.perf_counter() - t0
        print(f"# built in {build_s:.1f}s", file=sys.stderr, flush=True)
    else:
        assert built == rows, f"kept store has {built} rows, want {rows}"
    del x0
    t0 = time.perf_counter()
    buckets = store.device_buckets()   # spilled-IVF layouts build here
    print(f"# bucket/IVF layout build: {time.perf_counter() - t0:.1f}s",
          file=sys.stderr, flush=True)
    spilled = [b for b in buckets if b.get("host_resident")]
    assert spilled and spilled[0].get("ivf_spill") is not None, \
        "store did not spill with an IVF blob (bench is vacuous)"
    tile = store._spill_tile()    # the blob/probe tile, not IVF_TILE
    n_tiles = sum(b["ivf_spill"]["n_pad"] // tile for b in spilled
                  if b.get("ivf_spill"))

    probe_s, _ = _measure(store, q, args.k, args.repeats)
    split_ab = None
    if args.split_ab and not overtime():
        # Same-process interleaved A/B of the two-half staging overlap:
        # SEMA_TPU_IVF_SPLIT is read per dispatch
        # (vector_store.py:_ivf_spill_dispatch), so both arms share one
        # process / store / persisted layout — the only decision-grade
        # comparison on this box (PERF.md "Environment gotchas":
        # cross-process absolutes vary ±2x on sub-10 ms readings).
        # Warm both arms' compiled size classes before timing.
        for arm in ("0", "1"):
            os.environ["SEMA_TPU_IVF_SPLIT"] = arm
            store.search_batch(q, args.k)
        arms: dict = {"1": [], "0": []}
        ids_by_arm: dict = {}
        for _ in range(args.repeats):
            for arm in ("1", "0"):
                os.environ["SEMA_TPU_IVF_SPLIT"] = arm
                t0 = time.perf_counter()
                _, ids = store.search_batch(q, args.k)
                arms[arm].append(time.perf_counter() - t0)
                ids_by_arm[arm] = ids
        os.environ.pop("SEMA_TPU_IVF_SPLIT", None)
        split_s = float(np.median(arms["1"]))
        unsplit_s = float(np.median(arms["0"]))
        split_ab = {
            "split_s": round(split_s, 4),
            "unsplit_s": round(unsplit_s, 4),
            "split_speedup": round(unsplit_s / split_s, 3),
            "ids_equal": bool(np.array_equal(ids_by_arm["1"],
                                             ids_by_arm["0"])),
        }
    # recall sample: one probe per query (the interactive shape). Under
    # a deadline, shed queries past a 32-query floor — a smaller honest
    # distribution beats a SIGKILLed run that records nothing.
    probe_id_rows = []
    for i in range(rq):
        probe_id_rows.append(store.search_batch(q_all[i:i + 1],
                                                args.k)[1][0])
        if len(probe_id_rows) >= 32 and overtime():
            break
    rq = len(probe_id_rows)
    q_all = q_all[:rq]
    probe_ids = np.stack(probe_id_rows)
    # staged bytes of one dispatch: EVERY spilled bucket stages its own
    # probe (search_batch walks them all), so sum across buckets —
    # reporting only bucket 0 understated a 4-bucket store's upload 4x
    from sema_tpu.ops.ivf import select_tiles
    from sema_tpu.index.vector_store import _stage_tiles
    itemsize = np.dtype(np.float16).itemsize  # bf16 width (streamed path)
    probe_bytes, n_live, staged_tiles = 0, 0, 0
    for b in spilled:
        iv = b.get("ivf_spill")
        if iv is None:    # too small for the blob gate: streams whole
            probe_bytes += b["rows"] * args.dim * itemsize
            continue
        # int8 blobs stage 1 byte/elem + a 4-byte per-row scale
        row_bytes = (args.dim + 4 if iv.get("scales") is not None
                     else args.dim * itemsize)
        bt = iv["n_pad"] // tile
        budget = max(2, bt // VectorStore.IVF_BUDGET_DIV)
        sel = select_tiles(iv["centroids"], iv["starts"],
                           q.astype(np.float32), store.ivf_nprobe,
                           tile, budget)
        if sel is None:   # over-budget bucket streams whole (bf16)
            probe_bytes += iv["n_pad"] * args.dim * itemsize
            continue
        b_eff = _stage_tiles(int(sel[1]), budget)
        n_live += int(sel[1])
        staged_tiles += b_eff
        probe_bytes += b_eff * tile * row_bytes
    store.close()

    os.environ["SEMA_TPU_IVF"] = "0"
    store2 = VectorStore(work, args.dim, "bench", ivf=False,
                         store_dtype=args.store_dtype)
    exact_bytes = rows * args.dim * itemsize
    oracle_only = bool(args.exact_oracle_only or overtime())
    if oracle_only:
        # 100M-class stores: one full stream is tens of minutes — time
        # the oracle batch itself (the streamed scan's wall is
        # upload-bound and independent of the query-batch size)
        t0 = time.perf_counter()
        _, oracle_ids = store2.search_batch(q_all, args.k)
        exact_s = time.perf_counter() - t0
    else:
        exact_s, _ = _measure(store2, q, args.k, args.repeats)
        # the streamed scan has no probe budget: ONE exact batch scores
        # the whole recall sample in a single store pass
        _, oracle_ids = store2.search_batch(q_all, args.k)
    store2.close()

    # per-query recall DISTRIBUTION, not just the mean: an 8-query point
    # estimate hides the tail entirely (r4's 0.875 meant literally one
    # bad query out of eight) — report p5/min like the device-IVF rung
    per_q = np.asarray([
        len(set(probe_ids[i].tolist()) & set(oracle_ids[i].tolist()))
        / args.k for i in range(rq)])
    recall = float(per_q.mean())

    out = {
        "metric": "spill_ivf_probe_speedup",
        "value": round(exact_s / probe_s, 2),
        "unit": "x vs streamed exact (end-to-end batch wall)",
        "rows": rows, "dim": args.dim, "q_batch": args.q,
        "recall_at_k": round(recall, 4), "k": args.k,
        "recall_queries": rq,
        "recall_p5": round(float(np.percentile(per_q, 5)), 4),
        "recall_min": round(float(per_q.min()), 4),
        "probe_batch_s": round(probe_s, 4),
        "streamed_batch_s": round(exact_s, 4),
        "probe_upload_mb": round(probe_bytes / 1e6, 1),
        "streamed_upload_mb": round(exact_bytes / 1e6, 1),
        "probed_tiles": n_live, "staged_tiles": staged_tiles,
        "spilled_buckets": len(spilled),
        "total_tiles": n_tiles, "nprobe": store.ivf_nprobe,
        "store_dtype": args.store_dtype,
        "exact_oracle_only": oracle_only,
        "split_ab": split_ab,
        "backend": jax.default_backend(),
    }
    print(json.dumps(out), flush=True)
    if not args.keep:
        shutil.rmtree(work, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())

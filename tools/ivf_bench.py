"""IVF (pruned ANN scan) hardware benchmark: recall/latency vs the exact scan.

Measures, at the production bucket geometry (ops/ivf.py +
vector_store.IVF_TILE/IVF_CLUSTER_ROWS/IVF_BUDGET_DIV), on whatever
backend is attached:

  1. k-means build cost for one store's worth of rows (device Lloyd),
  2. exact-scan single-query device latency (baseline),
  3. pruned-scan device latency + recall@k vs the exact oracle across an
     ``nprobe`` sweep, with the scanned-tile fraction per rung.

The corpus is synthetic-but-clustered: rows = unit Gaussian cluster
centers + per-dim noise scaled by 1/sqrt(dim), so ``--noise`` is the
RATIO of total noise norm to center norm (0.5 = tight clusters with
within-cluster cosine ~0.9; 1.5 = loose, ~0.57). Pure iid-random
vectors have NO cluster structure — IVF recall on them measures
nothing but the scanned fraction (measured: 0.18 recall at 6% scanned,
r3) and says nothing about real embedding corpora, which are strongly
clustered. Queries are perturbed corpus rows (a query resembles its
answers; ``--qnoise`` is the same ratio for the perturbation).

Latency on tunneled boxes: single dispatches floor at the host pump
rate (~2.5-3 ms/call this session — docs/PERF.md "dispatch-rate-bound"),
which completely hides a sub-ms pruned scan. Each latency rung
therefore dispatches ONE jitted program that runs ``chain`` scans
back-to-back under ``lax.scan`` and divides; the chain is sized so
device time exceeds the pump floor.

Prints ONE JSON line. Usage:
    python tools/ivf_bench.py [--rows 1048576] [--dim 384] [--q 64]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def _measure_device(fn_one, n_calls: int = 16, repeats: int = 3):
    """Sustained wall time per dispatch: bench.py's pipelined best-block
    min-estimator (shared so honest-fetch fixes land in ONE place),
    adapted to an index-taking thunk."""
    from bench import _measure_device as _md
    return _md(lambda i: fn_one(int(i)), np.arange(4), n_calls=n_calls,
               repeats=repeats)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1 << 20)
    ap.add_argument("--dim", type=int, default=384)
    ap.add_argument("--q", type=int, default=64, help="recall query count")
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--centers", type=int, default=4096,
                    help="true generative clusters in the corpus")
    ap.add_argument("--noise", type=float, default=1.5,
                    help="corpus noise-to-center norm ratio")
    ap.add_argument("--qnoise", type=float, default=1.0,
                    help="query perturbation ratio")
    ap.add_argument("--nprobe", type=int, nargs="*",
                    default=[8, 16, 32, 64])
    ap.add_argument("--chain", type=int, default=64,
                    help="pruned scans per latency dispatch")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from functools import partial

    from sema_tpu.utils.jaxcache import enable as enable_comp_cache
    enable_comp_cache()

    from sema_tpu.index.vector_store import VectorStore
    from sema_tpu.ops.ivf import cluster_layout, kmeans_cluster, select_tiles
    from sema_tpu.ops.pallas_topk import pallas_topk_pruned, pallas_topk_scores

    tile = VectorStore.IVF_TILE
    rows = args.rows - args.rows % 8192  # kmeans block alignment
    dim, k, qn = args.dim, args.k, args.q
    c = max(16, rows // VectorStore.IVF_CLUSTER_ROWS)
    n_tiles = rows // tile
    budget = max(2, n_tiles // VectorStore.IVF_BUDGET_DIV)
    on_tpu = jax.default_backend() == "tpu"
    interp = not on_tpu
    dev = jax.devices()[0]
    print(f"# device {dev}  rows {rows}x{dim}  c {c}  tiles {n_tiles} "
          f"budget {budget}", file=sys.stderr, flush=True)

    # --- clustered corpus, built on device (no big host->device copy)
    key = jax.random.key(0)
    kc, kg, kn, kq, kp = jax.random.split(key, 5)
    sig = args.noise / np.sqrt(dim)
    qsig = args.qnoise / np.sqrt(dim)

    @jax.jit
    def make_store(kc, kg, kn):
        cent = jax.random.normal(kc, (args.centers, dim), jnp.float32)
        cent = cent / jnp.linalg.norm(cent, axis=1, keepdims=True)
        g = jax.random.randint(kg, (rows,), 0, args.centers)
        x = cent[g] + sig * jax.random.normal(kn, (rows, dim), jnp.float32)
        x = x / jnp.linalg.norm(x, axis=1, keepdims=True)
        return x.astype(jnp.bfloat16)

    store = jax.block_until_ready(make_store(kc, kg, kn))
    valid = jnp.ones((rows,), dtype=bool)

    # queries: perturbed corpus rows (each query has genuine neighbors)
    @jax.jit
    def make_queries(store, kq, kp):
        rows_q = jax.random.randint(kq, (qn,), 0, rows)
        x = store[rows_q].astype(jnp.float32) + qsig * jax.random.normal(
            kp, (qn, dim), jnp.float32)
        return x / jnp.linalg.norm(x, axis=1, keepdims=True)

    queries = jax.block_until_ready(make_queries(store, kq, kp))

    # --- IVF build: device k-means + cluster-major permutation
    print("# stage: kmeans build", file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    assign, cent = kmeans_cluster(store, c)
    assign = np.asarray(assign)  # the store's build does this fetch too
    build_s = time.perf_counter() - t0
    perm, starts = cluster_layout(assign, c + 1)
    perm_j = jnp.asarray(perm)
    store_perm = jax.block_until_ready(
        jax.jit(lambda s, p: s[p])(store, perm_j))
    cent_np = np.asarray(cent)

    # --- exact oracle + chained baseline latency
    print("# stage: exact scan", file=sys.stderr, flush=True)
    exact = jax.jit(partial(pallas_topk_scores, k=k,
                            tile_n=2048 if on_tpu else tile,
                            interpret=interp, masked=False))
    oracle_ids = np.asarray(exact(store, queries, valid)[1])

    chain_exact = 4 if on_tpu else 1

    @jax.jit
    def exact_chain(store, qs, valid):
        def body(_, q1):
            return None, exact(store, q1, valid)
        _, out = jax.lax.scan(body, None, qs)
        return out

    # (chain, 1, d) input pools, pre-rolled: extra device ops inside the
    # timed loop would halve the pipeline's dispatch rate on the tunnel
    qpools = [jnp.roll(queries[:chain_exact][:, None, :], i, axis=0)
              for i in range(4)]
    jax.block_until_ready(qpools)
    exact_single_s = _measure_device(
        lambda i: exact_chain(store, qpools[i % 4], valid),
        n_calls=8 if on_tpu else 1) / chain_exact

    # --- pruned sweep
    pruned = jax.jit(partial(pallas_topk_pruned, k=k, tile_n=tile,
                             interpret=interp))

    @jax.jit
    def pruned_chain(store, qs, valid, tiles, nls):
        def body(_, inp):
            q1, t1, nl1 = inp
            return None, pruned(store, q1, valid, t1, nl1)
        _, out = jax.lax.scan(body, None, (qs, tiles, nls))
        return out

    qnp = np.asarray(queries, np.float32)
    rungs = {}
    for nprobe in args.nprobe:
        # per-single-query tile lists, precomputed (the store does this
        # host probe per dispatch; it is host-side and ~free vs the scan)
        t0 = time.perf_counter()
        sels = [select_tiles(cent_np, starts, qnp[i:i + 1], nprobe, tile,
                             budget) for i in range(qn)]
        probe_ms = (time.perf_counter() - t0) / qn * 1e3
        if any(s is None for s in sels):
            rungs[f"nprobe{nprobe}"] = {"fallback": True}
            continue
        tiles_np = np.stack([s[0] for s in sels])
        nlive = np.array([s[1] for s in sels], np.int64)
        tiles_j = jnp.asarray(tiles_np)
        nl_j = jnp.asarray(nlive[:, None].astype(np.int32))

        # recall@k of the single-query pruned scan vs the exact oracle —
        # the full per-query distribution, not just the mean (VERDICT r3
        # weak #8: a point estimate from small samples hides the worst
        # tail; recall_p5 is the 5th-percentile per-query recall)
        got_all = []
        for i in range(qn):
            s, ids = pruned(store_perm, queries[i:i + 1], valid,
                            tiles_j[i], nl_j[i])
            got_all.append(np.asarray(ids)[0])
        recs = np.empty(qn)
        for i in range(qn):
            got = set(perm[got_all[i]].tolist())
            recs[i] = len(got & set(oracle_ids[i].tolist())) / k
        recall = float(recs.mean())
        recall_p5 = float(np.percentile(recs, 5))
        recall_min = float(recs.min())

        # chained latency: one dispatch = `chain` pruned scans
        chain = args.chain if on_tpu else 1
        reps = max(1, (chain - 1) // qn + 1)
        qs_c = jnp.tile(queries[:, None, :], (reps, 1, 1))[:chain]
        t_c = jnp.tile(tiles_j, (reps, 1))[:chain]
        nl_c = jnp.tile(nl_j, (reps, 1))[:chain]
        pools = [(jnp.roll(qs_c, i, axis=0), jnp.roll(t_c, i, axis=0),
                  jnp.roll(nl_c, i, axis=0)) for i in range(4)]
        jax.block_until_ready(pools)
        def one_chain(i):
            qs, ts, nls = pools[i % 4]
            return pruned_chain(store_perm, qs, valid, ts, nls)
        single_s = _measure_device(one_chain,
                                   n_calls=8 if on_tpu else 1) / chain
        rungs[f"nprobe{nprobe}"] = {
            "recall_at_k": round(recall, 4),
            "recall_p5": round(recall_p5, 4),
            "recall_min": round(recall_min, 4),
            "single_query_ms_device": round(single_s * 1e3, 4),
            "tiles_scanned_frac": round(float(nlive.mean()) / n_tiles, 4),
            "host_probe_ms": round(probe_ms, 3),
            "speedup_vs_exact": round(exact_single_s / single_s, 2),
        }
        print(f"# nprobe {nprobe}: {rungs[f'nprobe{nprobe}']}",
              file=sys.stderr, flush=True)

    out = {
        "metric": f"ivf_pruned_scan_{rows // 1000}k_{dim}d",
        "rows": rows, "dim": dim, "k": k, "clusters": c,
        "tile": tile, "budget_tiles": budget, "q": qn,
        "noise": args.noise, "qnoise": args.qnoise,
        "centers": args.centers,
        "kmeans_build_s": round(build_s, 2),
        "exact_single_query_ms": round(exact_single_s * 1e3, 3),
        "device": str(dev),
        "rungs": rungs,
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())

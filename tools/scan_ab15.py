"""Scan A/B #15: warm-start threshold (vs the shipped cold-start scan).

Hypothesis (VERDICT r3 #5): the residual gap between the shipped scan
(~3.0-3.3 ms/batch-256 at 1M×384) and its measured matmul+stream base
(1.94 ms) is early-tile merge churn that the threshold screen cannot
reject while the running top-k is still NEG-initialized. Pre-scoring a
small store prefix in XLA and seeding each query's threshold with the
sample k-th best (minus one ULP — exactness argument in
ops/pallas_topk.py:_merge_and_emit) lets the screen reject those tiles
from step 0.

Usage:  python tools/scan_ab15.py [--rows 1048576] [--interpret]
        [--warm 2048 4096 8192]
Prints per-variant device ms/batch + ids-identical verdict; exits
nonzero on a correctness mismatch. Same-process A/B, pipelined
best-of blocks, honest np.asarray fetch (docs/PERF.md measurement
rules).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

import jax

if os.environ.get("SEMA_TPU_PLATFORM"):
    # the axon TPU plugin overrides JAX_PLATFORMS; the config flag wins
    jax.config.update("jax_platforms", os.environ["SEMA_TPU_PLATFORM"])

import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, ".")
from sema_tpu.ops.pallas_topk import pallas_topk  # noqa: E402
from sema_tpu.utils import jaxcache  # noqa: E402

jaxcache.enable()


def _fetch(out):
    leaf = jax.tree.leaves(out)[0]
    return np.asarray(leaf if leaf.ndim == 0 else leaf[:1])


def measure(fn_one, xs, n_calls=32, repeats=3):
    _fetch(fn_one(xs[0]))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = None
        for i in range(n_calls):
            out = fn_one(xs[i % xs.shape[0]])
        _fetch(out)
        best = min(best, (time.perf_counter() - t0) / n_calls)
    return best


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--rows", type=int, default=1_048_576)
    ap.add_argument("--dim", type=int, default=384)
    ap.add_argument("--qbatch", type=int, default=256)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--tile-n", type=int, default=2048)
    ap.add_argument("--warm", type=int, nargs="+",
                    default=[2048, 4096, 8192])
    ap.add_argument("--interpret", action="store_true")
    args = ap.parse_args()

    n, d, qn, k = args.rows, args.dim, args.qbatch, args.k
    interp = args.interpret or jax.default_backend() != "tpu"
    rng = np.random.default_rng(0)

    print(f"# device: {jax.devices()[0]}, {n}x{d} bf16, Q={qn}, k={k}, "
          f"interpret={interp}", file=sys.stderr, flush=True)

    store_np = rng.standard_normal((n, d)).astype(np.float32)
    store_np /= np.linalg.norm(store_np, axis=1, keepdims=True)
    store = jnp.asarray(store_np, dtype=jnp.bfloat16)
    del store_np
    valid = jnp.ones((n,), dtype=bool)
    qsets_np = rng.standard_normal((4, qn, d)).astype(np.float32)
    qsets_np /= np.linalg.norm(qsets_np, axis=2, keepdims=True)
    qsets = jnp.asarray(qsets_np)
    store, valid, qsets = jax.block_until_ready((store, valid, qsets))

    variants = {"cold": 0}
    for w in args.warm:
        variants[f"warm{w}"] = w

    results = {}
    ref_ids = None
    fail = False
    for name, w in variants.items():
        def fn(q, w=w):
            return pallas_topk(store, q, valid, k, tile_n=args.tile_n,
                               interpret=interp, masked=False,
                               warm_rows=w)
        # correctness first (full id fetch ONCE per variant — small)
        ids = np.asarray(fn(qsets[0])[1])
        if ref_ids is None:
            ref_ids = ids
        elif not np.array_equal(ids, ref_ids):
            bad = np.nonzero(ids != ref_ids)
            print(f"!! {name}: ids MISMATCH at {bad[0][:5]}",
                  file=sys.stderr)
            fail = True
        ms = measure(fn, qsets, n_calls=16 if interp else 64) * 1e3
        results[name] = round(ms, 3)
        print(f"# {name}: {ms:.3f} ms/batch-{qn}"
              + ("" if name == "cold" else
                 f"  ({results['cold'] / ms:.2f}x vs cold)"),
              file=sys.stderr, flush=True)

    # single-query variant (serving path's latency class)
    singles = jnp.asarray(qsets[:, :1, :])
    for name, w in list(variants.items()):
        def fn1(q, w=w):
            return pallas_topk(store, q, valid, k, tile_n=args.tile_n,
                               interpret=interp, masked=False,
                               warm_rows=w)
        ms = measure(fn1, singles, n_calls=16 if interp else 32) * 1e3
        results[name + "_q1"] = round(ms, 3)
        print(f"# {name} single-query: {ms:.3f} ms", file=sys.stderr,
              flush=True)

    print(json.dumps({"rows": n, "dim": d, "qbatch": qn, "k": k,
                      "ids_identical": not fail, "ms": results}))
    return 1 if fail else 0


if __name__ == "__main__":
    sys.exit(main())

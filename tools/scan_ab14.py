"""Scan A/B #14: per-lane candidate fold merge (vs shipped insertion merge).

Hypothesis (NOTES.md round-4 agenda item 2): the merge's cost is its
FULL-WIDTH (Q, TILE_N) VPU passes per extraction round. In the scan's
steady state almost every row has ≤1 survivor per 128-lane column, so a
per-lane top-1 fold — m1/c1 (Q, 128) built in one pass of 16 lane-slice
ops — captures every insertable candidate, and the extraction rounds
then run on (Q, 128) arrays: ~16× narrower per round. Rows with ≥2
survivors in one lane (rare; all early tiles) take the shipped
full-width path, gated per tile on the per-lane survivor counts.

Tie-order parity with the shipped kernel/oracle: the round selects
min(global column among tying lanes) via the folded c1, which equals
first-occurrence order because a within-lane value tie among survivors
forces the slow path (cl >= 2) and non-survivors can never tie a
survivor (both sides would be > thr).

Usage:  python tools/scan_ab14.py [--rows 1048576] [--interpret]
Prints per-variant device ms/batch and id-equality; exits nonzero on a
correctness mismatch. Same-process A/B, pipelined best-of blocks,
honest np.asarray fetch (docs/PERF.md measurement rules).
"""

from __future__ import annotations

import argparse
import functools
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")
from sema_tpu.ops.pallas_topk import (  # noqa: E402
    NEG, K_PAD, pallas_topk)
from sema_tpu.utils import jaxcache  # noqa: E402,F401  (persistent cache)


def _merge_and_emit_fold(scores, i, out_s_ref, out_i_ref,
                         run_s, run_i, wide, tmp_s, tmp_i, *, k: int,
                         tile_n: int):
    n_tiles = pl.num_programs(0)
    qn = scores.shape[0]
    G = tile_n // 128

    @pl.when(i == 0)
    def _():
        run_s[:] = jnp.full((qn, K_PAD), NEG, jnp.float32)
        run_i[:] = jnp.zeros((qn, K_PAD), jnp.int32)

    row0 = i * tile_n
    thr = run_s[:, k - 1:k]
    rowmax = jnp.max(scores, axis=1, keepdims=True)
    tile_best = jnp.max(rowmax - thr)

    @pl.when(tile_best > 0)
    def _():
        # per-lane survivor counts — 16 narrow ops, gates the fast path
        cl = jnp.zeros((qn, 128), jnp.int32)
        for g in range(G):
            s_g = scores[:, g * 128:(g + 1) * 128]
            cl = cl + (s_g > thr).astype(jnp.int32)
        cnt_max = jnp.max(jnp.sum(cl, axis=1))
        fast = jnp.max(cl) <= 1

        out_col = jax.lax.broadcasted_iota(jnp.int32, (qn, K_PAD), 1)
        big = jnp.int32(2**30)

        @pl.when(fast)
        def _():
            # fold all values (non-survivors are harmless: they extract
            # to insert positions >= k, the garbage zone)
            lane = jax.lax.broadcasted_iota(jnp.int32, (qn, 128), 1)
            m1 = jnp.full((qn, 128), NEG, jnp.float32)
            c1 = lane
            for g in range(G):
                s_g = scores[:, g * 128:(g + 1) * 128]
                gt = s_g > m1
                c1 = jnp.where(gt, g * 128 + lane, c1)
                m1 = jnp.where(gt, s_g, m1)

            def body(j, carry):
                m1, c1 = carry
                best = jnp.max(m1, axis=1, keepdims=True)     # (Q, 1)
                cand = jnp.where(m1 == best, c1, big)
                sel_col = jnp.min(cand, axis=1, keepdims=True)
                rs = run_s[:]
                ri = run_i[:]
                pos = jnp.sum((rs >= best).astype(jnp.int32), axis=1,
                              keepdims=True)
                tmp_s[:, 1:] = rs[:, :K_PAD - 1]
                tmp_i[:, 1:] = ri[:, :K_PAD - 1]
                run_s[:] = jnp.where(out_col < pos, rs,
                                     jnp.where(out_col == pos, best,
                                               tmp_s[:]))
                run_i[:] = jnp.where(out_col < pos, ri,
                                     jnp.where(out_col == pos,
                                               row0 + sel_col, tmp_i[:]))
                m1 = jnp.where(c1 == sel_col, NEG, m1)
                return (m1, c1)

            jax.lax.fori_loop(0, jnp.minimum(cnt_max, k), body, (m1, c1))

        @pl.when(jnp.logical_not(fast))
        def _():
            # shipped full-width path (pallas_topk._merge_and_emit body)
            col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
            wide[:] = scores

            def body(j, carry):
                s = wide[:]
                best = jnp.max(s, axis=1, keepdims=True)
                sel_col = jnp.min(jnp.where(s == best, col, big), axis=1,
                                  keepdims=True)
                wide[:] = jnp.where(col == sel_col, NEG, s)
                rs = run_s[:]
                ri = run_i[:]
                pos = jnp.sum((rs >= best).astype(jnp.int32), axis=1,
                              keepdims=True)
                tmp_s[:, 1:] = rs[:, :K_PAD - 1]
                tmp_i[:, 1:] = ri[:, :K_PAD - 1]
                run_s[:] = jnp.where(out_col < pos, rs,
                                     jnp.where(out_col == pos, best,
                                               tmp_s[:]))
                run_i[:] = jnp.where(out_col < pos, ri,
                                     jnp.where(out_col == pos,
                                               row0 + sel_col,
                                               tmp_i[:]))
                return carry

            jax.lax.fori_loop(0, jnp.minimum(cnt_max, k), body, 0)

    @pl.when(i == n_tiles - 1)
    def _():
        out_s_ref[:] = run_s[:]
        out_i_ref[:] = run_i[:]


def _fold_kernel(q_ref, store_ref, out_s_ref, out_i_ref,
                 run_s, run_i, wide, tmp_s, tmp_i, *, k: int, tile_n: int):
    i = pl.program_id(0)
    q = q_ref[:]
    tile = store_ref[:]
    scores = jax.lax.dot_general(
        q, tile, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    _merge_and_emit_fold(scores, i, out_s_ref, out_i_ref,
                         run_s, run_i, wide, tmp_s, tmp_i, k=k,
                         tile_n=tile_n)


@functools.partial(jax.jit, static_argnames=("k", "tile_n", "interpret"))
def fold_topk(store, queries, k: int, tile_n: int = 2048,
              interpret: bool = False):
    n, d = store.shape
    qn = queries.shape[0]
    grid = (n // tile_n,)
    kernel = functools.partial(_fold_kernel, k=k, tile_n=tile_n)
    out_s, out_i = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((qn, d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((qn, K_PAD), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((qn, K_PAD), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((qn, K_PAD), jnp.float32),
            jax.ShapeDtypeStruct((qn, K_PAD), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((qn, K_PAD), jnp.float32),
            pltpu.VMEM((qn, K_PAD), jnp.int32),
            pltpu.VMEM((qn, tile_n), jnp.float32),
            pltpu.VMEM((qn, K_PAD), jnp.float32),
            pltpu.VMEM((qn, K_PAD), jnp.int32),
        ],
        interpret=interpret,
    )(queries.astype(store.dtype), store)
    out_s = out_s[:, :k]
    out_s = jnp.where(out_s <= NEG, -jnp.inf, out_s)
    return out_s, out_i[:, :k]


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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1 << 20)
    ap.add_argument("--dim", type=int, default=384)
    ap.add_argument("--q", type=int, default=256)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--interpret", action="store_true",
                    help="semantics check on CPU interpret mode only")
    args = ap.parse_args()

    if args.interpret:
        # small-shape semantics check incl. duplicate-row ties
        rng = np.random.default_rng(0)
        n, d, qn, k = 8192, 128, 8, 10
        store_np = rng.standard_normal((n, d), dtype=np.float32)
        store_np[4096] = store_np[100]      # cross-tile duplicate (tie)
        store_np[5000] = store_np[5001]     # in-tile same-lane-region tie
        store = jnp.asarray(store_np, dtype=jnp.float32)
        qs = jnp.asarray(rng.standard_normal((qn, d), dtype=np.float32))
        valid = jnp.ones((n,), dtype=bool)
        ss, ii = fold_topk(store, qs, k, tile_n=1024, interpret=True)
        rs, ri = pallas_topk(store, qs, valid, k, tile_n=1024,
                             interpret=True, masked=False)
        ok = bool(jnp.all(ii == ri)) and bool(
            jnp.all(jnp.where(jnp.isfinite(ss), ss, 0)
                    == jnp.where(jnp.isfinite(rs), rs, 0)))
        print("interpret semantics:", "OK" if ok else "MISMATCH")
        if not ok:
            bad = np.nonzero(np.asarray(ii != ri))
            print("first mismatches:", bad[0][:5], bad[1][:5])
            print("fold ids", np.asarray(ii)[bad][:5],
                  "ref ids", np.asarray(ri)[bad][:5])
            sys.exit(1)
        return

    rng = np.random.default_rng(1)
    n, d, qn, k = args.rows, args.dim, args.q, args.k
    print(f"store {n}x{d} bf16, Q={qn}, k={k}")
    store = jnp.asarray(rng.standard_normal((n, d), dtype=np.float32),
                        dtype=jnp.bfloat16)
    qsets = jnp.asarray(rng.standard_normal((4, qn, d), dtype=np.float32))
    valid = jnp.ones((n,), dtype=bool)

    # no closure-jit: the store must be an ARGUMENT of the compiled
    # function — closed-over arrays embed as constants in the compile
    # payload and the tunnel's /remote_compile rejects GB-sized bodies
    # (HTTP 413)
    def ref(q):
        return pallas_topk(store, q, valid, k, masked=False)

    def var(q):
        return fold_topk(store, q, k)

    # correctness first
    rs, ri = ref(qsets[0])
    ss, ii = var(qsets[0])
    ids_eq = bool(jnp.all(ii == ri))
    sc_eq = bool(jnp.all(jnp.where(jnp.isfinite(ss), ss, 0)
                         == jnp.where(jnp.isfinite(rs), rs, 0)))
    print("ids equal:", ids_eq, " scores equal:", sc_eq)
    if not ids_eq:
        sys.exit(1)

    t_ref = measure(ref, qsets)
    t_var = measure(var, qsets)
    # interleave once more to bound drift
    t_ref2 = measure(ref, qsets)
    print(f"shipped: {t_ref*1e3:.2f} / {t_ref2*1e3:.2f} ms/batch   "
          f"fold: {t_var*1e3:.2f} ms/batch")


if __name__ == "__main__":
    main()

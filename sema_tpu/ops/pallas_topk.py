"""Pallas fused matvec + running top-k scan.

The XLA serving path (ops/hier_topk.py) materializes the (Q, N) score
matrix to HBM between the matmul and the selection — at 1M rows × 256
queries that is ~1 GB of extra HBM traffic on top of the 0.77 GB store
read. This kernel fuses the two: the store streams HBM→VMEM tile by tile
(Pallas double-buffers the grid automatically), scores are computed on the
MXU in VMEM, and a running top-k per query is maintained in VMEM scratch —
score traffic never touches HBM. One pass over the store at HBM bandwidth
is the speed-of-light for an exact scan; this kernel's overhead on top is
the in-VMEM merge.

Mosaic-friendly layout rules observed here (pallas_guide.md):
- every buffer is 128-lane aligned: the running/output top-k state is
  padded to K_PAD=128 columns (only the first k are live), the merge
  scratch is (Q, 2*K_PAD), and the validity mask enters as a
  (1, N) row vector blocked to (1, TILE_N);
- no ``concatenate``/``pad`` inside the kernel — the narrow merge stage
  composes candidates by slice-assignment into a (Q, 2*K_PAD) scratch;
- selection is K rounds of (max, min-index-of-tie, mask) — VPU reductions
  only, no sort/argmax/cumsum primitives (not lowerable on TPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -3.0e38  # effectively -inf; plain float so kernels embed it literally
K_PAD = 128    # lane-aligned width of the running top-k state


def _merge_and_emit(scores, i, out_s_ref, out_i_ref,
                    run_s, run_i, cand_s, cand_i, *, k: int, tile_n: int):
    """Shared tail of both scan kernels: init running state, threshold
    screen, in-place merge of this tile's (already masked) scores, and the
    final-tile emit. ``scores`` is (Q, TILE_N) f32 with NEG in dead slots.

    The merge is two-stage and touches no wide scratch (measured 1.55×
    over the earlier compose-into-(Q, TILE_N+K_PAD)-scratch design, whose
    wide copies dominated the kernel at batch 256 — docs/PERF.md):

    1. tile-local top-k straight off the ``scores`` value: k rounds of
       (max, first-tie column, mask) where the GLOBAL row id is simply
       ``row0 + sel_col`` — no id array is ever materialized at tile
       width;
    2. a narrow (Q, 2·K_PAD) merge of [running | tile-local] in scratch —
       k more rounds at 1/8 the width of the old full-width rounds.
    """
    n_tiles = pl.num_programs(0)
    qn = scores.shape[0]

    @pl.when(i == 0)
    def _():
        run_s[:] = jnp.full((qn, K_PAD), NEG, jnp.float32)
        run_i[:] = jnp.zeros((qn, K_PAD), jnp.int32)

    row0 = i * tile_n

    # threshold screen: the running top-k is stored rank-descending, so
    # column k-1 holds each query's current k-th best. A tile with no
    # score above any query's threshold cannot change the result — skip
    # its merge entirely (one cheap pass instead of k).
    thr = run_s[:, k - 1:k]                         # (Q, 1)
    tile_best = jnp.max(scores - thr)               # scalar

    @pl.when(tile_best > 0)
    def _():
        s = scores
        col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
        out_col = jax.lax.broadcasted_iota(jnp.int32, (qn, K_PAD), 1)
        big = jnp.int32(2**30)

        # stage 1: tile-local top-k (values + global ids via sel_col)
        loc_s = jnp.full((qn, K_PAD), NEG, jnp.float32)
        loc_i = jnp.zeros((qn, K_PAD), jnp.int32)
        for j in range(k):
            best = jnp.max(s, axis=1, keepdims=True)        # (Q, 1)
            sel_col = jnp.min(jnp.where(s == best, col, big), axis=1,
                              keepdims=True)                # first tie
            loc_s = jnp.where(out_col == j, best, loc_s)
            loc_i = jnp.where(out_col == j, row0 + sel_col, loc_i)
            s = jnp.where(col == sel_col, NEG, s)

        # stage 2: narrow merge [running K_PAD | tile-local K_PAD]
        cand_s[:, :K_PAD] = run_s[:]
        cand_i[:, :K_PAD] = run_i[:]
        cand_s[:, K_PAD:] = loc_s
        cand_i[:, K_PAD:] = loc_i
        cs = cand_s[:]
        ci = cand_i[:]
        mcol = jax.lax.broadcasted_iota(jnp.int32, (qn, 2 * K_PAD), 1)
        new_s = jnp.full((qn, K_PAD), NEG, jnp.float32)
        new_i = jnp.zeros((qn, K_PAD), jnp.int32)
        for j in range(k):
            best = jnp.max(cs, axis=1, keepdims=True)
            sel = jnp.min(jnp.where(cs == best, mcol, big), axis=1,
                          keepdims=True)
            onehot = mcol == sel
            idx = jnp.sum(jnp.where(onehot, ci, 0), axis=1,
                          keepdims=True)                    # (Q, 1)
            new_s = jnp.where(out_col == j, best, new_s)
            new_i = jnp.where(out_col == j, idx, new_i)
            cs = jnp.where(onehot, NEG, cs)
        run_s[:] = new_s
        run_i[:] = new_i

    @pl.when(i == n_tiles - 1)
    def _():
        out_s_ref[:] = run_s[:]
        out_i_ref[:] = run_i[:]


def _scan_kernel(q_ref, store_ref, valid_ref, out_s_ref, out_i_ref,
                 run_s, run_i, cand_s, cand_i, *, k: int, tile_n: int):
    i = pl.program_id(0)
    q = q_ref[:]                                    # (Q, d)
    tile = store_ref[:]                             # (TILE_N, d)
    scores = jax.lax.dot_general(
        q, tile, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)         # (Q, TILE_N)
    vmask = valid_ref[:]                            # (1, TILE_N) 0/1 f32
    scores = jnp.where(vmask > 0, scores, NEG)
    _merge_and_emit(scores, i, out_s_ref, out_i_ref,
                    run_s, run_i, cand_s, cand_i, k=k, tile_n=tile_n)


def _scan_kernel_int8(q_ref, store_ref, scale_ref, valid_ref,
                      out_s_ref, out_i_ref,
                      run_s, run_i, cand_s, cand_i, *, k: int, tile_n: int):
    """int8 variant: int8×int8 MXU matmul with i32 accumulation, then
    per-row f32 rescale (the per-QUERY scale is order-preserving and is
    applied outside the kernel)."""
    i = pl.program_id(0)
    q = q_ref[:]                                    # (Q, d) int8
    tile = store_ref[:]                             # (TILE_N, d) int8
    raw = jax.lax.dot_general(
        q, tile, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32)           # (Q, TILE_N) i32
    scales = scale_ref[:]                           # (1, TILE_N) f32
    scores = raw.astype(jnp.float32) * scales
    vmask = valid_ref[:]                            # (1, TILE_N) 0/1 f32
    scores = jnp.where(vmask > 0, scores, NEG)
    _merge_and_emit(scores, i, out_s_ref, out_i_ref,
                    run_s, run_i, cand_s, cand_i, k=k, tile_n=tile_n)


@functools.partial(jax.jit, static_argnames=("k", "tile_n", "interpret"))
def _pallas_topk_padded(store, queries, valid, k: int, tile_n: int,
                        interpret: bool):
    n, d = store.shape
    qn = queries.shape[0]
    grid = (n // tile_n,)

    kernel = functools.partial(_scan_kernel, k=k, tile_n=tile_n)
    out_s, out_i = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((qn, d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda i: (0, i),
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
            pltpu.VMEM((qn, 2 * K_PAD), jnp.float32),
            pltpu.VMEM((qn, 2 * K_PAD), jnp.int32),
        ],
        interpret=interpret,
    )(queries.astype(store.dtype),
      store,
      valid.astype(jnp.float32).reshape(1, n))
    return out_s, out_i


def pallas_topk(store: jax.Array, queries: jax.Array, valid: jax.Array,
                k: int, tile_n: int = 2048, interpret: bool = False):
    """Exact top-k of ``queries @ store.T`` with validity masking.

    store:   (N, d) bf16/f32, N % tile_n == 0, d a lane multiple
    queries: (Q, d) — cast to the store dtype for the MXU
    valid:   (N,) bool
    returns: scores (Q, k) f32, ids (Q, k) i32
    """
    n, d = store.shape
    if n % tile_n:
        raise ValueError(f"N={n} must be a multiple of tile_n={tile_n}")
    if k > K_PAD:
        raise ValueError(f"k={k} exceeds the kernel's K_PAD={K_PAD}")
    out_s, out_i = _pallas_topk_padded(store, queries, valid, k, tile_n,
                                       interpret)
    # normalize the masked-slot contract to match the XLA paths: inside the
    # kernel invalid/padded rows carry the finite sentinel NEG (Mosaic
    # embeds it literally); consumers filter masked slots with isfinite, so
    # map sentinel survivors back to true -inf before returning
    out_s = out_s[:, :k]
    out_s = jnp.where(out_s <= NEG, -jnp.inf, out_s)
    return out_s, out_i[:, :k]


def pallas_topk_scores(store, queries, valid, k, tile_n: int = 2048,
                       interpret: bool = False):
    """Drop-in replacement for ops.topk.batched_topk_scores (same contract);
    pads are expected to be pre-masked via ``valid``."""
    return pallas_topk(store, queries, valid, k, tile_n=tile_n,
                       interpret=interpret)


@functools.partial(jax.jit, static_argnames=("k", "tile_n", "interpret"))
def _pallas_topk_int8_padded(store_q, store_scale, qi, valid,
                             k: int, tile_n: int, interpret: bool):
    n, d = store_q.shape
    qn = qi.shape[0]
    grid = (n // tile_n,)

    kernel = functools.partial(_scan_kernel_int8, k=k, tile_n=tile_n)
    out_s, out_i = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((qn, d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda i: (0, i),
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
            pltpu.VMEM((qn, 2 * K_PAD), jnp.float32),
            pltpu.VMEM((qn, 2 * K_PAD), jnp.int32),
        ],
        interpret=interpret,
    )(qi,
      store_q,
      store_scale.astype(jnp.float32).reshape(1, n),
      valid.astype(jnp.float32).reshape(1, n))
    return out_s, out_i


def pallas_topk_int8(store_q: jax.Array, store_scale: jax.Array,
                     queries: jax.Array, valid: jax.Array, k: int,
                     tile_n: int = 2048, interpret: bool = False):
    """Fused int8 scan: same contract as ops.quant.int8_topk_scores.

    store_q:     (N, d) int8 (symmetric per-row quantization)
    store_scale: (N,) f32 per-row scales
    queries:     (Q, d) f32 — quantized per-query here (order-preserving)
    valid:       (N,) bool
    Returns approximate (scores (Q,k) f32, ids (Q,k) i32); masked slots are
    -inf. Feed the ids to a full-precision rescore (BASELINE config 4).
    """
    from sema_tpu.ops.quant import quantize_query
    n, d = store_q.shape
    if n % tile_n:
        raise ValueError(f"N={n} must be a multiple of tile_n={tile_n}")
    if k > K_PAD:
        raise ValueError(f"k={k} exceeds the kernel's K_PAD={K_PAD}")
    qi, qscale = quantize_query(queries)
    out_s, out_i = _pallas_topk_int8_padded(
        store_q, store_scale, qi, valid, k, tile_n, interpret)
    out_s = out_s[:, :k]
    # normalize sentinels BEFORE the per-query rescale (scale is positive
    # and per-query constant, so applying it post-merge preserves order)
    out_s = jnp.where(out_s <= NEG, -jnp.inf, out_s * qscale[:, None])
    return out_s, out_i[:, :k]

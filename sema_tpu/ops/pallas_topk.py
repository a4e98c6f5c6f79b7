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
  padded to K_PAD=128 columns (only the first k are live), the survivor
  scratch is (Q, TILE_N), and the validity mask enters as a
  (1, N) row vector blocked to (1, TILE_N);
- no ``concatenate``/``pad`` inside the kernel — the insertion shift
  goes through slice-assigned (Q, K_PAD) scratch;
- selection is survivor-bounded rounds of (max, min-index-of-tie,
  insert, mask) — VPU reductions only, no sort/argmax/cumsum primitives
  (not lowerable on TPU); the round count is a traced fori_loop bound.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -3.0e38  # effectively -inf; plain float so kernels embed it literally
K_PAD = 128    # lane-aligned width of the running top-k state


def _merge_and_emit(scores, i, row0, out_s_ref, out_i_ref,
                    run_s, run_i, wide, tmp_s, tmp_i, *, k: int,
                    tile_n: int, thr0=None):
    """Shared tail of the scan kernels: init running state, threshold
    screen, survivor-bounded insertion merge, and the final-tile emit.
    ``scores`` is (Q, TILE_N) f32 with NEG in dead slots; ``row0`` is
    the store-row index of the tile's first column (``i * tile_n`` for
    the dense kernels, ``tile_ids[i] * tile_n`` for the IVF-pruned
    scalar-prefetch kernel).

    Merge design (third iteration; A/B history in docs/PERF.md):

    - Only scores ABOVE a query's current k-th best (the threshold) can
      change the result. A merging tile masks everything else and counts
      survivors; in the steady state of a scan that is 1-3 per tile.
    - The selection loop is a ``fori_loop`` with a TRACED trip count
      ``min(max survivors, k)`` — rounds collapse to the actual work
      instead of k static rounds, which is what makes large k (the
      TUI's 64 class, int8's 128) cheap: the static-unrolled version
      took k full-width rounds per merging tile and failed to compile
      outright at k=64.
    - Each round extracts the global max per row and INSERTS it into the
      rank-descending running state at position ``count(run >= best)``
      (after equals — matches the stable, first-occurrence-wins tie
      order of lax.top_k and the hier oracle), shifting the tail right
      through a slice-assigned scratch. A row with no survivor left
      yields best = NEG, whose insert position is K_PAD — a natural
      no-op, so per-row survivor counts may differ freely.

    Measured (same process, 1M×384 bf16, Q=256, honest fetch): 4.1 ms at
    k=10 (62k QPS) vs 10.6 ms for the two-stage static merge; 4.8 ms at
    k=64 where the static merge did not compile.
    """
    n_tiles = pl.num_programs(0)
    qn = scores.shape[0]

    @pl.when(i == 0)
    def _():
        run_s[:] = jnp.full((qn, K_PAD), NEG, jnp.float32)
        run_i[:] = jnp.zeros((qn, K_PAD), jnp.int32)

    # threshold screen: the running top-k is stored rank-descending, so
    # column k-1 holds each query's current k-th best. A tile with no
    # score above any query's threshold cannot change the result — skip
    # its merge entirely. The screen itself is ONE full-width pass (the
    # per-row max); everything survivor-shaped (compare, count, select)
    # happens inside the merge branch, which the steady state of a scan
    # never takes (round-3 A/B: this cut ~2 full-width VPU passes per
    # tile vs computing surv/scores-thr unconditionally).
    thr = run_s[:, k - 1:k]                         # (Q, 1)
    if thr0 is not None:
        # warm start (scan A/B #15): ``thr0`` is a per-query UNDER-
        # estimate of the true k-th score (strictly below it — the
        # caller samples a store prefix and backs off one ULP), so
        # screening against max(running, thr0) rejects the early tiles
        # that a cold NEG threshold merges while every true top-k
        # member still survives (subset k-th <= global k-th).
        thr = jnp.maximum(thr, thr0)
    rowmax = jnp.max(scores, axis=1, keepdims=True)  # (Q, 1)
    tile_best = jnp.max(rowmax - thr)               # scalar

    @pl.when(tile_best > 0)
    def _():
        surv = scores > thr
        cnt_max = jnp.max(jnp.sum(surv.astype(jnp.int32), axis=1))
        # plain copy, no survivor select: a row whose survivors run out
        # extracts a sub-threshold value whose insert position lands at
        # or past column k — the garbage zone of the running state — so
        # masking non-survivors to NEG is unnecessary work (one full
        # (Q, TILE_N) select saved per merging tile; ids verified
        # identical in the round-3 A/B)
        wide[:] = scores
        col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
        out_col = jax.lax.broadcasted_iota(jnp.int32, (qn, K_PAD), 1)
        big = jnp.int32(2**30)

        def body(j, carry):
            s = wide[:]
            best = jnp.max(s, axis=1, keepdims=True)        # (Q, 1)
            sel_col = jnp.min(jnp.where(s == best, col, big), axis=1,
                              keepdims=True)                # first tie
            wide[:] = jnp.where(col == sel_col, NEG, s)
            rs = run_s[:]
            ri = run_i[:]
            pos = jnp.sum((rs >= best).astype(jnp.int32), axis=1,
                          keepdims=True)                    # after equals
            tmp_s[:, 1:] = rs[:, :K_PAD - 1]                # tail shift
            tmp_i[:, 1:] = ri[:, :K_PAD - 1]
            run_s[:] = jnp.where(out_col < pos, rs,
                                 jnp.where(out_col == pos, best,
                                           tmp_s[:]))
            run_i[:] = jnp.where(out_col < pos, ri,
                                 jnp.where(out_col == pos,
                                           row0 + sel_col, tmp_i[:]))
            return carry

        jax.lax.fori_loop(0, jnp.minimum(cnt_max, k), body, 0)

    @pl.when(i == n_tiles - 1)
    def _():
        out_s_ref[:] = run_s[:]
        out_i_ref[:] = run_i[:]


def _scan_kernel(q_ref, store_ref, valid_ref, out_s_ref, out_i_ref,
                 run_s, run_i, wide, tmp_s, tmp_i, *, k: int, tile_n: int):
    i = pl.program_id(0)
    q = q_ref[:]                                    # (Q, d)
    tile = store_ref[:]                             # (TILE_N, d)
    scores = jax.lax.dot_general(
        q, tile, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)         # (Q, TILE_N)
    vmask = valid_ref[:]                            # (1, TILE_N) 0/1 f32
    scores = jnp.where(vmask > 0, scores, NEG)
    _merge_and_emit(scores, i, i * tile_n, out_s_ref, out_i_ref,
                    run_s, run_i, wide, tmp_s, tmp_i, k=k, tile_n=tile_n)


def _scan_kernel_nomask(q_ref, store_ref, out_s_ref, out_i_ref,
                        run_s, run_i, wide, tmp_s, tmp_i, *, k: int,
                        tile_n: int):
    """Mask-free variant for stores where EVERY row is live (no
    tombstones, no padding): drops the (Q, TILE_N) validity select —
    one full VPU pass per tile — and the (1, N) mask load."""
    i = pl.program_id(0)
    q = q_ref[:]                                    # (Q, d)
    tile = store_ref[:]                             # (TILE_N, d)
    scores = jax.lax.dot_general(
        q, tile, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)         # (Q, TILE_N)
    _merge_and_emit(scores, i, i * tile_n, out_s_ref, out_i_ref,
                    run_s, run_i, wide, tmp_s, tmp_i, k=k, tile_n=tile_n)


def _scan_kernel_warm(thr0_ref, q_ref, store_ref, valid_ref,
                      out_s_ref, out_i_ref,
                      run_s, run_i, wide, tmp_s, tmp_i, *, k: int,
                      tile_n: int):
    """Masked kernel + the per-query warm-start threshold (A/B #15)."""
    i = pl.program_id(0)
    q = q_ref[:]
    tile = store_ref[:]
    scores = jax.lax.dot_general(
        q, tile, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    vmask = valid_ref[:]
    scores = jnp.where(vmask > 0, scores, NEG)
    _merge_and_emit(scores, i, i * tile_n, out_s_ref, out_i_ref,
                    run_s, run_i, wide, tmp_s, tmp_i, k=k, tile_n=tile_n,
                    thr0=thr0_ref[:])


def _scan_kernel_nomask_warm(thr0_ref, q_ref, store_ref,
                             out_s_ref, out_i_ref,
                             run_s, run_i, wide, tmp_s, tmp_i, *, k: int,
                             tile_n: int):
    i = pl.program_id(0)
    q = q_ref[:]
    tile = store_ref[:]
    scores = jax.lax.dot_general(
        q, tile, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    _merge_and_emit(scores, i, i * tile_n, out_s_ref, out_i_ref,
                    run_s, run_i, wide, tmp_s, tmp_i, k=k, tile_n=tile_n,
                    thr0=thr0_ref[:])


def _scan_kernel_int8(q_ref, store_ref, scale_ref, valid_ref,
                      out_s_ref, out_i_ref,
                      run_s, run_i, wide, tmp_s, tmp_i, *, k: int,
                      tile_n: int):
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
    _merge_and_emit(scores, i, i * tile_n, out_s_ref, out_i_ref,
                    run_s, run_i, wide, tmp_s, tmp_i, k=k, tile_n=tile_n)


def _warm_thr0(store, queries, valid, k: int, warm_rows: int,
               masked: bool):
    """Per-query warm-start threshold: one ULP below the k-th best score
    of the first ``warm_rows`` store rows. A subset's k-th best can never
    exceed the global k-th best, and the one-ULP backoff keeps scores
    EQUAL to the sample k-th strictly above the screen — so every true
    top-k member still merges (exactness argument in _merge_and_emit).
    Fully-masked samples degrade to -inf, i.e. a cold start."""
    sample = store[:warm_rows]
    s = jax.lax.dot_general(
        queries.astype(store.dtype), sample,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)          # (Q, warm_rows)
    if masked:
        s = jnp.where(valid[:warm_rows][None, :], s, -jnp.inf)
    t_k = jax.lax.top_k(s, k)[0][:, k - 1:k]         # (Q, 1)
    return jnp.nextafter(t_k, jnp.float32(-jnp.inf))


@functools.partial(jax.jit,
                   static_argnames=("k", "tile_n", "interpret", "masked",
                                    "warm_rows"))
def _pallas_topk_padded(store, queries, valid, k: int, tile_n: int,
                        interpret: bool, masked: bool = True,
                        warm_rows: int = 0):
    n, d = store.shape
    qn = queries.shape[0]
    grid = (n // tile_n,)

    warm = warm_rows > 0
    if masked:
        kernel = functools.partial(
            _scan_kernel_warm if warm else _scan_kernel,
            k=k, tile_n=tile_n)
    else:
        kernel = functools.partial(
            _scan_kernel_nomask_warm if warm else _scan_kernel_nomask,
            k=k, tile_n=tile_n)
    in_specs = [
        pl.BlockSpec((qn, d), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tile_n, d), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
    ]
    operands = [queries.astype(store.dtype), store]
    if masked:
        in_specs.append(pl.BlockSpec((1, tile_n), lambda i: (0, i),
                                     memory_space=pltpu.VMEM))
        operands.append(valid.astype(jnp.float32).reshape(1, n))
    if warm:
        thr0 = _warm_thr0(store, queries, valid, k, warm_rows, masked)
        in_specs.insert(0, pl.BlockSpec((qn, 1), lambda i: (0, 0),
                                        memory_space=pltpu.VMEM))
        operands.insert(0, thr0)
    out_s, out_i = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
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
    )(*operands)
    return out_s, out_i


@functools.partial(jax.jit,
                   static_argnames=("k", "tile_n", "interpret", "masked",
                                    "warm_rows"))
def pallas_topk(store: jax.Array, queries: jax.Array, valid: jax.Array,
                k: int, tile_n: int = 2048, interpret: bool = False,
                masked: bool = True, warm_rows: int = 0):
    """Exact top-k of ``queries @ store.T`` with validity masking.

    Jitted as a whole (kernel + sentinel normalization + slicing): the
    post-processing ops must not become separate dispatches — on
    tunneled hosts each dispatch costs ~27 ms of pump time and unjitted
    callers measured ~2× slower end-to-end.

    ``warm_rows > 0`` enables the warm-start screen (scan A/B #15): the
    first ``warm_rows`` store rows are pre-scored in XLA and each
    query's sample k-th best (minus one ULP) seeds the kernel's
    threshold, so early tiles stop merging. Exact for any value; 0
    keeps the shipped cold-start kernels (identical HLO).

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
                                       interpret, masked=masked,
                                       warm_rows=min(warm_rows, n))
    # normalize the masked-slot contract to match the XLA paths: inside the
    # kernel invalid/padded rows carry the finite sentinel NEG (Mosaic
    # embeds it literally); consumers filter masked slots with isfinite, so
    # map sentinel survivors back to true -inf before returning
    out_s = out_s[:, :k]
    out_s = jnp.where(out_s <= NEG, -jnp.inf, out_s)
    return out_s, out_i[:, :k]


def pallas_topk_scores(store, queries, valid, k, tile_n: int = 2048,
                       interpret: bool = False, masked: bool = True,
                       warm_rows: int = 0):
    """Drop-in replacement for ops.topk.batched_topk_scores (same contract);
    pads are expected to be pre-masked via ``valid``. Pass
    ``masked=False`` ONLY when every row of the store is live (no
    tombstones, no padding) — the validity input is then ignored and
    the per-tile mask select is skipped."""
    return pallas_topk(store, queries, valid, k, tile_n=tile_n,
                       interpret=interpret, masked=masked,
                       warm_rows=warm_rows)


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
            pltpu.VMEM((qn, tile_n), jnp.float32),
            pltpu.VMEM((qn, K_PAD), jnp.float32),
            pltpu.VMEM((qn, K_PAD), jnp.int32),
        ],
        interpret=interpret,
    )(qi,
      store_q,
      store_scale.astype(jnp.float32).reshape(1, n),
      valid.astype(jnp.float32).reshape(1, n))
    return out_s, out_i


@functools.partial(jax.jit, static_argnames=("k", "tile_n", "interpret"))
def pallas_topk_int8(store_q: jax.Array, store_scale: jax.Array,
                     queries: jax.Array, valid: jax.Array, k: int,
                     tile_n: int = 2048, interpret: bool = False):
    """Fused int8 scan: same contract as ops.quant.int8_topk_scores.
    Jitted as a whole — see pallas_topk.

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


# -- IVF-pruned scan (scalar-prefetch tile gather) ---------------------------
#
# The dense kernels above stream EVERY tile of a bucket. The pruned
# variants take a prefetched tile-id list (ops/ivf.py picks it from the
# bucket's cluster layout) and DMA only those tiles: the grid runs over
# the STATIC tile budget T, the store/valid block index_maps read
# tile_ids[i], and steps past n_live repeat the last live tile id —
# Mosaic elides the re-fetch of an unchanged block, and the `live`
# predicate folds into the existing validity select (zero extra VPU
# passes), turning pad steps into score=NEG no-ops the threshold screen
# skips. Emitted ids are positions in the PERMUTED (cluster-major)
# bucket; the store maps them back through the build-time permutation.


def _scan_kernel_pruned(nl_ref, tid_ref, q_ref, store_ref, valid_ref,
                        out_s_ref, out_i_ref,
                        run_s, run_i, wide, tmp_s, tmp_i, *, k: int,
                        tile_n: int):
    i = pl.program_id(0)
    live = i < nl_ref[0]
    q = q_ref[:]                                    # (Q, d)
    tile = store_ref[:]                             # (TILE_N, d)
    scores = jax.lax.dot_general(
        q, tile, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)         # (Q, TILE_N)
    vmask = valid_ref[:]                            # (1, TILE_N) 0/1 f32
    scores = jnp.where(jnp.logical_and(vmask > 0, live), scores, NEG)
    _merge_and_emit(scores, i, tid_ref[i] * tile_n, out_s_ref, out_i_ref,
                    run_s, run_i, wide, tmp_s, tmp_i, k=k, tile_n=tile_n)


def _scan_kernel_int8_pruned(nl_ref, tid_ref, q_ref, store_ref, scale_ref,
                             valid_ref, out_s_ref, out_i_ref,
                             run_s, run_i, wide, tmp_s, tmp_i, *, k: int,
                             tile_n: int):
    i = pl.program_id(0)
    live = i < nl_ref[0]
    q = q_ref[:]                                    # (Q, d) int8
    tile = store_ref[:]                             # (TILE_N, d) int8
    raw = jax.lax.dot_general(
        q, tile, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32)           # (Q, TILE_N) i32
    scores = raw.astype(jnp.float32) * scale_ref[:]
    vmask = valid_ref[:]                            # (1, TILE_N) 0/1 f32
    scores = jnp.where(jnp.logical_and(vmask > 0, live), scores, NEG)
    _merge_and_emit(scores, i, tid_ref[i] * tile_n, out_s_ref, out_i_ref,
                    run_s, run_i, wide, tmp_s, tmp_i, k=k, tile_n=tile_n)


def _pruned_grid_spec(qn, d, tile_n, t, masked_scale: bool):
    in_specs = [
        pl.BlockSpec((qn, d), lambda i, nl, tid: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tile_n, d), lambda i, nl, tid: (tid[i], 0),
                     memory_space=pltpu.VMEM),
    ]
    if masked_scale:
        in_specs.append(pl.BlockSpec((1, tile_n),
                                     lambda i, nl, tid: (0, tid[i]),
                                     memory_space=pltpu.VMEM))
    in_specs.append(pl.BlockSpec((1, tile_n),
                                 lambda i, nl, tid: (0, tid[i]),
                                 memory_space=pltpu.VMEM))
    return pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,   # n_live (1,) i32, tile_ids (T,) i32
        grid=(t,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((qn, K_PAD), lambda i, nl, tid: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((qn, K_PAD), lambda i, nl, tid: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((qn, K_PAD), jnp.float32),
            pltpu.VMEM((qn, K_PAD), jnp.int32),
            pltpu.VMEM((qn, tile_n), jnp.float32),
            pltpu.VMEM((qn, K_PAD), jnp.float32),
            pltpu.VMEM((qn, K_PAD), jnp.int32),
        ],
    )


@functools.partial(jax.jit, static_argnames=("k", "tile_n", "interpret"))
def pallas_topk_pruned(store: jax.Array, queries: jax.Array,
                       valid: jax.Array, tile_ids: jax.Array,
                       n_live: jax.Array, k: int, tile_n: int = 512,
                       interpret: bool = False):
    """Top-k of ``queries @ store.T`` over ONLY the tiles in ``tile_ids``.

    store:    (N, d) bf16/f32, PERMUTED cluster-major, N % tile_n == 0
    queries:  (Q, d) — cast to the store dtype for the MXU
    valid:    (N,) bool, in PERMUTED order
    tile_ids: (T,) i32 — tile indices to scan; entries past ``n_live``
              must repeat a live id (see ops/ivf.py:select_tiles)
    n_live:   (1,) i32 — number of live entries in ``tile_ids``
    Returns (scores (Q, k) f32, ids (Q, k) i32); ids are PERMUTED row
    positions — map through the bucket's ``perm`` on host. Exact over
    the selected tiles; recall vs the full scan is the IVF trade.
    """
    n, d = store.shape
    qn = queries.shape[0]
    t = tile_ids.shape[0]
    if n % tile_n:
        raise ValueError(f"N={n} must be a multiple of tile_n={tile_n}")
    if k > K_PAD:
        raise ValueError(f"k={k} exceeds the kernel's K_PAD={K_PAD}")
    kernel = functools.partial(_scan_kernel_pruned, k=k, tile_n=tile_n)
    out_s, out_i = pl.pallas_call(
        kernel,
        grid_spec=_pruned_grid_spec(qn, d, tile_n, t, masked_scale=False),
        out_shape=[
            jax.ShapeDtypeStruct((qn, K_PAD), jnp.float32),
            jax.ShapeDtypeStruct((qn, K_PAD), jnp.int32),
        ],
        interpret=interpret,
    )(n_live.astype(jnp.int32), tile_ids.astype(jnp.int32),
      queries.astype(store.dtype), store,
      valid.astype(jnp.float32).reshape(1, n))
    out_s = out_s[:, :k]
    out_s = jnp.where(out_s <= NEG, -jnp.inf, out_s)
    return out_s, out_i[:, :k]


@functools.partial(jax.jit, static_argnames=("k", "tile_n", "interpret"))
def pallas_topk_int8_pruned(store_q: jax.Array, store_scale: jax.Array,
                            queries: jax.Array, valid: jax.Array,
                            tile_ids: jax.Array, n_live: jax.Array,
                            k: int, tile_n: int = 512,
                            interpret: bool = False):
    """int8 variant of :func:`pallas_topk_pruned` (same contract as
    pallas_topk_int8 otherwise: per-query quantization here, sentinel
    normalization before the order-preserving per-query rescale)."""
    from sema_tpu.ops.quant import quantize_query
    n, d = store_q.shape
    qn = queries.shape[0]
    t = tile_ids.shape[0]
    if n % tile_n:
        raise ValueError(f"N={n} must be a multiple of tile_n={tile_n}")
    if k > K_PAD:
        raise ValueError(f"k={k} exceeds the kernel's K_PAD={K_PAD}")
    qi, qscale = quantize_query(queries)
    kernel = functools.partial(_scan_kernel_int8_pruned, k=k,
                               tile_n=tile_n)
    out_s, out_i = pl.pallas_call(
        kernel,
        grid_spec=_pruned_grid_spec(qn, d, tile_n, t, masked_scale=True),
        out_shape=[
            jax.ShapeDtypeStruct((qn, K_PAD), jnp.float32),
            jax.ShapeDtypeStruct((qn, K_PAD), jnp.int32),
        ],
        interpret=interpret,
    )(n_live.astype(jnp.int32), tile_ids.astype(jnp.int32),
      qi, store_q,
      store_scale.astype(jnp.float32).reshape(1, n),
      valid.astype(jnp.float32).reshape(1, n))
    out_s = out_s[:, :k]
    out_s = jnp.where(out_s <= NEG, -jnp.inf, out_s * qscale[:, None])
    return out_s, out_i[:, :k]

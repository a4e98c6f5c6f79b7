"""Pallas fused matvec + running top-k scan.

The XLA serving path (ops/hier_topk.py) materializes the (Q, N) score
matrix to HBM between the matmul and the selection — at 1M rows × 64
queries that is ~512 MB of extra HBM traffic on top of the 768 MB store
read. This kernel fuses the two: the store streams HBM→VMEM tile by tile
(Pallas double-buffers the grid automatically), scores are computed on the
MXU in VMEM, and a running top-k per query is maintained in VMEM scratch —
score traffic never touches HBM. One pass over the store at HBM bandwidth
is the speed-of-light for an exact scan; this kernel's overhead on top is
the in-VMEM merge.

Selection inside the kernel uses K rounds of (max, one-hot mask) extraction
— no sort, no argmax primitive, VPU-only — first reducing each tile to its
local top-K, then folding those into the running top-K.

Grid/layout notes (see pallas_guide.md):
- store tile (TILE_N, d): d is a lane multiple (128) for all real models;
  TILE_N is sublane-aligned (bf16 → 16).
- validity enters as a (N, 1) f32 column (0/1) blocked with the store.
- row ids are derived from the grid position — nothing else is read.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -3.0e38  # effectively -inf; plain float so kernels embed it literally


def _extract_topk(scores: jax.Array, base_idx: jax.Array, k: int):
    """K rounds of max + one-hot mask over (Q, M) → (Q, k) values/ids.

    ``base_idx`` (Q, M) i32 carries the global row id of each column.
    """
    q, m = scores.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (q, m), 1)
    out_s = []
    out_i = []
    s = scores
    for _ in range(k):
        best = jnp.max(s, axis=1, keepdims=True)                   # (Q,1)
        onehot = (s == best) & (jnp.cumsum(
            (s == best).astype(jnp.int32), axis=1) == 1)           # first tie
        idx = jnp.sum(jnp.where(onehot, base_idx, 0), axis=1)      # (Q,)
        out_s.append(best[:, 0])
        out_i.append(idx)
        s = jnp.where(onehot, NEG, s)
    return (jnp.stack(out_s, axis=1),
            jnp.stack(out_i, axis=1).astype(jnp.int32))


def _scan_kernel(q_ref, store_ref, valid_ref, out_s_ref, out_i_ref,
                 run_s, run_i, *, k: int, tile_n: int):
    i = pl.program_id(0)
    n_tiles = pl.num_programs(0)

    @pl.when(i == 0)
    def _():
        run_s[:] = jnp.full_like(run_s, NEG)
        run_i[:] = jnp.zeros_like(run_i)

    q = q_ref[:]                                    # (Q, d)
    tile = store_ref[:]                             # (TILE_N, d)
    scores = jax.lax.dot_general(
        q, tile, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)         # (Q, TILE_N)
    vmask = valid_ref[:].reshape(1, tile_n)         # (1, TILE_N) 0/1 f32
    scores = jnp.where(vmask > 0, scores, NEG)

    row0 = i * tile_n
    base = row0 + jax.lax.broadcasted_iota(
        jnp.int32, scores.shape, 1)                 # global row ids

    tile_s, tile_i = _extract_topk(scores, base, k)

    cand_s = jnp.concatenate([run_s[:], tile_s], axis=1)   # (Q, 2k)
    cand_i = jnp.concatenate([run_i[:], tile_i], axis=1)
    new_s, new_i = _extract_topk(cand_s, cand_i, k)
    run_s[:] = new_s
    run_i[:] = new_i

    @pl.when(i == n_tiles - 1)
    def _():
        out_s_ref[:] = run_s[:]
        out_i_ref[:] = run_i[:]


@functools.partial(jax.jit, static_argnames=("k", "tile_n", "interpret"))
def pallas_topk(store: jax.Array, queries: jax.Array, valid: jax.Array,
                k: int, tile_n: int = 2048, interpret: bool = False):
    """Exact top-k of ``queries @ store.T`` with validity masking.

    store:   (N, d) bf16/f32, N % tile_n == 0
    queries: (Q, d) — cast to the store dtype for the MXU
    valid:   (N,) bool
    returns: scores (Q, k) f32, ids (Q, k) i32
    """
    n, d = store.shape
    qn = queries.shape[0]
    if n % tile_n:
        raise ValueError(f"N={n} must be a multiple of tile_n={tile_n}")
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
            pl.BlockSpec((tile_n, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((qn, k), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((qn, k), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((qn, k), jnp.float32),
            jax.ShapeDtypeStruct((qn, k), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((qn, k), jnp.float32),
            pltpu.VMEM((qn, k), jnp.int32),
        ],
        interpret=interpret,
    )(queries.astype(store.dtype),
      store,
      valid.astype(jnp.float32).reshape(n, 1))
    return out_s, out_i


def pallas_topk_scores(store, queries, valid, k, tile_n: int = 2048,
                       interpret: bool = False):
    """Drop-in replacement for ops.topk.batched_topk_scores (same contract);
    pads are expected to be pre-masked via ``valid``."""
    return pallas_topk(store, queries, valid, k, tile_n=tile_n,
                       interpret=interpret)

"""IVF clustering for the pruned (ANN) scan path.

The exact scan streams EVERY row of a bucket through the Pallas top-k
kernel. For interactive single-query latency on 10M+-row stores the
optional IVF mode trades a little recall for a large cut in scanned
bytes, the classic inverted-file way (≙ what the reference's LanceDB
backend offers via IVF indexes — the reference itself never builds one,
so this is a capability increase, opt-in and off by default):

- at sealed-bucket build time, k-means clusters the bucket's rows
  (device Lloyd iterations — blocked MXU matmuls, no scatter), and the
  bucket's device array is permuted CLUSTER-MAJOR so each cluster is a
  contiguous row range;
- at query time the host picks the top-``nprobe`` clusters per query
  (a tiny (Q, C)·(C, d) matmul), unions their covering tiles, and
  dispatches the scalar-prefetch Pallas kernel
  (ops/pallas_topk.py:pallas_topk_pruned) that DMAs ONLY those tiles.

Everything here is deterministic (strided init, no RNG) so a store
reopened on another host builds the identical layout.

TPU notes: Lloyd's accumulation is one-hot matmuls under ``lax.scan``
over fixed row blocks — assignment scatter-adds don't tile onto the
MXU, (block, C) one-hots do. Padding rows (all-zero) carry zero weight
and dead (all-zero) centroids are score-penalized so they never attract
real rows.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

_DEAD_PENALTY = -1.0e30


def _l2(x: jnp.ndarray) -> jnp.ndarray:
    n = jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True))
    return x / jnp.maximum(n, 1e-12)


@functools.partial(jax.jit, static_argnames=("c", "iters"))
def kmeans_cluster(x: jax.Array, c: int, iters: int = 8
                   ) -> Tuple[jax.Array, jax.Array]:
    """Cosine k-means over (N, d) rows → (assign (N,) i32, cent (C, d) f32).

    Rows are expected L2-normalized-or-zero (the store's contract: real
    rows are unit vectors, bucket padding is all-zero). Zero rows get
    zero weight in centroid updates and the overflow assignment ``c``
    (one past the last real cluster — pass ``c + 1`` to
    :func:`cluster_layout`); centroids that never attract a row stay
    all-zero and are skipped by the host probe (empty ranges).
    """
    n, d = x.shape
    if n == 0:
        raise ValueError("kmeans_cluster: empty input")
    block = min(8192, n)
    pad = (-n) % block
    if pad:
        # generic N: zero-pad to a whole number of blocks — zero rows
        # already carry zero update weight and take the overflow
        # assignment, and the pad assignments are sliced off below
        x = jnp.concatenate(
            [x, jnp.zeros((pad, d), dtype=x.dtype)], axis=0)
    nb = (n + pad) // block
    # memory diet: the rows stay in their INPUT dtype in HBM (bf16 for
    # the store's buckets — a full-array f32 copy here doubled the
    # clustering footprint and capped spilled-bucket size at half of
    # HBM); each Lloyd block casts its (block, d) slice to f32 on the
    # fly, so the arithmetic is unchanged — assignments and centroids
    # are bit-identical to the old full-f32 path
    xb = x.reshape(nb, block, d)
    w_full2 = jnp.sum(x.astype(jnp.float32) ** 2, axis=1)  # (n+pad,)
    w = (w_full2.reshape(nb, block) > 0).astype(jnp.float32)

    # seed from REAL rows: the caller clusters the whole padded bucket
    # (up to ~50% zero rows at pow2 padding), and a zero-seeded centroid
    # normalizes to zero, is dead-penalized, never attracts a row, and
    # stays dead forever — the padding fraction of the init diversity
    # was silently lost (review finding, r3). Zero rows sort AFTER real
    # rows under a stable sort on weight, so the strided sample runs
    # over a real-rows-first view; any zero seed left (n_real < c)
    # is replaced by cycling the real prefix.
    w_full = w_full2 > 0
    order = jnp.argsort(~w_full, stable=True)      # real rows first
    stride = max(1, n // c)
    # gather the O(c) seed rows FIRST, cast after — materializing the
    # whole reordered array in f32 (the old path) was the other
    # full-size transient the diet removes
    cent = _l2(x[order[::stride][:c]].astype(jnp.float32))
    if cent.shape[0] < c:  # n < c: degenerate tiny bucket
        cent = jnp.pad(cent, ((0, c - cent.shape[0]), (0, 0)))
    n_real = jnp.maximum(jnp.sum(w_full.astype(jnp.int32)), 1)
    repl = _l2(x[order[jnp.arange(c) % n_real]].astype(jnp.float32))
    dead0 = (jnp.sum(cent * cent, axis=1) == 0)[:, None]
    cent = jnp.where(dead0, repl, cent)

    def scores(xbl, cent):
        # dead (all-zero) centroids score 0 against everything, which
        # would beat genuinely negative cosines — penalize them out
        dead = (jnp.sum(cent * cent, axis=1) == 0).astype(jnp.float32)
        return xbl @ cent.T + dead * _DEAD_PENALTY

    def lloyd(cent, _):
        def blk(carry, inp):
            sums, counts = carry
            xbl, wbl = inp
            xbl = xbl.astype(jnp.float32)   # per-block cast (diet)
            a = jnp.argmax(scores(xbl, cent), axis=1)
            oh = jax.nn.one_hot(a, c, dtype=jnp.float32) * wbl[:, None]
            return (sums + oh.T @ xbl, counts + jnp.sum(oh, axis=0)), None
        zero = (jnp.zeros((c, d), jnp.float32), jnp.zeros((c,), jnp.float32))
        (sums, counts), _ = jax.lax.scan(blk, zero, (xb, w))
        new = _l2(sums)
        # empty cluster: keep the old centroid (it may re-attract later)
        return jnp.where((counts > 0)[:, None], new, cent), None

    cent, _ = jax.lax.scan(lloyd, cent, None, length=iters)

    def blk_assign(_, inp):
        xbl, wbl = inp
        a = jnp.argmax(scores(xbl.astype(jnp.float32), cent),
                       axis=1).astype(jnp.int32)
        # zero (padding) rows get the dedicated overflow id ``c``: they
        # are invalid anyway, and parking them past every real cluster
        # keeps the cluster-major ranges tight — a heavily padded bucket
        # would otherwise splice thousands of dead rows into whichever
        # real cluster they argmax'd into, inflating its tile span
        return None, jnp.where(wbl > 0, a, jnp.int32(c))

    _, assign = jax.lax.scan(blk_assign, None, (xb, w))
    return assign.reshape(n + pad)[:n], cent


def cluster_layout(assign: np.ndarray, c: int
                   ) -> Tuple[np.ndarray, np.ndarray]:
    """Host side of the build: cluster-major row order.

    Returns ``perm`` (new position → original row, i32) and ``starts``
    (C+1 cumulative row offsets per cluster, i64). The store's device
    array is reordered as ``rows[perm]``; a kernel hit at permuted
    position p maps back through ``perm[p]``.
    """
    assign = np.asarray(assign)
    perm = np.argsort(assign, kind="stable").astype(np.int32)
    counts = np.bincount(assign, minlength=c)
    starts = np.zeros(c + 1, dtype=np.int64)
    starts[1:] = np.cumsum(counts)
    return perm, starts


def select_tiles(centroids: np.ndarray, starts: np.ndarray,
                 queries: np.ndarray, nprobe: int, tile_n: int,
                 budget: int) -> Optional[Tuple[np.ndarray, int]]:
    """Host side of a probe: the tile list for one dispatch.

    ``queries`` are the LIVE query rows only (phantom zero-padded rows
    would probe garbage clusters and blow the budget). Returns
    ``(tile_ids (budget,) i32, n_live)`` — padded by repeating the last
    live tile id so Mosaic elides the pad steps' DMA — or ``None`` when
    the union of probed clusters exceeds ``budget`` tiles (caller falls
    back to the exact full scan) or probes nothing.
    """
    if len(queries) == 0:
        return None
    cs = np.asarray(queries, dtype=np.float32) @ centroids.T  # (Q, C)
    # dead (all-zero) centroids score exactly 0 — which outranks every
    # real cluster a query is anti-aligned with, silently eating probe
    # slots (the `keep` filter below drops them AFTER selection, so the
    # effective nprobe shrank with no signal; review finding, r3)
    dead = np.sum(np.asarray(centroids, dtype=np.float32) ** 2,
                  axis=1) == 0
    if dead.any():
        cs[:, dead] = -np.inf
    nprobe = min(nprobe, cs.shape[1])
    if nprobe < cs.shape[1]:
        idx = np.argpartition(-cs, nprobe - 1, axis=1)[:, :nprobe]
    else:
        idx = np.broadcast_to(np.arange(cs.shape[1]), cs.shape)
    sel = np.unique(idx)
    lo, hi = starts[sel], starts[sel + 1]
    keep = hi > lo  # skip empty/dead clusters
    lo, hi = lo[keep], hi[keep]
    if len(lo) == 0:
        return None
    spans = [np.arange(a // tile_n, (b - 1) // tile_n + 1)
             for a, b in zip(lo, hi)]
    tiles = np.unique(np.concatenate(spans))
    n_live = len(tiles)
    if n_live > budget:
        return None
    out = np.full(budget, tiles[-1], dtype=np.int32)
    out[:n_live] = tiles
    return out, n_live

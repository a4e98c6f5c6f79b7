"""Distributed exact top-k over a row-sharded embedding store.

The store (N, d) is sharded over the mesh's ``index`` axis: each chip holds
an (N/c, d) shard in HBM. A query batch is replicated; each chip computes
local scores + local top-k (the expensive part — one streaming pass over its
shard at HBM bandwidth), then the tiny (Q, k) candidate sets are
``all_gather``ed over ICI and reduced to the global top-k. Exact by
construction: the global top-k is a subset of the union of per-chip top-ks.

Communication cost per query batch: c · Q · k · 8 bytes — independent of N.
This is the TPU-native answer to the reference's single-host LanceDB scan
(lance_indexer.rs:121-126) and needs no NCCL/MPI equivalent: XLA compiles
the collective onto ICI (SURVEY.md §5).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from sema_tpu.ops.topk import batched_topk_scores


def merge_axis(scores, idx, k: int, axis: str):
    """``all_gather`` (Q, k) per-chip candidates over ``axis`` and reduce
    to the global top-k — the one candidate-merge used by the sharded,
    sharded-pruned, and multislice paths (tiny (c, Q, k) tensors, rides
    the interconnect)."""
    g_scores = jax.lax.all_gather(scores, axis)     # (c, Q, k)
    g_idx = jax.lax.all_gather(idx, axis)
    c, q, kk = g_scores.shape
    cand_s = jnp.transpose(g_scores, (1, 0, 2)).reshape(q, c * kk)
    cand_i = jnp.transpose(g_idx, (1, 0, 2)).reshape(q, c * kk)
    top_s, pos = jax.lax.top_k(cand_s, k)
    top_i = jnp.take_along_axis(cand_i, pos, axis=1)
    return top_s, top_i


def _local_then_merge(store_shard, queries, valid_shard, *, k: int,
                      axis: str, shard_rows: int, local_fn):
    """Runs per-chip under shard_map."""
    local_scores, local_idx = local_fn(store_shard, queries, valid_shard, k)
    # globalize row ids
    shard_id = jax.lax.axis_index(axis)
    local_idx = local_idx + shard_id * shard_rows
    return merge_axis(local_scores, local_idx, k, axis)


def make_sharded_topk(mesh: Mesh, total_rows: int, k: int,
                      axis: str = "index", local_fn=None,
                      store_specs=None):
    """Compile a (store, queries, valid) -> (scores, indices) function with
    the store and validity mask sharded over ``axis`` and queries replicated.

    ``total_rows`` must be divisible by the axis size (the store pads its
    row count to a shard multiple and masks the padding).

    ``local_fn(store_shard, queries, valid_shard, k)`` is the per-chip scan
    (default: the bf16 exact scan); ``store`` may be any pytree (e.g. the
    int8 path's (values, scales)) with matching ``store_specs``.
    """
    c = mesh.shape[axis]
    if total_rows % c:
        raise ValueError(f"rows {total_rows} not divisible by {c} shards")
    shard_rows = total_rows // c

    if local_fn is None:
        local_fn = batched_topk_scores
    if store_specs is None:
        store_specs = P(axis, None)

    fn = partial(_local_then_merge, k=k, axis=axis, shard_rows=shard_rows,
                 local_fn=local_fn)
    spec_replicated = P(None, None)

    mapped = shard_map(
        fn, mesh=mesh,
        in_specs=(store_specs, spec_replicated, P(axis)),
        out_specs=(spec_replicated, spec_replicated),
        # after all_gather every chip holds identical candidates and computes
        # the same merge — replication is real but not VMA-inferable
        check_vma=False)
    return jax.jit(mapped)


_ONESHOT_CACHE: dict = {}


def sharded_topk(mesh: Mesh, store, queries, valid, k: int,
                 axis: str = "index"):
    """One-shot convenience wrapper over :func:`make_sharded_topk` for
    the default bf16/f32 dense store. Compiled functions are cached per
    (mesh, rows, k, axis) — an uncached rebuild per call would re-trace
    every query batch. For the int8 (values, scales) pytree store or a
    custom kernel, call make_sharded_topk directly with ``local_fn`` /
    ``store_specs``."""
    rows = store.shape[0]
    key = (mesh, rows, k, axis)
    fn = _ONESHOT_CACHE.get(key)
    if fn is None:
        fn = _ONESHOT_CACHE[key] = make_sharded_topk(mesh, rows, k,
                                                     axis=axis)
    return fn(store, queries, valid)


def _local_pruned_then_merge(store_shard, queries, valid_shard, tiles,
                             n_live, *, k: int, axis: str,
                             shard_rows: int, local_fn):
    """Per-chip IVF-pruned scan + the same all_gather candidate merge.

    ``tiles``/``n_live`` arrive as this chip's (1, T)/(1, 1) slice of the
    per-shard probe tables (host probes each shard's centroids
    independently); ids come back as PERMUTED positions within the
    shard — globalized here, mapped through the store's composed global
    permutation on host."""
    local_scores, local_idx = local_fn(
        store_shard, queries, valid_shard, tiles[0], n_live[0], k)
    shard_id = jax.lax.axis_index(axis)
    local_idx = local_idx + shard_id * shard_rows
    return merge_axis(local_scores, local_idx, k, axis)


def make_sharded_pruned_topk(mesh: Mesh, total_rows: int, k: int,
                             axis: str = "index", local_fn=None,
                             store_specs=None):
    """Sharded IVF: compile a (store, queries, valid, tiles, n_live) →
    (scores, indices) function.

    The store is row-sharded over ``axis`` with each shard clustered
    INDEPENDENTLY (cluster-major within its rows); ``tiles`` is the
    (shards, T) per-shard probe table and ``n_live`` its (shards, 1)
    live counts — both sharded over ``axis`` so every chip DMAs only
    its own probed tiles. ``local_fn(store_shard, queries, valid_shard,
    tile_ids, n_live, k)`` is the per-chip pruned kernel
    (ops/pallas_topk.py:pallas_topk_pruned signature minus the jit
    wrapper). Exact over the probed tiles of every shard; recall vs the
    full scan is the IVF trade, identical to the single-device path."""
    c = mesh.shape[axis]
    if total_rows % c:
        raise ValueError(f"rows {total_rows} not divisible by {c} shards")
    shard_rows = total_rows // c
    if local_fn is None:
        # default per-chip scan: the pruned Pallas kernel (interpret off
        # TPU). In-tree callers pass their own wrapper; without one the
        # previous default was a trace-time TypeError.
        from sema_tpu.ops.pallas_topk import pallas_topk_pruned

        def local_fn(store_shard, queries, valid_shard, tile_ids,
                     n_live, kk):
            return pallas_topk_pruned(
                store_shard, queries, valid_shard, tile_ids, n_live, kk,
                interpret=jax.default_backend() != "tpu")
    if store_specs is None:
        store_specs = P(axis, None)

    fn = partial(_local_pruned_then_merge, k=k, axis=axis,
                 shard_rows=shard_rows, local_fn=local_fn)
    spec_replicated = P(None, None)
    mapped = shard_map(
        fn, mesh=mesh,
        in_specs=(store_specs, spec_replicated, P(axis),
                  P(axis, None), P(axis, None)),
        out_specs=(spec_replicated, spec_replicated),
        check_vma=False)
    return jax.jit(mapped)

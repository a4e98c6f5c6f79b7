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


def _local_then_merge(store_shard, queries, valid_shard, *, k: int,
                      axis: str, shard_rows: int, local_fn):
    """Runs per-chip under shard_map."""
    local_scores, local_idx = local_fn(store_shard, queries, valid_shard, k)
    # globalize row ids
    shard_id = jax.lax.axis_index(axis)
    local_idx = local_idx + shard_id * shard_rows

    # (c, Q, k) candidates on every chip; tiny, rides ICI
    all_scores = jax.lax.all_gather(local_scores, axis)
    all_idx = jax.lax.all_gather(local_idx, axis)

    c = all_scores.shape[0]
    q = all_scores.shape[1]
    cand_scores = jnp.transpose(all_scores, (1, 0, 2)).reshape(q, c * k)
    cand_idx = jnp.transpose(all_idx, (1, 0, 2)).reshape(q, c * k)

    top_scores, pos = jax.lax.top_k(cand_scores, k)
    top_idx = jnp.take_along_axis(cand_idx, pos, axis=1)
    return top_scores, top_idx


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


def sharded_topk(mesh: Mesh, store, queries, valid, k: int,
                 axis: str = "index"):
    """One-shot convenience wrapper (compiles per (shape, k))."""
    fn = make_sharded_topk(mesh, store.shape[0], k, axis=axis)
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

    all_scores = jax.lax.all_gather(local_scores, axis)
    all_idx = jax.lax.all_gather(local_idx, axis)
    c = all_scores.shape[0]
    q = all_scores.shape[1]
    cand_scores = jnp.transpose(all_scores, (1, 0, 2)).reshape(q, c * k)
    cand_idx = jnp.transpose(all_idx, (1, 0, 2)).reshape(q, c * k)
    top_scores, pos = jax.lax.top_k(cand_scores, k)
    top_idx = jnp.take_along_axis(cand_idx, pos, axis=1)
    return top_scores, top_idx


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

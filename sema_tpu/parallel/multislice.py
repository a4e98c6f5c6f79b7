"""Two-level top-k merge for multi-slice (ICI + DCN) deployments.

BASELINE config 5 (100M vectors on v5p-32) spans multiple TPU slices: chips
within a slice talk over ICI (fast), slices talk over DCN (slow). A flat
``all_gather`` over all chips moves every chip's candidates over DCN. The
two-level merge reduces DCN traffic by a factor of the slice size:

1. each chip scans its shard → (Q, k) local candidates;
2. ``all_gather`` + merge *within* the slice over ICI → per-slice top-k;
3. ``all_gather`` of only the slice winners over DCN → global top-k.

DCN bytes per query batch: n_slices · Q · k · 8 instead of
n_chips · Q · k · 8.

The mesh is (slice, index): axis "slice" maps across slices (DCN), axis
"index" within a slice (ICI). Store rows are sharded over BOTH axes — row
blocks striped slice-major.
"""

from __future__ import annotations

from functools import partial

import jax
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from sema_tpu.ops.topk import batched_topk_scores
from sema_tpu.parallel.sharded_topk import merge_axis as _merge_axis


def _two_level(store_shard, queries, valid_shard, *, k: int,
               slice_axis: str, index_axis: str, shard_rows: int,
               local_fn):
    local_scores, local_idx = local_fn(store_shard, queries, valid_shard, k)
    # globalize: rows are laid out slice-major then chip-major
    slice_id = jax.lax.axis_index(slice_axis)
    chip_id = jax.lax.axis_index(index_axis)
    chips_per_slice = jax.lax.axis_size(index_axis)
    shard_id = slice_id * chips_per_slice + chip_id
    local_idx = local_idx + shard_id * shard_rows

    # level 1: merge within the slice (ICI)
    s, i = _merge_axis(local_scores, local_idx, k, index_axis)
    # level 2: merge slice winners (DCN)
    return _merge_axis(s, i, k, slice_axis)


def make_multislice_topk(mesh: Mesh, total_rows: int, k: int,
                         slice_axis: str = "slice",
                         index_axis: str = "index",
                         local_fn=None, store_specs=None):
    """Compile the two-level merged exact top-k over a (slice, index) mesh."""
    n_shards = mesh.shape[slice_axis] * mesh.shape[index_axis]
    if total_rows % n_shards:
        raise ValueError(
            f"rows {total_rows} not divisible by {n_shards} shards")
    shard_rows = total_rows // n_shards

    if local_fn is None:
        local_fn = batched_topk_scores
    if store_specs is None:
        store_specs = P((slice_axis, index_axis), None)

    fn = partial(_two_level, k=k, slice_axis=slice_axis,
                 index_axis=index_axis, shard_rows=shard_rows,
                 local_fn=local_fn)
    mapped = shard_map(
        fn, mesh=mesh,
        in_specs=(store_specs, P(None, None), P((slice_axis, index_axis))),
        out_specs=(P(None, None), P(None, None)),
        check_vma=False)  # replication after the final gather is real
    return jax.jit(mapped)


def _two_level_pruned(store_shard, queries, valid_shard, tiles, n_live, *,
                      k: int, slice_axis: str, index_axis: str,
                      shard_rows: int, local_fn):
    """Per-chip IVF-pruned scan + the same ICI-then-DCN candidate merge.

    Multislice twin of sharded_topk._local_pruned_then_merge: each chip
    scans only its own probed tiles, slice-local winners merge over ICI,
    and only n_slices · Q · k candidates cross the DCN."""
    local_scores, local_idx = local_fn(
        store_shard, queries, valid_shard, tiles[0], n_live[0], k)
    slice_id = jax.lax.axis_index(slice_axis)
    chip_id = jax.lax.axis_index(index_axis)
    chips_per_slice = jax.lax.axis_size(index_axis)
    shard_id = slice_id * chips_per_slice + chip_id
    local_idx = local_idx + shard_id * shard_rows
    s, i = _merge_axis(local_scores, local_idx, k, index_axis)
    return _merge_axis(s, i, k, slice_axis)


def make_multislice_pruned_topk(mesh: Mesh, total_rows: int, k: int,
                                slice_axis: str = "slice",
                                index_axis: str = "index",
                                local_fn=None, store_specs=None):
    """Multislice IVF: compile a (store, queries, valid, tiles, n_live) →
    (scores, indices) function over a (slice, index) mesh.

    Same contract as sharded_topk.make_sharded_pruned_topk — the store is
    row-sharded over BOTH axes (slice-major row blocks), each shard
    clustered independently, ``tiles``/(``n_live``) are the
    (total_shards, T)/(total_shards, 1) per-shard probe tables sharded
    the same way — but candidates merge in two levels so only the slice
    winners cross the DCN."""
    n_shards = mesh.shape[slice_axis] * mesh.shape[index_axis]
    if total_rows % n_shards:
        raise ValueError(
            f"rows {total_rows} not divisible by {n_shards} shards")
    shard_rows = total_rows // n_shards
    if local_fn is None:
        from sema_tpu.ops.pallas_topk import pallas_topk_pruned

        def local_fn(store_shard, queries, valid_shard, tile_ids,
                     n_live, kk):
            return pallas_topk_pruned(
                store_shard, queries, valid_shard, tile_ids, n_live, kk,
                interpret=jax.default_backend() != "tpu")
    if store_specs is None:
        store_specs = P((slice_axis, index_axis), None)

    fn = partial(_two_level_pruned, k=k, slice_axis=slice_axis,
                 index_axis=index_axis, shard_rows=shard_rows,
                 local_fn=local_fn)
    row_axes = (slice_axis, index_axis)
    mapped = shard_map(
        fn, mesh=mesh,
        in_specs=(store_specs, P(None, None), P(row_axes),
                  P(row_axes, None), P(row_axes, None)),
        out_specs=(P(None, None), P(None, None)),
        check_vma=False)
    return jax.jit(mapped)

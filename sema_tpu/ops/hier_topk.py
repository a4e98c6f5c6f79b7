"""Hierarchical exact top-k — the optimized serving scan.

``jax.lax.top_k`` over a (Q, N) score matrix is sort-bound on TPU for large
N. This reduces the sort domain by a factor of ``group`` while staying
EXACT:

1. scores (Q, N) → grouped (Q, G, g); per-group max → (Q, G)   [VPU pass]
2. top-k over the G group maxima (G = N/g, e.g. 16-64× smaller sort)
3. gather those k groups' raw scores → (Q, k·g) → exact top-k

Exactness: let t_k be the k-th largest score. Every group containing a
top-k element has group-max ≥ t_k; any group with max > t_k *contains* a
top-k element (its max already outranks t_k). Hence at most k groups have
max ≥ t_k and the k groups with the largest maxima contain every top-k
element (ties can swap equal-scored candidates — score-exact, recall@k
preserved for distinct scores).

The matmul itself is unchanged (bf16 MXU, f32 accumulation); only the
selection is restructured. Replaces the naive selection in ops/topk.py on
the serving path; ops/topk.py remains the oracle in tests.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = float("-inf")


def hier_topk_scores(scores: jax.Array, k: int, group: int = 64):
    """Exact top-k over the last axis of (Q, N) scores.

    N must be a multiple of ``group`` (the store pads rows; padding is
    masked to -inf upstream). Returns (values (Q,k) f32, indices (Q,k) i32).
    """
    q, n = scores.shape
    if n % group:
        raise ValueError(f"N={n} not a multiple of group={group}")
    g = n // group

    blocked = scores.reshape(q, g, group)
    block_max = jnp.max(blocked, axis=-1)                  # (Q, G)

    k_groups = min(k, g)
    _, top_groups = jax.lax.top_k(block_max, k_groups)     # (Q, kG)

    # gather the winning groups' raw scores: (Q, kG, group)
    cand = jnp.take_along_axis(blocked, top_groups[..., None], axis=1)
    cand = cand.reshape(q, k_groups * group)

    k_eff = min(k, cand.shape[1])
    vals, local_idx = jax.lax.top_k(cand, k_eff)           # (Q, k)

    # local candidate position → global row id
    grp = jnp.take_along_axis(top_groups, local_idx // group, axis=1)
    idx = grp * group + (local_idx % group)
    return vals, idx.astype(jnp.int32)


def batched_topk_scores_hier(store: jax.Array, queries: jax.Array,
                             valid: jax.Array, k: int, group: int = 64):
    """Drop-in replacement for ops.topk.batched_topk_scores using the
    hierarchical selection. Same contract: masked rows are -inf."""
    scores = jnp.einsum(
        "qd,nd->qn", queries.astype(store.dtype), store,
        preferred_element_type=jnp.float32)
    scores = jnp.where(valid[None, :], scores, NEG_INF)
    n = scores.shape[1]
    if n % group or n < group * 2:
        return _fallback(scores, k)
    return hier_topk_scores(scores, k, group=group)


def _fallback(scores: jax.Array, k: int):
    vals, idx = jax.lax.top_k(scores, min(k, scores.shape[1]))
    return vals, idx.astype(jnp.int32)

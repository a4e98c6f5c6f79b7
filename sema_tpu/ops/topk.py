"""Exact top-k similarity scan (XLA reference implementation).

Replaces the reference's LanceDB ANN ``nearest_to`` host scan
(lance_indexer.rs:121-126). Embeddings are L2-normalized at encode time, so
dot product == cosine similarity; an exact scan gives recall@10 = 1.0 by
construction (the BASELINE.json north-star requirement).

The matmul runs in bf16 on the MXU with f32 accumulation; padded/tombstoned
rows are excluded with an additive -inf mask, never dropped dynamically
(static shapes keep one compiled executable).

The Pallas fused scan (ops/pallas_topk.py) is the optimized path for stores
too large to score in one XLA buffer; this module is the semantics oracle
it is tested against.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

# plain float so importing this module never initializes a backend
NEG_INF = float("-inf")


def batched_topk_scores(store: jax.Array, queries: jax.Array,
                        valid: jax.Array, k: int):
    """Scores + indices of the top-k rows of ``store`` for each query.

    store:   (N, d) — any float dtype (bf16 preferred on TPU)
    queries: (Q, d) — f32/bf16, L2-normalized
    valid:   (N,) bool — False for padding/tombstoned rows
    returns: scores (Q, k) f32, indices (Q, k) int32
    """
    scores = jnp.einsum(
        "qd,nd->qn", queries.astype(store.dtype), store,
        preferred_element_type=jnp.float32)
    scores = jnp.where(valid[None, :], scores, NEG_INF)
    top_scores, top_idx = jax.lax.top_k(scores, k)
    return top_scores, top_idx.astype(jnp.int32)


@partial(jax.jit, static_argnames=("k",))
def exact_topk(store: jax.Array, query: jax.Array, valid: jax.Array, k: int):
    """Single-query exact top-k. (k,) scores f32 + (k,) indices int32."""
    s, i = batched_topk_scores(store, query[None, :], valid, k)
    return s[0], i[0]

"""Int8 quantized scan + rescore (the gte-large/10M-row configuration).

BASELINE.json config 4: "int8 quantized scan + bf16 rescore of top-100".
The store holds symmetric per-row int8 (4× less HBM than f32, 2× less than
bf16 → 4× more rows per chip and ~2× scan bandwidth vs bf16); the scan
runs int8×int8 → int32 on the MXU; the top ``rescore_k`` candidates are
re-scored at full precision from the host-resident originals and re-ranked,
restoring exact ordering for the final top-k with overwhelming probability
(recall gate enforced in tests; candidates lost by int8 rounding beyond
rescore_k are the only loss channel).

Scoring math: score ≈ (q_i8 · r_i8) · (s_q · s_r) where s_* = max|x|/127.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sema_tpu.ops.hier_topk import hier_topk_scores

NEG_INF = float("-inf")


def quantize_rows(x: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Symmetric per-row int8: returns (values int8 (N,d), scales f32 (N,))."""
    x = np.asarray(x, dtype=np.float32)
    scales = np.max(np.abs(x), axis=1) / 127.0
    safe = np.where(scales > 0, scales, 1.0)
    q = np.clip(np.rint(x / safe[:, None]), -127, 127).astype(np.int8)
    return q, scales.astype(np.float32)


def quantize_query(q: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Per-query symmetric int8 (device-side). q: (Q, d) f32."""
    scale = jnp.max(jnp.abs(q), axis=1) / 127.0
    safe = jnp.where(scale > 0, scale, 1.0)
    qi = jnp.clip(jnp.round(q / safe[:, None]), -127, 127).astype(jnp.int8)
    return qi, scale


def int8_topk_scores(store_q: jax.Array, store_scale: jax.Array,
                     queries: jax.Array, valid: jax.Array, k: int,
                     group: int = 128):
    """Quantized exact-arithmetic scan: int8 MXU matmul, f32 rescale,
    hierarchical candidate selection. Returns approximate scores — feed the
    indices to a full-precision rescore."""
    qi, qscale = quantize_query(queries)
    raw = jnp.einsum("qd,nd->qn", qi, store_q,
                     preferred_element_type=jnp.int32)
    scores = raw.astype(jnp.float32) * (
        qscale[:, None] * store_scale[None, :])
    scores = jnp.where(valid[None, :], scores, NEG_INF)
    n = scores.shape[1]
    if n % group or n < group * 2:
        vals, idx = jax.lax.top_k(scores, min(k, n))
        return vals, idx.astype(jnp.int32)
    return hier_topk_scores(scores, k, group=group)


def rescore_exact(candidates_full: np.ndarray, query: np.ndarray,
                  candidate_ids: np.ndarray, k: int
                  ) -> Tuple[np.ndarray, np.ndarray]:
    """Full-precision host rescore of gathered candidate rows.

    candidates_full: (R, d) f32 original vectors (host)
    query: (d,) f32;  candidate_ids: (R,) global row ids
    Returns (scores (k,), ids (k,)) sorted descending.
    """
    scores = candidates_full.astype(np.float32) @ query.astype(np.float32)
    order = np.argsort(-scores, kind="stable")[:k]
    return scores[order], candidate_ids[order]

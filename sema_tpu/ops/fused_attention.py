"""Pallas fused self-attention for short encoder sequences.

The XLA attention path (models/bert.py:_attention) materializes the
(B, H, S, S) f32 score tensor in HBM twice per layer (scores out, probs
back in). At the encoder's operating point — MiniLM batch 256, S=256,
12 heads — that is ~0.8 GB per direction per layer, ~5× the HBM traffic of
the actual matmuls, and it makes the whole encoder bandwidth-bound (round-1
NOTES: ~32% MXU). This kernel keeps the entire attention computation for a
(block of batch rows × one head) in VMEM: QK^T on the MXU, additive padding
bias + f32 softmax on the VPU, probs @ V on the MXU — score traffic never
touches HBM.

No online/flash softmax machinery is needed: encoder sequences are ≤ 256
tokens (the reference truncates at 256, embeddings.rs:7,40-46), so the full
(S, S) score tile fits comfortably in VMEM. This is a deliberately simpler
design than a flash-attention kernel — the right tool for the short-S
regime this framework operates in (SURVEY.md §5: the long axis is the
index, not the sequence).

Numerics match the XLA path exactly: f32 score accumulation
(preferred_element_type), f32 bias add and softmax, compute-dtype probs,
f32 context accumulation — the torch-parity suite runs both paths.

Layout notes (pallas_guide.md):
- blocks are (TB, 1, S, hd): one head per program along a grid axis, TB
  batch rows to amortize per-program overhead; hd ∈ {32, 64} pads to the
  128-lane tile — acceptable waste on the small q/k/v tiles, while the
  dominant (S, S) score tile is exactly lane-aligned;
- the additive mask enters as a (TB, S) f32 block (one row per batch
  element, broadcast over heads and query positions in-kernel);
- per-batch-row matmuls are a static Python loop over TB 2-D dots — no
  batched dot_general assumptions, everything lowers to plain MXU ops.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attn_kernel(q_ref, k_ref, v_ref, bias_ref, out_ref, *, scale: float,
                 tb: int):
    bias = bias_ref[:]                            # (TB, S) f32
    for t in range(tb):                           # static unroll
        q = q_ref[t, 0]                           # (S, hd)
        k = k_ref[t, 0]
        v = v_ref[t, 0]
        scores = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)   # (S, S) f32
        scores = scores * scale + bias[t][None, :]
        probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
        ctx = jax.lax.dot_general(
            probs, v, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)   # (S, hd) f32
        out_ref[t, 0] = ctx.astype(out_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("scale", "block_b", "interpret"))
def fused_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                    mask_bias: jax.Array, *, scale: float,
                    block_b: int = 16, interpret: bool = False) -> jax.Array:
    """softmax(q @ k^T * scale + bias) @ v, fused in VMEM.

    q, k, v:    (B, H, S, hd) compute dtype (bf16/f32)
    mask_bias:  (B, S) f32 additive mask (0 attended / -1e9 padded) —
                broadcast over heads and query positions, the BERT padding
                mask semantics of models/bert.py:bert_forward
    returns:    (B, H, S, hd) in q.dtype
    """
    b, h, s, hd = q.shape
    # tb must divide b, and the (tb, s) mask block needs tb % 8 == 0 unless
    # it covers the whole batch (Mosaic sublane tiling rule)
    tb = next((d for d in range(min(block_b, b), 0, -1)
               if b % d == 0 and (d % 8 == 0 or d == b)), b)
    grid = (b // tb, h)

    kernel = functools.partial(_attn_kernel, scale=scale, tb=tb)
    qkv_spec = pl.BlockSpec((tb, 1, s, hd), lambda i, j: (i, j, 0, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            qkv_spec, qkv_spec, qkv_spec,
            pl.BlockSpec((tb, s), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=qkv_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, s, hd), q.dtype),
        interpret=interpret,
    )(q, k, v, mask_bias.astype(jnp.float32))

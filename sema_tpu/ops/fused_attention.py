"""Pallas fused self-attention for short encoder sequences.

The XLA attention path (models/bert.py:_attention) materializes the
(B, H, S, S) score tensor in HBM twice per layer (scores out, probs back
in) AND materializes q/k/v in the head-transposed (B, n, S, hd) layout —
at the encoder's operating point (MiniLM batch 256, S=256, 12 heads) the
two together are several times the HBM traffic of the actual matmuls,
making the encoder bandwidth-bound (round-1 NOTES: ~32% MXU).

This kernel consumes the fused qkv projection in its NATURAL (B, S, 3H)
layout: the (B, S, 3, n, hd) head view is a free row-major reshape, and
each grid program pulls its (batch-block, head) q/k/v tiles straight out
of that view via BlockSpec index maps — no transpose is ever materialized.
Inside the kernel a (block of batch rows × one head) attention runs
entirely in VMEM: QK^T on the MXU, additive padding bias + f32 softmax on
the VPU, probs @ V on the MXU. Score traffic and head transposes never
touch HBM; the context comes back in the natural (B, S, H) layout the
attention-output matmul wants.

No online/flash softmax machinery is needed: encoder sequences are ≤ 256
tokens (the reference truncates at 256, embeddings.rs:7,40-46), so the
full (S, S) score tile fits comfortably in VMEM. This is a deliberately
simpler design than a flash-attention kernel — the right tool for the
short-S regime this framework operates in (SURVEY.md §5: the long axis is
the index, not the sequence).

Numerics match the XLA path exactly: f32 score accumulation
(preferred_element_type), f32 bias add, softmax in the COMPUTE dtype
(the XLA path's bf16-mode softmax is bf16 too — measured cosine
1.000000 vs f32-softmax, docs/PERF.md), compute-dtype probs, f32
context accumulation — the torch-parity suite runs both paths.

Layout notes (pallas_guide.md):
- q/k/v blocks are (TB, S, 1, 1, hd) windows of the (B, S, 3, n, hd)
  view: one head per program along a grid axis, TB batch rows to amortize
  per-program overhead; hd ∈ {32, 64} pads to the 128-lane tile —
  acceptable waste on the small q/k/v tiles, while the dominant (S, S)
  score tile is exactly lane-aligned;
- the additive mask enters as a (TB, S) f32 block (one row per batch
  element, broadcast over heads and query positions in-kernel);
- per-batch-row matmuls are a static Python loop over TB 2-D dots — no
  batched dot_general assumptions, everything lowers to plain MXU ops.
"""

from __future__ import annotations

import functools
import math

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _heads_attention(row, bias, num_heads: int, scale: float):
    """Shared attention core of all fused kernels: one batch row's
    (S, 3H) qkv — heads as static lane slices — against its (1, S) f32
    padding bias, returning the (S, H) f32 context. Numerics contract
    (torch-parity suite): f32 score accumulation and bias add, softmax
    in the compute dtype (the XLA path's semantics), f32 context
    accumulation."""
    s, h3 = row.shape
    h = h3 // 3
    hd = h // num_heads
    ctx_heads = []
    for j in range(num_heads):                    # static unroll
        q = row[:, j * hd:(j + 1) * hd]           # (S, hd)
        k = row[:, h + j * hd:h + (j + 1) * hd]
        v = row[:, 2 * h + j * hd:2 * h + (j + 1) * hd]
        scores = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)   # (S, S) f32
        scores = scores * scale + bias
        probs = jax.nn.softmax(scores.astype(q.dtype), axis=-1)
        ctx_heads.append(jax.lax.dot_general(
            probs, v, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))  # (S, hd) f32
    return jnp.concatenate(ctx_heads, axis=-1)    # (S, H) f32


def _attn_kernel(qkv_ref, bias_ref, out_ref, *, scale: float, tb: int,
                 num_heads: int):
    """One program handles a block of TB batch rows, ALL heads.

    Mosaic requires the last two dims of every block to be (8,128)-aligned
    or cover the whole array, so heads cannot be a trailing block axis in
    the natural layout; instead the full (S, 3H) row loads once and heads
    are static lane slices in-kernel (offsets are compile-time constants —
    Mosaic lowers them to cheap VPU relayouts, far cheaper than the HBM
    transposes the XLA path materializes)."""
    for t in range(tb):                           # static unroll
        ctx = _heads_attention(qkv_ref[t], bias_ref[t, 0][None, :],
                               num_heads, scale)
        out_ref[t] = ctx.astype(out_ref.dtype)    # (S, H)


@functools.partial(jax.jit,
                   static_argnames=("num_heads", "scale", "block_b",
                                    "interpret"))
def fused_attention_qkv(qkv: jax.Array, mask_bias: jax.Array, *,
                        num_heads: int, scale: float, block_b: int = 8,
                        interpret: bool = False) -> jax.Array:
    """softmax(q @ k^T * scale + bias) @ v from a fused qkv projection.

    qkv:        (B, S, 3H) compute dtype (bf16/f32) — the natural output
                layout of the fused qkv matmul, q|k|v concatenated on the
                feature axis with heads interleaved inside each third
    mask_bias:  (B, S) f32 additive mask (0 attended / -1e9 padded) —
                broadcast over heads and query positions, the BERT padding
                mask semantics of models/bert.py:bert_forward
    returns:    (B, S, H) context in qkv.dtype — ready for the attention
                output matmul, no transpose needed
    """
    b, s, h3 = qkv.shape
    h = h3 // 3

    # tb: VMEM-budgeted batch rows per program. The (tb, s, 3h) in block
    # and (tb, s, h) out block are each double-buffered by the pipeline;
    # keep their sum under ~12 MB of the 16 MB scoped VMEM. The bias rides
    # as (B, 1, S) so its block's last two dims are full — tb itself is a
    # leading dim and free of the (8, 128) tiling rule.
    itemsize = jnp.dtype(qkv.dtype).itemsize
    per_row = 2 * s * (h3 + h) * itemsize
    tb_cap = max(1, (12 << 20) // per_row)
    tb = next((d for d in range(min(block_b, b, tb_cap), 0, -1)
               if b % d == 0), 1)
    grid = (b // tb,)

    kernel = functools.partial(_attn_kernel, scale=scale, tb=tb,
                               num_heads=num_heads)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tb, s, h3), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, 1, s), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tb, s, h), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, s, h), qkv.dtype),
        interpret=interpret,
    )(qkv, mask_bias.astype(jnp.float32)[:, None, :])


def _attn_block_kernel(x_ref, w_ref, b_ref, bias_ref, out_ref, *,
                       scale: float, tb: int, num_heads: int):
    """qkv projection + attention for a block of TB batch rows.

    The projection runs in-kernel as one (TB·S, H) @ (H, 3H) MXU matmul
    (the leading-dim merge is a free row-major reshape), so the (B, S,
    3H) qkv activation never exists in HBM — on top of the score/
    transpose savings of _attn_kernel this removes one full write+read
    of the model's largest intermediate per layer. Epilogue semantics
    match models/bert.py:_attention: f32 accumulation, bias in acc
    dtype, rounded once to the compute dtype."""
    h = x_ref.shape[-1]
    s = x_ref.shape[1]
    # under tensor parallelism the weight holds only the LOCAL heads'
    # columns (h_out = H/tp, num_heads = heads/tp) — the kernel is the
    # same mini-attention either way
    h_out = w_ref.shape[-1] // 3
    x = x_ref[:].reshape(tb * s, h)               # (TB*S, H)
    acc = jnp.float32
    qkv = jax.lax.dot_general(
        x, w_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=acc)               # (TB*S, 3H_out) f32
    qkv = (qkv + b_ref[0][None, :].astype(acc)).astype(x.dtype)
    qkv = qkv.reshape(tb, s, 3 * h_out)
    for t in range(tb):                           # static unroll
        ctx = _heads_attention(qkv[t], bias_ref[t, 0][None, :],
                               num_heads, scale)
        out_ref[t] = ctx.astype(out_ref.dtype)    # (S, H_out)


@functools.partial(jax.jit,
                   static_argnames=("num_heads", "scale", "block_b",
                                    "interpret"))
def fused_attention_block(x: jax.Array, qkv_w: jax.Array,
                          qkv_b: jax.Array, mask_bias: jax.Array, *,
                          num_heads: int, scale: float, block_b: int = 8,
                          interpret: bool = False) -> jax.Array:
    """qkv projection + softmax attention fused in one kernel.

    x:        (B, S, H) compute dtype — the LayerNorm'd layer input
    qkv_w:    (H, 3H) weights (any dtype; cast to x.dtype like the XLA
              path), q|k|v concatenated with heads inside each third
    qkv_b:    (3H,) bias
    mask_bias:(B, S) f32 additive padding mask
    returns:  (B, S, H) context in x.dtype

    The weight block rides with an index_map pinned to (0, 0): every
    grid program reads the same (H, 3H) tile (~0.9 MB bf16 at MiniLM
    width — resident, trivially re-fetched).
    """
    b, s, h = x.shape
    h_out = qkv_w.shape[-1] // 3   # < h under tensor parallelism
    w = qkv_w.astype(x.dtype)
    bias1 = qkv_b.reshape(1, -1).astype(x.dtype)

    itemsize = jnp.dtype(x.dtype).itemsize
    # in + out blocks double-buffered, plus the in-kernel (TB*S, 3H) qkv
    # value; budget ~12 MB of scoped VMEM
    per_row = s * (2 * 2 * h + 2 * 3 * h_out) * itemsize
    tb_cap = max(1, (12 << 20) // per_row)
    tb = next((d for d in range(min(block_b, b, tb_cap), 0, -1)
               if b % d == 0), 1)
    grid = (b // tb,)

    kernel = functools.partial(_attn_block_kernel, scale=scale, tb=tb,
                               num_heads=num_heads)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tb, s, h), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(w.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(bias1.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, 1, s), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tb, s, h_out), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, s, h_out), x.dtype),
        interpret=interpret,
    )(x, w, bias1, mask_bias.astype(jnp.float32)[:, None, :])


def _erf_as(x):
    """erf via the Abramowitz–Stegun 7.1.26 polynomial (max abs error
    1.5e-7 — below one ulp of the bf16/f32-rounded GELU output). Mosaic
    lowers neither ``erf`` nor ``erfc``; this form needs only exp, which
    it does. Used for the exact-GELU FFN inside the fused layer kernel;
    the XLA path keeps jax.nn.gelu(approximate=False)."""
    a1, a2, a3, a4, a5 = (0.254829592, -0.284496736, 1.421413741,
                          -1.453152027, 1.061405429)
    p = 0.3275911
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    y = 1.0 - poly * jnp.exp(-ax * ax)
    return jnp.sign(x) * y


def _encoder_layer_kernel(x_ref, w_ref, b_ref, wo_ref, bo_ref, g1_ref,
                          be1_ref, wi_ref, bi_ref, wd_ref, bd_ref,
                          g2_ref, be2_ref, bias_ref, out_ref, h1_ref, *,
                          scale: float, tb: int, num_heads: int,
                          ln_eps: float):
    """One COMPLETE post-LN BERT encoder layer in a single kernel:
    qkv → attention → out-proj → +residual → LN1 → ffn_in → GELU →
    ffn_out → +residual → LN2. The only HBM traffic is the layer's input
    and output (plus one weight-set read per grid program): the qkv
    activation, per-head scores, context, post-LN1 hidden, and the 4H
    FFN intermediate all live and die in VMEM."""
    h = x_ref.shape[-1]
    s = x_ref.shape[1]
    xb = x_ref[:]                                 # (TB, S, H)
    x = xb.reshape(tb * s, h)
    f32 = jnp.float32
    acc = x.dtype if x.dtype == jnp.bfloat16 else f32
    qkv = jax.lax.dot_general(
        x, w_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=f32)
    qkv = (qkv + b_ref[0][None, :].astype(f32)).astype(x.dtype)
    qkv = qkv.reshape(tb, s, 3 * h)
    for t in range(tb):                           # static unroll
        ctx = _heads_attention(qkv[t], bias_ref[t, 0][None, :],
                               num_heads, scale).astype(x.dtype)
        attn = jax.lax.dot_general(
            ctx, wo_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=f32).astype(acc)
        attn = (attn + bo_ref[0][None, :].astype(acc)).astype(x.dtype)
        resid = xb[t].astype(f32) + attn.astype(f32)
        mean = jnp.mean(resid, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(resid - mean), axis=-1, keepdims=True)
        normed = (resid - mean) * jax.lax.rsqrt(var + ln_eps)
        y = (normed * g1_ref[0][None, :].astype(f32)
             + be1_ref[0][None, :].astype(f32))
        h1_ref[t * s:(t + 1) * s, :] = y.astype(x.dtype)

    # FFN over the whole block at once: (TB*S, H) @ (H, I) @ (I, H)
    y = h1_ref[:]                                 # (TB*S, H) post-LN1
    up = jax.lax.dot_general(
        y, wi_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=f32).astype(acc)
    up = (up + bi_ref[0][None, :].astype(acc)).astype(f32)
    up = 0.5 * up * (1.0 + _erf_as(up * np.float32(1 / math.sqrt(2))))
    down = jax.lax.dot_general(
        up.astype(x.dtype), wd_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=f32).astype(acc)
    down = down + bd_ref[0][None, :].astype(acc)
    resid2 = y.astype(f32) + down.astype(f32)
    mean2 = jnp.mean(resid2, axis=-1, keepdims=True)
    var2 = jnp.mean(jnp.square(resid2 - mean2), axis=-1, keepdims=True)
    normed2 = (resid2 - mean2) * jax.lax.rsqrt(var2 + ln_eps)
    out = (normed2 * g2_ref[0][None, :].astype(f32)
           + be2_ref[0][None, :].astype(f32))
    out_ref[:] = out.astype(out_ref.dtype).reshape(tb, s, h)


@functools.partial(jax.jit,
                   static_argnames=("num_heads", "scale", "ln_eps",
                                    "block_b", "interpret"))
def fused_encoder_layer(x: jax.Array, layer: dict, mask_bias: jax.Array,
                        *, num_heads: int, scale: float, ln_eps: float,
                        block_b: int = 8,
                        interpret: bool = False) -> jax.Array:
    """One full post-LN BERT encoder layer as a single Pallas kernel.

    ``layer`` is the (unquantized) per-layer param dict of
    models/bert.py — qkv_w/b, attn_out_w/b, attn_ln_scale/bias,
    ffn_in_w/b, ffn_out_w/b, ffn_ln_scale/bias. Weight blocks ride
    pinned to (0, 0).
    """
    b, s, h = x.shape
    inter = layer["ffn_in_w"].shape[-1]
    dt = x.dtype
    row1 = lambda a, d: a.reshape(1, -1).astype(d)

    itemsize = jnp.dtype(dt).itemsize
    # in/out blocks double-buffered + qkv value (3H) + post-LN1 scratch
    # (H) + FFN intermediate (I ≈ 4H); weights are grid-constant
    per_row = s * (2 * 2 * h + 3 * h + h + inter) * itemsize
    weights_bytes = (h * 3 * h + h * h + h * inter + inter * h) * itemsize
    budget = (13 << 20) - weights_bytes
    tb_cap = max(1, budget // per_row)
    tb = next((d for d in range(min(block_b, b, tb_cap), 0, -1)
               if b % d == 0), 1)
    grid = (b // tb,)

    kernel = functools.partial(_encoder_layer_kernel, scale=scale, tb=tb,
                               num_heads=num_heads, ln_eps=ln_eps)
    pin = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM)
    args = [
        x,
        layer["qkv_w"].astype(dt), row1(layer["qkv_b"], dt),
        layer["attn_out_w"].astype(dt), row1(layer["attn_out_b"], dt),
        row1(layer["attn_ln_scale"], jnp.float32),
        row1(layer["attn_ln_bias"], jnp.float32),
        layer["ffn_in_w"].astype(dt), row1(layer["ffn_in_b"], dt),
        layer["ffn_out_w"].astype(dt), row1(layer["ffn_out_b"], dt),
        row1(layer["ffn_ln_scale"], jnp.float32),
        row1(layer["ffn_ln_bias"], jnp.float32),
        mask_bias.astype(jnp.float32)[:, None, :],
    ]
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((tb, s, h), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)]
        + [pin(a.shape) for a in args[1:-1]]
        + [pl.BlockSpec((tb, 1, s), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((tb, s, h), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, s, h), dt),
        scratch_shapes=[pltpu.VMEM((tb * s, h), dt)],
        interpret=interpret,
    )(*args)


def _qmm(x, wq_ref, ws_ref):
    """In-kernel dynamic W8A8 matmul: per-token activation quant on the
    VPU (the pass that made unfused int8 LOSE at narrow widths — here the
    activation is already in VMEM/registers, so the quant fuses into the
    matmul feed instead of costing an HBM round-trip), int8×int8 MXU dot
    with i32 accumulation, rescale by token × channel scales. Numerics
    match models/bert.py:_int8_matmul op-for-op.

    x: (R, H) any float dtype; wq_ref: (H, O) int8; ws_ref: (1, O) f32.
    Returns (R, O) f32.
    """
    xf = x.astype(jnp.float32)
    sx = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True),
                     1e-8) / 127.0
    xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
    y = jax.lax.dot_general(xq, wq_ref[:],
                            dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    return y.astype(jnp.float32) * sx * ws_ref[0][None, :]


def _encoder_layer_kernel_int8(x_ref, wq_ref, ws_ref, b_ref, woq_ref,
                               wos_ref, bo_ref, g1_ref, be1_ref, wiq_ref,
                               wis_ref, bi_ref, wdq_ref, wds_ref, bd_ref,
                               g2_ref, be2_ref, bias_ref, out_ref,
                               h1_ref, *, scale: float, tb: int,
                               num_heads: int, ln_eps: float):
    """The int8 (W8A8) variant of _encoder_layer_kernel: all four linears
    run as in-kernel dynamic-quant int8 MXU matmuls (2× the bf16 rate on
    v5e), attention scores/softmax stay full precision. int8 weights
    HALVE the pinned-VMEM footprint vs bf16 — gte-large-class layers
    (~25 MB bf16, too big for the fused kernel) fit at ~12.6 MB int8, so
    the widest models get the full-layer fusion AND the int8 rate
    together."""
    h = x_ref.shape[-1]
    s = x_ref.shape[1]
    xb = x_ref[:]                                 # (TB, S, H)
    x = xb.reshape(tb * s, h)
    f32 = jnp.float32
    acc = x.dtype if x.dtype == jnp.bfloat16 else f32
    qkv = _qmm(x, wq_ref, ws_ref)
    qkv = (qkv + b_ref[0][None, :].astype(f32)).astype(x.dtype)
    qkv = qkv.reshape(tb, s, 3 * h)
    for t in range(tb):                           # static unroll
        ctx = _heads_attention(qkv[t], bias_ref[t, 0][None, :],
                               num_heads, scale).astype(x.dtype)
        attn = _qmm(ctx, woq_ref, wos_ref).astype(acc)
        attn = (attn + bo_ref[0][None, :].astype(acc)).astype(x.dtype)
        resid = xb[t].astype(f32) + attn.astype(f32)
        mean = jnp.mean(resid, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(resid - mean), axis=-1, keepdims=True)
        normed = (resid - mean) * jax.lax.rsqrt(var + ln_eps)
        y = (normed * g1_ref[0][None, :].astype(f32)
             + be1_ref[0][None, :].astype(f32))
        h1_ref[t * s:(t + 1) * s, :] = y.astype(x.dtype)

    y = h1_ref[:]                                 # (TB*S, H) post-LN1
    up = _qmm(y, wiq_ref, wis_ref).astype(acc)
    up = (up + bi_ref[0][None, :].astype(acc)).astype(f32)
    up = 0.5 * up * (1.0 + _erf_as(up * np.float32(1 / math.sqrt(2))))
    down = _qmm(up.astype(x.dtype), wdq_ref, wds_ref).astype(acc)
    down = down + bd_ref[0][None, :].astype(acc)
    resid2 = y.astype(f32) + down.astype(f32)
    mean2 = jnp.mean(resid2, axis=-1, keepdims=True)
    var2 = jnp.mean(jnp.square(resid2 - mean2), axis=-1, keepdims=True)
    normed2 = (resid2 - mean2) * jax.lax.rsqrt(var2 + ln_eps)
    out = (normed2 * g2_ref[0][None, :].astype(f32)
           + be2_ref[0][None, :].astype(f32))
    out_ref[:] = out.astype(out_ref.dtype).reshape(tb, s, h)


@functools.partial(jax.jit,
                   static_argnames=("num_heads", "scale", "ln_eps",
                                    "block_b", "interpret"))
def fused_encoder_layer_int8(x: jax.Array, layer: dict,
                             mask_bias: jax.Array, *, num_heads: int,
                             scale: float, ln_eps: float,
                             block_b: int = 8,
                             interpret: bool = False) -> jax.Array:
    """One full post-LN BERT encoder layer, W8A8, as a single kernel.

    ``layer`` is the QUANTIZED per-layer param dict (qkv_w_q/_s etc.
    from models/bert.py:quantize_params_int8) plus the full-precision
    biases and LN params.
    """
    b, s, h = x.shape
    inter = layer["ffn_in_w_q"].shape[-1]
    dt = x.dtype
    row1 = lambda a, d: a.reshape(1, -1).astype(d)

    itemsize = jnp.dtype(dt).itemsize
    # activations as in the bf16 kernel plus the int8/f32 quant
    # temporaries of the widest matmul; int8 weights are grid-constant
    per_row = s * (2 * 2 * h + 3 * h + h + 2 * inter) * itemsize
    weights_bytes = h * 3 * h + h * h + h * inter + inter * h  # int8
    budget = (13 << 20) - weights_bytes
    tb_cap = max(1, budget // per_row)
    tb = next((d for d in range(min(block_b, b, tb_cap), 0, -1)
               if b % d == 0), 1)
    grid = (b // tb,)

    kernel = functools.partial(_encoder_layer_kernel_int8, scale=scale,
                               tb=tb, num_heads=num_heads, ln_eps=ln_eps)
    pin = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM)
    args = [
        x,
        layer["qkv_w_q"], row1(layer["qkv_w_s"], jnp.float32),
        row1(layer["qkv_b"], dt),
        layer["attn_out_w_q"], row1(layer["attn_out_w_s"], jnp.float32),
        row1(layer["attn_out_b"], dt),
        row1(layer["attn_ln_scale"], jnp.float32),
        row1(layer["attn_ln_bias"], jnp.float32),
        layer["ffn_in_w_q"], row1(layer["ffn_in_w_s"], jnp.float32),
        row1(layer["ffn_in_b"], dt),
        layer["ffn_out_w_q"], row1(layer["ffn_out_w_s"], jnp.float32),
        row1(layer["ffn_out_b"], dt),
        row1(layer["ffn_ln_scale"], jnp.float32),
        row1(layer["ffn_ln_bias"], jnp.float32),
        mask_bias.astype(jnp.float32)[:, None, :],
    ]
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((tb, s, h), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)]
        + [pin(a.shape) for a in args[1:-1]]
        + [pl.BlockSpec((tb, 1, s), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((tb, s, h), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, s, h), dt),
        scratch_shapes=[pltpu.VMEM((tb * s, h), dt)],
        interpret=interpret,
    )(*args)

"""Tensor parallelism for the larger encoders (SURVEY.md §2: "optional
head-sharding for larger encoders (gte-large)").

Megatron-style sharding run as EXPLICIT per-chip SPMD: column-parallel
projections (QKV, FFN-in) shard their output dim over the model axis,
row-parallel projections (attn-out, FFN-out) shard their input dim, and
``bert.encoder_layer_tp`` issues a manual ``jax.lax.psum`` after each
row-parallel projection inside ``shard_map``. (An earlier GSPMD
formulation let XLA's partitioner insert the reduces, but GSPMD cannot
partition the opaque Pallas custom calls — shard_map keeps the per-chip
body ordinary single-device code, so the fused kernels and int8 compose
with TP.) LayerNorm/bias/embedding leaves are replicated.

Used by :class:`sema_tpu.models.encoder.Encoder` when constructed with
``model_axis=`` naming an axis of its mesh — production wiring is
``[mesh] model_axis`` + a 3-entry ``[mesh] shape`` (cli.py builds the
(data, model, index) mesh); correctness is asserted against the
single-device forward on the virtual CPU mesh in tests.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def tp_param_specs(model_axis: str) -> Dict[str, Dict[str, P]]:
    """PartitionSpec per param-tree leaf (layer-stacked leaves lead with
    L). Covers both full-precision and int8-quantized leaves — the
    quantized weight shards with its per-output-channel scales (scales
    of row-parallel projections are replicated: they index the OUTPUT
    dim, which row-parallel keeps whole)."""
    return {
        "embeddings": {
            "word": P(), "position": P(), "token_type": P(),
            "ln_scale": P(), "ln_bias": P(),
        },
        "layers": {
            # column-parallel: output features sharded
            "qkv_w": P(None, None, model_axis),
            "qkv_w_q": P(None, None, model_axis),
            "qkv_w_s": P(None, model_axis),
            "qkv_b": P(None, model_axis),
            "ffn_in_w": P(None, None, model_axis),
            "ffn_in_w_q": P(None, None, model_axis),
            "ffn_in_w_s": P(None, model_axis),
            "ffn_in_b": P(None, model_axis),
            # row-parallel: input features sharded; reduce after
            "attn_out_w": P(None, model_axis, None),
            "attn_out_w_q": P(None, model_axis, None),
            "attn_out_w_s": P(None, None),
            "attn_out_b": P(None, None),
            "ffn_out_w": P(None, model_axis, None),
            "ffn_out_w_q": P(None, model_axis, None),
            "ffn_out_w_s": P(None, None),
            "ffn_out_b": P(None, None),
            # layernorms replicated
            "attn_ln_scale": P(None, None), "attn_ln_bias": P(None, None),
            "ffn_ln_scale": P(None, None), "ffn_ln_bias": P(None, None),
        },
    }


def tp_spec_tree(params, model_axis: str):
    """The pytree of PartitionSpecs matching ``params``' structure (for
    shard_map in_specs / device_put)."""
    specs = tp_param_specs(model_axis)
    return {group: {name: specs[group][name] for name in params[group]}
            for group in ("embeddings", "layers")}


def permute_qkv_heads(params, tp: int):
    """Reorder the fused qkv projection's output columns so a contiguous
    1/tp column shard holds exactly [q|k|v] of a contiguous head block.

    The natural (H, 3H) q|k|v concatenation puts each chip's contiguous
    shard ACROSS the q/k/v boundary; per-chip mini-attention needs local
    heads. attn_out's rows are already head-contiguous, so only qkv_w /
    qkv_b (and their quantized twins — per-column scales move with their
    columns) permute. Applied BEFORE sharding; a pure host-side layout
    step, numerics unchanged."""
    layers = dict(params["layers"])
    some_w = layers.get("qkv_w", layers.get("qkv_w_q"))
    h3 = some_w.shape[-1]
    h = h3 // 3
    if h % tp:
        raise ValueError(
            f"hidden size {h} not divisible by tensor-parallel degree "
            f"{tp}")
    hl = h // tp
    # new column order: for chip c: q[c·hl:(c+1)·hl] | k[...] | v[...]
    perm = []
    for c in range(tp):
        for third in range(3):
            start = third * h + c * hl
            perm.extend(range(start, start + hl))
    perm = jnp.asarray(perm)
    for name in ("qkv_w", "qkv_w_q", "qkv_b", "qkv_w_s"):
        if name in layers:
            layers[name] = layers[name][..., perm]
    return {**params, "layers": layers}


def shard_params_tp(params, mesh: Mesh, model_axis: str = "model",
                    permute: bool = True):
    """Place a param pytree onto the mesh with the TP layout (qkv
    columns pre-permuted to head-contiguous shards unless ``permute``
    is False)."""
    if permute:
        params = permute_qkv_heads(params, mesh.shape[model_axis])
    specs = tp_param_specs(model_axis)

    def place(group: str):
        return {
            name: jax.device_put(arr, NamedSharding(mesh, specs[group][name]))
            for name, arr in params[group].items()
        }

    return {"embeddings": place("embeddings"), "layers": place("layers")}

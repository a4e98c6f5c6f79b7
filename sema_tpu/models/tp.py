"""Tensor parallelism for the larger encoders (SURVEY.md §2: "optional
head-sharding for larger encoders (gte-large)").

Megatron-style weight layout expressed as GSPMD shardings — no manual
collectives. Column-parallel projections (QKV, FFN-in) shard their output
dim over the ``model`` axis; row-parallel projections (attn-out, FFN-out)
shard their input dim, and XLA's partitioner inserts the reduce
(``psum``) after them. LayerNorm/bias/embedding leaves are replicated.

Used by :class:`sema_tpu.models.encoder.Encoder` when constructed with a
mesh that has a ``model`` axis; correctness is asserted against the
single-device forward on the virtual CPU mesh in tests.
"""

from __future__ import annotations

from typing import Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def tp_param_specs(model_axis: str) -> Dict[str, Dict[str, P]]:
    """PartitionSpec per param-tree leaf (layer-stacked leaves lead with L)."""
    return {
        "embeddings": {
            "word": P(), "position": P(), "token_type": P(),
            "ln_scale": P(), "ln_bias": P(),
        },
        "layers": {
            # column-parallel: output features sharded
            "qkv_w": P(None, None, model_axis),
            "qkv_b": P(None, model_axis),
            "ffn_in_w": P(None, None, model_axis),
            "ffn_in_b": P(None, model_axis),
            # row-parallel: input features sharded; XLA reduces after
            "attn_out_w": P(None, model_axis, None),
            "attn_out_b": P(None, None),
            "ffn_out_w": P(None, model_axis, None),
            "ffn_out_b": P(None, None),
            # layernorms replicated
            "attn_ln_scale": P(None, None), "attn_ln_bias": P(None, None),
            "ffn_ln_scale": P(None, None), "ffn_ln_bias": P(None, None),
        },
    }


def shard_params_tp(params, mesh: Mesh, model_axis: str = "model"):
    """Place a param pytree onto the mesh with the TP layout."""
    specs = tp_param_specs(model_axis)

    def place(group: str):
        return {
            name: jax.device_put(arr, NamedSharding(mesh, specs[group][name]))
            for name, arr in params[group].items()
        }

    return {"embeddings": place("embeddings"), "layers": place("layers")}

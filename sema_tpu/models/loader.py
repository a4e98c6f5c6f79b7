"""Encoder weight loading.

Sources, in priority order (the reference downloads from the HF hub on every
run, embeddings.rs:93-103; we are offline-first):

1. an explicit local directory containing ``model.safetensors``
   (``model.weights_path`` config / ``--weights`` flag);
2. the local HF hub cache (``~/.cache/huggingface/hub``), if the model was
   ever downloaded on this machine;
3. deterministic random initialization (keeps the full pipeline runnable —
   and benchmarkable, FLOPs are identical — without network access).

HF BertModel parameter names are mapped onto the stacked layer pytree of
:mod:`sema_tpu.models.bert`; torch ``Linear.weight`` is (out, in) and is
transposed to (in, out) on load.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from sema_tpu.models.registry import EncoderSpec

# (our leaf name, HF suffix, transpose?) — q/k/v are fused post-load
_LAYER_LEAVES = [
    ("attn_out_w", "attention.output.dense.weight", True),
    ("attn_out_b", "attention.output.dense.bias", False),
    ("attn_ln_scale", "attention.output.LayerNorm.weight", False),
    ("attn_ln_bias", "attention.output.LayerNorm.bias", False),
    ("ffn_in_w", "intermediate.dense.weight", True),
    ("ffn_in_b", "intermediate.dense.bias", False),
    ("ffn_out_w", "output.dense.weight", True),
    ("ffn_out_b", "output.dense.bias", False),
    ("ffn_ln_scale", "output.LayerNorm.weight", False),
    ("ffn_ln_bias", "output.LayerNorm.bias", False),
]

_EMB_LEAVES = [
    ("word", "embeddings.word_embeddings.weight"),
    ("position", "embeddings.position_embeddings.weight"),
    ("token_type", "embeddings.token_type_embeddings.weight"),
    ("ln_scale", "embeddings.LayerNorm.weight"),
    ("ln_bias", "embeddings.LayerNorm.bias"),
]


def from_hf_tensors(tensors: Dict[str, np.ndarray], spec: EncoderSpec,
                    param_dtype=jnp.float32) -> Dict[str, Any]:
    """Convert a flat {hf_name: array} dict into the stacked param pytree.

    Accepts names with or without the ``bert.`` / ``encoder.`` model prefix
    used by various exports.
    """
    def get(name: str) -> np.ndarray:
        for prefix in ("", "bert.", "model.", "encoder."):
            key = prefix + name
            if key in tensors:
                return np.asarray(tensors[key])
        raise KeyError(f"missing weight {name!r}; have e.g. "
                       f"{sorted(tensors)[:5]}")

    emb = {ours: jnp.asarray(get(hf), dtype=param_dtype)
           for ours, hf in _EMB_LEAVES}

    layers: Dict[str, list] = {ours: [] for ours, _, _ in _LAYER_LEAVES}
    layers["qkv_w"] = []
    layers["qkv_b"] = []
    for i in range(spec.num_layers):
        for ours, suffix, transpose in _LAYER_LEAVES:
            w = get(f"encoder.layer.{i}.{suffix}")
            if transpose:
                w = w.T
            layers[ours].append(np.asarray(w))
        # fuse q|k|v: torch Linear weights are (out, in) → transpose to
        # (in, out) then concatenate along out → (H, 3H)
        qkv_w = np.concatenate([
            np.asarray(get(f"encoder.layer.{i}.attention.self.{p}.weight")).T
            for p in ("query", "key", "value")], axis=1)
        qkv_b = np.concatenate([
            np.asarray(get(f"encoder.layer.{i}.attention.self.{p}.bias"))
            for p in ("query", "key", "value")])
        layers["qkv_w"].append(qkv_w)
        layers["qkv_b"].append(qkv_b)
    stacked = {k: jnp.asarray(np.stack(v), dtype=param_dtype)
               for k, v in layers.items()}
    return {"embeddings": emb, "layers": stacked}


def random_params(spec: EncoderSpec, seed: int = 0,
                  param_dtype=jnp.float32) -> Dict[str, Any]:
    """Deterministic BERT-style initialization (trunc-normal σ=0.02)."""
    key = jax.random.key(seed)
    ks = iter(jax.random.split(key, 8 + 16))

    def init(k, shape):
        return (jax.random.truncated_normal(k, -2.0, 2.0, shape) * 0.02
                ).astype(param_dtype)

    H, I, L = spec.hidden_size, spec.intermediate_size, spec.num_layers
    emb = {
        "word": init(next(ks), (spec.vocab_size, H)),
        "position": init(next(ks), (spec.max_position_embeddings, H)),
        "token_type": init(next(ks), (2, H)),
        "ln_scale": jnp.ones((H,), param_dtype),
        "ln_bias": jnp.zeros((H,), param_dtype),
    }
    shapes = {
        "qkv_w": (L, H, 3 * H), "qkv_b": (L, 3 * H),
        "attn_out_w": (L, H, H), "attn_out_b": (L, H),
        "ffn_in_w": (L, H, I), "ffn_in_b": (L, I),
        "ffn_out_w": (L, I, H), "ffn_out_b": (L, H),
    }
    layers = {name: init(next(ks), shape) for name, shape in shapes.items()}
    layers.update({
        "attn_ln_scale": jnp.ones((L, H), param_dtype),
        "attn_ln_bias": jnp.zeros((L, H), param_dtype),
        "ffn_ln_scale": jnp.ones((L, H), param_dtype),
        "ffn_ln_bias": jnp.zeros((L, H), param_dtype),
    })
    return {"embeddings": emb, "layers": layers}


from sema_tpu.utils.hfcache import hf_cache_snapshot as _hf_cache_snapshot


def _load_tensor_file(path: Path) -> Dict[str, np.ndarray]:
    """Read model.safetensors or a torch pytorch_model.bin."""
    if path.suffix == ".safetensors":
        from safetensors.numpy import load_file
        return load_file(path)
    import torch  # torch-format checkpoint
    state = torch.load(path, map_location="cpu", weights_only=True)
    return {k: v.numpy() for k, v in state.items()}


_WEIGHT_FILES = ("model.safetensors", "pytorch_model.bin")
_FETCH_PATTERNS = ["model.safetensors", "pytorch_model.bin",
                   "tokenizer.json", "vocab.txt", "config.json",
                   "tokenizer_config.json", "special_tokens_map.json"]


def try_autofetch(spec: EncoderSpec):
    """First-run weight download into the HF cache (≙ the reference's
    automatic hub fetch, embeddings.rs:93-103, cached by hf-hub).

    Offline-first contract unchanged: ANY failure — no network, hub
    package absent, rate limit — returns None and the caller continues
    down the fallback chain (random init + warning). Opt out with
    ``SEMA_TPU_NO_AUTOFETCH=1`` (or the standard HF offline env vars).
    Returns the snapshot dir on success.
    """
    import sys
    if not spec.hf_repo:
        return None
    if any(os.environ.get(v) not in (None, "", "0")
           for v in ("SEMA_TPU_NO_AUTOFETCH", "HF_HUB_OFFLINE",
                     "TRANSFORMERS_OFFLINE")):
        return None
    try:
        from huggingface_hub import snapshot_download
        print(f"downloading {spec.hf_repo} from the Hugging Face hub "
              "(first run; SEMA_TPU_NO_AUTOFETCH=1 disables)",
              file=sys.stderr)
        return Path(snapshot_download(repo_id=spec.hf_repo,
                                      allow_patterns=_FETCH_PATTERNS))
    except Exception as e:  # noqa: BLE001 — degrade, never fail startup
        print(f"Warning: weight auto-fetch for {spec.hf_repo} failed "
              f"({type(e).__name__}: {e}); continuing offline",
              file=sys.stderr)
        return None


def load_params(spec: EncoderSpec, weights_path: str = "",
                param_dtype=jnp.float32, seed: int = 0):
    """Resolve weights per the priority order above (plus a first-run
    hub auto-fetch between the cache and the random fallback).

    Returns (params, source) where source ∈ {"local", "hf-cache",
    "hf-download", "random"}.
    """
    if weights_path:
        p = Path(weights_path)
        candidates = ([p / n for n in _WEIGHT_FILES] if p.is_dir() else [p])
        for c in candidates:
            if c.exists():
                return (from_hf_tensors(_load_tensor_file(c), spec,
                                        param_dtype), "local")
        raise FileNotFoundError(f"no weights found under: {weights_path}")

    if spec.hf_repo:
        def find_weights(snap):
            if snap is None:
                return None
            for name in _WEIGHT_FILES:
                if (snap / name).exists():
                    return snap / name
            return None

        wfile = find_weights(_hf_cache_snapshot(spec.hf_repo))
        source = "hf-cache"
        if wfile is None:
            # also reached when a cached snapshot exists but carries no
            # weight file (an interrupted first download) — without the
            # retry that state would degrade to random init forever
            # (review finding, r3)
            wfile = find_weights(try_autofetch(spec))
            source = "hf-download"
        if wfile is not None:
            return (from_hf_tensors(_load_tensor_file(wfile), spec,
                                    param_dtype), source)

    return random_params(spec, seed=seed, param_dtype=param_dtype), "random"

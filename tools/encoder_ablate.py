"""Encoder roofline attribution: is softmax-exp really the critical path?

PERF.md puts the MiniLM fused-layer forward at 19.9 ms/batch-256 vs a
14.7 ms pure-MXU floor and NAMES the residual "softmax exp VPU count" —
but that attribution was arithmetic, not measurement (VERDICT r3 #7).
This tool measures it surgically: the fused kernels call
``_heads_attention`` by module-global name, so swapping that one
function re-traces the WHOLE encoder with an ablated attention core
while every other instruction stays identical.

Variants:
  prod        jax.nn.softmax (exp + max + sum + divide)
  no_exp      same max/sum/divide data flow, exp replaced by a shifted
              identity — isolates the exp units themselves
  no_softmax  probs = scores * 1e-3 — removes the whole softmax epilogue

(no_exp / no_softmax compute WRONG embeddings — they exist only to
attribute device time; the tool never reports their outputs.)

Prints ONE JSON line with ms/call and chunks/sec per variant.
Usage: python tools/encoder_ablate.py [--model minilm-l6] [--batch 256]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from functools import partial
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax  # noqa: E402

if os.environ.get("SEMA_TPU_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["SEMA_TPU_PLATFORM"])

import jax.numpy as jnp  # noqa: E402

from sema_tpu.ops import fused_attention as fa  # noqa: E402
from sema_tpu.utils.jaxcache import enable as _cache  # noqa: E402

_cache()


def _heads_attention_no_exp(row, bias, num_heads: int, scale: float):
    """softmax with exp -> shifted identity: same max/sum/divide passes."""
    s, h3 = row.shape
    h = h3 // 3
    hd = h // num_heads
    ctx_heads = []
    for j in range(num_heads):
        q = row[:, j * hd:(j + 1) * hd]
        k = row[:, h + j * hd:h + (j + 1) * hd]
        v = row[:, 2 * h + j * hd:2 * h + (j + 1) * hd]
        scores = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        scores = (scores * scale + bias).astype(q.dtype)
        m = jnp.max(scores, axis=-1, keepdims=True)
        e = scores - m + jnp.asarray(1.0, q.dtype)     # exp -> identity
        probs = e / jnp.sum(e, axis=-1, keepdims=True)
        ctx_heads.append(jax.lax.dot_general(
            probs, v, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))
    return jnp.concatenate(ctx_heads, axis=-1)


def _heads_attention_no_softmax(row, bias, num_heads: int, scale: float):
    """whole softmax epilogue removed: probs = scaled raw scores."""
    s, h3 = row.shape
    h = h3 // 3
    hd = h // num_heads
    ctx_heads = []
    for j in range(num_heads):
        q = row[:, j * hd:(j + 1) * hd]
        k = row[:, h + j * hd:h + (j + 1) * hd]
        v = row[:, 2 * h + j * hd:2 * h + (j + 1) * hd]
        scores = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        probs = ((scores * scale + bias) *
                 jnp.float32(1e-3)).astype(q.dtype)
        ctx_heads.append(jax.lax.dot_general(
            probs, v, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))
    return jnp.concatenate(ctx_heads, axis=-1)


def _fetch(out):
    leaf = jax.tree.leaves(out)[0]
    return np.asarray(leaf if leaf.ndim == 0 else leaf[:1])


def measure(fn_one, xs, n_calls=16, repeats=3):
    _fetch(fn_one(xs[0]))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = None
        for i in range(n_calls):
            out = fn_one(xs[i % len(xs)])
        _fetch(out)
        best = min(best, (time.perf_counter() - t0) / n_calls)
    return best


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--model", default="minilm-l6")
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--seq", type=int, default=256)
    ap.add_argument("--calls", type=int, default=16)
    args = ap.parse_args()

    from sema_tpu.models import get_spec
    from sema_tpu.models.bert import embed, resolve_attn_impl
    from sema_tpu.models.loader import random_params

    spec = get_spec(args.model)
    params = random_params(spec, seed=0)
    attn_impl = resolve_attn_impl("auto")
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, spec.vocab_size,
                                   (args.batch, args.seq)), jnp.int32)
    mask = jnp.ones((args.batch, args.seq), jnp.int32)
    idsets = [ids, jnp.roll(ids, 1, 0), jnp.roll(ids, 2, 0),
              jnp.roll(ids, 3, 0)]
    print(f"# device {jax.devices()[0]} model {args.model} "
          f"B={args.batch} S={args.seq} attn={attn_impl}",
          file=sys.stderr, flush=True)

    variants = {
        "prod": fa._heads_attention,
        "no_exp": _heads_attention_no_exp,
        "no_softmax": _heads_attention_no_softmax,
    }
    orig = fa._heads_attention
    results = {}
    try:
        for name, core in variants.items():
            fa._heads_attention = core
            fwd = jax.jit(partial(embed, spec=spec,
                                  compute_dtype=jnp.bfloat16,
                                  attn_impl=attn_impl))
            ms = measure(lambda ii: fwd(params, ii, mask), idsets,
                         n_calls=args.calls) * 1e3
            results[name] = {"ms_per_call": round(ms, 3),
                             "chunks_per_sec": round(
                                 args.batch / ms * 1e3, 1)}
            print(f"# {name}: {ms:.2f} ms/call", file=sys.stderr,
                  flush=True)
    finally:
        fa._heads_attention = orig

    prod = results["prod"]["ms_per_call"]
    out = {
        "model": args.model, "batch": args.batch, "seq": args.seq,
        "device": str(jax.devices()[0]),
        "variants": results,
        "exp_ms": round(prod - results["no_exp"]["ms_per_call"], 3),
        "softmax_ms": round(
            prod - results["no_softmax"]["ms_per_call"], 3),
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Fused Pallas attention vs the XLA path (interpret mode on CPU)."""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sema_tpu.models import bert, get_spec
from sema_tpu.models.loader import random_params
from sema_tpu.ops.fused_attention import fused_attention_qkv


def _ref_attention_qkv(qkv, mask_bias, num_heads, scale):
    b, s, h3 = qkv.shape
    h = h3 // 3
    hd = h // num_heads

    def heads(y):
        return y.reshape(b, s, num_heads, hd).transpose(0, 2, 1, 3)

    q, k, v = (heads(y) for y in jnp.split(qkv, 3, axis=-1))
    scores = jnp.einsum("bnqd,bnkd->bnqk", q, k,
                        preferred_element_type=jnp.float32)
    scores = scores * scale + mask_bias[:, None, None, :]
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
    ctx = jnp.einsum("bnqk,bnkd->bnqd", probs, v,
                     preferred_element_type=jnp.float32).astype(q.dtype)
    return ctx.transpose(0, 2, 1, 3).reshape(b, s, h)


@pytest.mark.parametrize("b,n,s,hd", [
    (4, 4, 32, 32),     # minilm-like head dim
    (2, 2, 64, 64),     # e5/gte head dim
    (3, 2, 32, 32),     # batch not divisible by block_b
])
def test_matches_xla_reference(b, n, s, hd):
    rng = np.random.default_rng(0)
    qkv = jnp.asarray(rng.standard_normal((b, s, 3 * n * hd)),
                      dtype=jnp.float32)
    lengths = rng.integers(1, s + 1, size=b)
    mask = (np.arange(s)[None, :] < lengths[:, None]).astype(np.float32)
    bias = jnp.asarray((1.0 - mask) * -1e9)

    scale = 1.0 / math.sqrt(hd)
    got = fused_attention_qkv(qkv, bias, num_heads=n, scale=scale,
                              interpret=True)
    want = _ref_attention_qkv(qkv, bias, n, scale)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-5)


def test_full_embed_fused_vs_xla():
    """End-to-end encoder forward: fused and XLA attention agree."""
    spec = get_spec("test-tiny")
    params = random_params(spec, seed=0)
    rng = np.random.default_rng(1)
    b, s = 4, 32
    ids = jnp.asarray(rng.integers(0, spec.vocab_size, (b, s)), jnp.int32)
    lengths = rng.integers(2, s + 1, size=b)
    mask = jnp.asarray(
        (np.arange(s)[None, :] < lengths[:, None]).astype(np.int32))

    ours = bert.embed(params, ids, mask, spec, attn_impl="fused")
    ref = bert.embed(params, ids, mask, spec, attn_impl="xla")
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)
    # embeddings are L2-normalized; cosine agreement is the product metric
    cos = np.sum(np.asarray(ours) * np.asarray(ref), axis=1)
    assert cos.min() > 0.99999


def test_resolve_attn_impl(monkeypatch):
    monkeypatch.delenv("SEMA_TPU_ATTN", raising=False)
    # off-TPU auto resolves to xla
    assert bert.resolve_attn_impl("auto") in ("fused", "xla")
    if jax.default_backend() != "tpu":
        assert bert.resolve_attn_impl("auto") == "xla"
    monkeypatch.setenv("SEMA_TPU_ATTN", "fused")
    assert bert.resolve_attn_impl("auto") == "fused"
    monkeypatch.setenv("SEMA_TPU_ATTN", "bogus")
    with pytest.raises(ValueError):
        bert.resolve_attn_impl("auto")


def test_block_kernel_matches_two_step():
    """fused_attention_block (projection in-kernel) must match the
    project-then-attend path bit-for-bit in f32."""
    from sema_tpu.ops.fused_attention import fused_attention_block

    rng = np.random.default_rng(3)
    b, n, s, hd = 4, 4, 32, 32
    h = n * hd
    x = jnp.asarray(rng.standard_normal((b, s, h)), dtype=jnp.float32)
    w = jnp.asarray(rng.standard_normal((h, 3 * h)) * 0.05,
                    dtype=jnp.float32)
    bias_w = jnp.asarray(rng.standard_normal(3 * h) * 0.05,
                         dtype=jnp.float32)
    lengths = rng.integers(1, s + 1, size=b)
    mask = (np.arange(s)[None, :] < lengths[:, None]).astype(np.float32)
    mbias = jnp.asarray((1.0 - mask) * -1e9)
    scale = 1.0 / math.sqrt(hd)

    qkv = jnp.einsum("bsh,hm->bsm", x, w,
                     preferred_element_type=jnp.float32) + bias_w
    want = _ref_attention_qkv(qkv, mbias, n, scale)
    got = fused_attention_block(x, w, bias_w, mbias, num_heads=n,
                                scale=scale, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-5)


def test_full_model_fused_uses_block_kernel(monkeypatch):
    """The fused dispatch projects in-kernel for unquantized layers and
    matches the XLA path at the model level."""
    from sema_tpu.models import get_spec
    from sema_tpu.models.loader import random_params

    spec = get_spec("test-tiny")
    params = random_params(spec, seed=0)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, spec.vocab_size, (2, 256)),
                      dtype=jnp.int32)
    mask = jnp.ones((2, 256), dtype=jnp.int32)
    ex = np.asarray(bert.embed(params, ids, mask, spec=spec,
                               attn_impl="xla"))
    ef = np.asarray(bert.embed(params, ids, mask, spec=spec,
                               attn_impl="fused"))
    cos = np.sum(ex * ef, axis=1)
    np.testing.assert_allclose(cos, 1.0, atol=1e-6)


def test_full_layer_kernel_matches_composition():
    """fused_encoder_layer == the composed XLA encoder_layer in f32."""
    from sema_tpu.ops.fused_attention import fused_encoder_layer
    from sema_tpu.models.bert import LN_EPS, encoder_layer
    from sema_tpu.models import get_spec
    from sema_tpu.models.loader import random_params

    spec = get_spec("test-tiny")
    params = random_params(spec, seed=2)
    layer = {k: v[0] for k, v in params["layers"].items()}  # layer 0
    rng = np.random.default_rng(6)
    b, s, h = 2, 32, spec.hidden_size
    x = jnp.asarray(rng.standard_normal((b, s, h)), dtype=jnp.float32)
    lengths = rng.integers(1, s + 1, size=b)
    mask = (np.arange(s)[None, :] < lengths[:, None]).astype(np.float32)
    mbias = jnp.asarray((1.0 - mask) * -1e9)

    want = encoder_layer(x, layer, mbias, spec.num_heads,
                         attn_impl="xla")
    got = fused_encoder_layer(
        x, layer, mbias, num_heads=spec.num_heads,
        scale=1.0 / math.sqrt(h // spec.num_heads), ln_eps=LN_EPS,
        interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=5e-5, rtol=1e-4)


def test_full_layer_kernel_int8_matches_xla_int8():
    """fused_encoder_layer_int8 == the composed XLA W8A8 encoder_layer
    (same dynamic-quant numerics, op-for-op) in f32 compute."""
    from sema_tpu.ops.fused_attention import fused_encoder_layer_int8
    from sema_tpu.models.bert import (LN_EPS, encoder_layer,
                                      quantize_params_int8)
    from sema_tpu.models import get_spec
    from sema_tpu.models.loader import random_params

    spec = get_spec("test-tiny")
    qparams = quantize_params_int8(random_params(spec, seed=2))
    layer = {k: v[0] for k, v in qparams["layers"].items()}  # layer 0
    rng = np.random.default_rng(6)
    b, s, h = 2, 32, spec.hidden_size
    x = jnp.asarray(rng.standard_normal((b, s, h)), dtype=jnp.float32)
    lengths = rng.integers(1, s + 1, size=b)
    mask = (np.arange(s)[None, :] < lengths[:, None]).astype(np.float32)
    mbias = jnp.asarray((1.0 - mask) * -1e9)

    want = encoder_layer(x, layer, mbias, spec.num_heads,
                         attn_impl="xla")
    got = fused_encoder_layer_int8(
        x, layer, mbias, num_heads=spec.num_heads,
        scale=1.0 / math.sqrt(h // spec.num_heads), ln_eps=LN_EPS,
        interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=5e-5, rtol=1e-4)


def test_quantized_layer_dispatches_fused_int8(monkeypatch):
    """encoder_layer routes quantized params to the int8 full-layer
    kernel when it fits VMEM (gte-large's route to the fusion)."""
    from sema_tpu.models.loader import random_params
    from sema_tpu.models.bert import encoder_layer, quantize_params_int8
    import sema_tpu.ops.fused_attention as fa

    called = {}
    real = fa.fused_encoder_layer_int8

    def spy(*a, **kw):
        called["int8"] = True
        return real(*a, **kw)

    monkeypatch.setattr(fa, "fused_encoder_layer_int8", spy)
    spec = get_spec("test-tiny")
    qparams = quantize_params_int8(random_params(spec, seed=0))
    layer = {k: v[0] for k, v in qparams["layers"].items()}
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 32, spec.hidden_size)),
                    dtype=jnp.float32)
    mbias = jnp.zeros((2, 32), dtype=jnp.float32)
    encoder_layer(x, layer, mbias, spec.num_heads, attn_impl="fused")
    assert called.get("int8")

"""W8A8 int8 encoder linears (models/bert.py:quantize_params_int8).

The reference has no quantized inference at all (CPU f32 ONNX,
embeddings.rs:48-52); this is a TPU-side capability. Fidelity gate: the
int8 embedding must stay close to the f32 path in cosine — per-output-
channel weight scales + dynamic per-token activation scales.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from sema_tpu.models import get_spec
from sema_tpu.models.bert import embed, quantize_params_int8
from sema_tpu.models.encoder import Encoder
from sema_tpu.models.loader import random_params


@pytest.fixture(scope="module")
def minilm():
    spec = get_spec("minilm-l6")
    return spec, random_params(spec, seed=0)


def _inputs(spec, b=4, s=32, seed=0):
    rng = np.random.default_rng(seed)
    ids = jnp.asarray(rng.integers(0, spec.vocab_size, (b, s)),
                      dtype=jnp.int32)
    lengths = rng.integers(s // 2, s + 1, size=b)
    mask = jnp.asarray((np.arange(s)[None, :] < lengths[:, None])
                       .astype(np.int32))
    return ids, mask


def test_quantized_pytree_shapes_and_dtypes(minilm):
    spec, params = minilm
    qp = quantize_params_int8(params)
    L = spec.num_layers
    h = spec.hidden_size
    lay = qp["layers"]
    assert lay["qkv_w_q"].dtype == jnp.int8
    assert lay["qkv_w_q"].shape == (L, h, 3 * h)
    assert lay["qkv_w_s"].shape == (L, 3 * h)
    assert lay["ffn_in_w_q"].shape == (L, h, spec.intermediate_size)
    # full-precision weights are gone; biases / LN / embeddings remain
    assert "qkv_w" not in lay and "ffn_out_w" not in lay
    assert "qkv_b" in lay and "attn_ln_scale" in lay
    assert qp["embeddings"]["word"].dtype != jnp.int8


def test_int8_embedding_close_to_f32(minilm):
    spec, params = minilm
    ids, mask = _inputs(spec)
    ref = np.asarray(embed(params, ids, mask, spec=spec,
                           compute_dtype=jnp.float32))
    got = np.asarray(embed(quantize_params_int8(params), ids, mask,
                           spec=spec, compute_dtype=jnp.float32))
    assert got.shape == ref.shape
    # outputs are L2-normalized, so dot = cosine
    cos = np.sum(ref * got, axis=1)
    assert np.all(cos > 0.98), cos


def test_int8_deterministic(minilm):
    spec, params = minilm
    ids, mask = _inputs(spec)
    qp = quantize_params_int8(params)
    a = np.asarray(embed(qp, ids, mask, spec=spec))
    b = np.asarray(embed(qp, ids, mask, spec=spec))
    np.testing.assert_array_equal(a, b)


def test_encoder_quant_mode(minilm, monkeypatch):
    spec, params = minilm
    from sema_tpu.tokenizer.wordpiece import HashTokenizer
    tok = HashTokenizer(spec.vocab_size)
    enc = Encoder(spec, params, tok, batch_size=4, max_length=32,
                  compute_dtype=jnp.float32, quant="int8")
    assert enc.quant == "int8"
    assert enc.params["layers"]["qkv_w_q"].dtype == jnp.int8
    out = enc.encode_texts(["quantized inference on the MXU",
                            "a second text"])
    assert out.shape == (2, spec.dim)
    norms = np.linalg.norm(out, axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)

    # env var overrides the constructor argument
    monkeypatch.setenv("SEMA_TPU_ENCODER_QUANT", "int8")
    enc2 = Encoder(spec, params, tok, batch_size=4, max_length=32,
                   compute_dtype=jnp.float32)
    assert enc2.quant == "int8"


def test_int8_composes_with_tensor_parallel():
    """r2 refused int8 + TP; r3 composes them (full coverage in
    test_tensor_parallel.py::test_tp_composes_with_int8 — this is the
    no-raise construction check on the virtual mesh)."""
    import jax
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    from sema_tpu.models import get_spec
    from sema_tpu.models.loader import random_params
    from sema_tpu.parallel.mesh import make_mesh
    from sema_tpu.tokenizer.wordpiece import HashTokenizer
    spec = get_spec("test-tiny")
    mesh = make_mesh(shape=[2, 4], axis_names=("data", "model"))
    enc = Encoder(spec, random_params(spec, seed=0),
                  HashTokenizer(spec.vocab_size), quant="int8",
                  batch_size=8, mesh=mesh, data_axis="data",
                  model_axis="model")
    assert enc.quant == "int8"
    assert "qkv_w_q" in enc.params["layers"]


def test_quant_config_roundtrip(tmp_path, monkeypatch):
    """[model] quant persists through the TOML config cycle."""
    monkeypatch.setenv("SEMA_TPU_HOME", str(tmp_path))
    from sema_tpu.config import ConfigManager
    cm = ConfigManager()
    cm.init()
    cfg = cm.load_config()
    assert cfg.model.quant == "none"
    cfg.model.quant = "int8"
    cm.save_config(cfg)
    cfg2 = ConfigManager().load_config()
    assert cfg2.model.quant == "int8"

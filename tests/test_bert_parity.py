"""Numerics parity: our functional JAX BERT vs torch transformers BertModel.

The reference runs HF MiniLM through ONNX Runtime (embeddings.rs:48-52);
without network access we cannot load the published weights, so parity is
proven architecturally: identical random weights are loaded into both a
torch ``BertModel`` and our implementation and outputs must agree to fp32
tolerance (SURVEY.md §4 numerics gate: cosine > 0.999; we hold ~1e-5).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from sema_tpu.models import bert, get_spec
from sema_tpu.models.loader import from_hf_tensors, random_params

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def torch_model_and_params():
    from transformers import BertConfig, BertModel
    spec = get_spec("test-tiny")
    cfg = BertConfig(
        vocab_size=spec.vocab_size, hidden_size=spec.hidden_size,
        num_hidden_layers=spec.num_layers,
        num_attention_heads=spec.num_heads,
        intermediate_size=spec.intermediate_size,
        max_position_embeddings=spec.max_position_embeddings,
        hidden_act="gelu", hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0)
    torch.manual_seed(0)
    model = BertModel(cfg, add_pooling_layer=False).eval()
    tensors = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = from_hf_tensors(tensors, spec)
    return spec, model, params


def _random_inputs(spec, batch=3, seq=24, seed=1):
    rng = np.random.default_rng(seed)
    ids = rng.integers(0, spec.vocab_size, size=(batch, seq)).astype(np.int32)
    # ragged attention masks incl. one full row and one nearly-empty row
    mask = np.zeros((batch, seq), dtype=np.int32)
    lengths = [seq, seq // 2, 2]
    for i, L in enumerate(lengths[:batch]):
        mask[i, :L] = 1
        ids[i, L:] = 0
    return ids, mask


def test_hidden_states_match_torch(torch_model_and_params):
    spec, model, params = torch_model_and_params
    ids, mask = _random_inputs(spec)

    with torch.no_grad():
        ref = model(input_ids=torch.tensor(ids, dtype=torch.long),
                    attention_mask=torch.tensor(mask, dtype=torch.long),
                    token_type_ids=torch.zeros_like(
                        torch.tensor(ids, dtype=torch.long))
                    ).last_hidden_state.numpy()

    ours = np.asarray(bert.bert_forward(
        params, jnp.asarray(ids), jnp.asarray(mask), spec))

    # compare only attended positions (padded positions are unconstrained)
    m = mask.astype(bool)
    diff = np.abs(ref[m] - ours[m])
    # fp32 op-order noise (XLA vs torch/oneDNN) accumulates ~1e-4/layer on
    # unit-scale post-LN activations; embeddings alone agree to ~5e-7.
    assert diff.max() < 1e-3, f"max abs diff {diff.max()}"


def test_pooled_embedding_matches_torch_mean_pool(torch_model_and_params):
    spec, model, params = torch_model_and_params
    ids, mask = _random_inputs(spec, seed=2)

    with torch.no_grad():
        hidden = model(input_ids=torch.tensor(ids, dtype=torch.long),
                       attention_mask=torch.tensor(mask, dtype=torch.long)
                       ).last_hidden_state
        m = torch.tensor(mask, dtype=torch.float32).unsqueeze(-1)
        pooled = (hidden * m).sum(1) / m.sum(1)
        ref = torch.nn.functional.normalize(pooled, dim=-1).numpy()

    ours = np.asarray(bert.embed(params, jnp.asarray(ids), jnp.asarray(mask), spec))

    cos = np.sum(ref * ours, axis=-1) / (
        np.linalg.norm(ref, axis=-1) * np.linalg.norm(ours, axis=-1))
    assert cos.min() > 0.99999, f"cosine {cos}"
    assert np.allclose(np.linalg.norm(ours, axis=-1), 1.0, atol=1e-5)


def test_bf16_compute_close_to_f32(torch_model_and_params):
    spec, _, params = torch_model_and_params
    ids, mask = _random_inputs(spec, seed=3)
    f32 = np.asarray(bert.embed(params, jnp.asarray(ids), jnp.asarray(mask),
                                spec, compute_dtype=jnp.float32))
    bf16 = np.asarray(bert.embed(params, jnp.asarray(ids), jnp.asarray(mask),
                                 spec, compute_dtype=jnp.bfloat16))
    cos = np.sum(f32 * bf16, axis=-1)
    assert cos.min() > 0.999  # SURVEY.md §4 parity gate across dtype drift


def test_mean_pool_zero_mask_guard():
    # all-pad row: reference leaves the vector zeros (embeddings.rs:77-81)
    hidden = jnp.ones((1, 4, 8))
    mask = jnp.zeros((1, 4), dtype=jnp.int32)
    out = np.asarray(bert.mean_pool_normalize(hidden, mask))
    assert np.all(out == 0)


def test_random_params_deterministic():
    spec = get_spec("test-tiny")
    a = random_params(spec, seed=7)
    b = random_params(spec, seed=7)
    assert np.array_equal(np.asarray(a["layers"]["qkv_w"]),
                          np.asarray(b["layers"]["qkv_w"]))
    c = random_params(spec, seed=8)
    assert not np.array_equal(np.asarray(a["layers"]["qkv_w"]),
                              np.asarray(c["layers"]["qkv_w"]))


def test_cls_pooling():
    spec = get_spec("test-tiny")
    params = random_params(spec)
    ids = jnp.ones((2, 8), dtype=jnp.int32)
    mask = jnp.ones((2, 8), dtype=jnp.int32)
    hidden = bert.bert_forward(params, ids, mask, spec)
    out = np.asarray(bert.cls_pool_normalize(hidden, mask))
    ref = np.asarray(hidden)[:, 0, :]
    ref = ref / np.linalg.norm(ref, axis=-1, keepdims=True)
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_load_params_from_local_torch_checkpoint(tmp_path,
                                                 torch_model_and_params):
    """--weights pointing at a dir with pytorch_model.bin loads correctly."""
    spec, model, params = torch_model_and_params
    torch.save(model.state_dict(), tmp_path / "pytorch_model.bin")
    from sema_tpu.models.loader import load_params
    loaded, source = load_params(spec, weights_path=str(tmp_path))
    assert source == "local"
    np.testing.assert_array_equal(
        np.asarray(loaded["layers"]["qkv_w"]),
        np.asarray(params["layers"]["qkv_w"]))


def test_load_params_from_local_safetensors(tmp_path, torch_model_and_params):
    spec, model, params = torch_model_and_params
    from safetensors.torch import save_file
    save_file({k: v.contiguous() for k, v in model.state_dict().items()},
              tmp_path / "model.safetensors")
    from sema_tpu.models.loader import load_params
    loaded, source = load_params(spec, weights_path=str(tmp_path))
    assert source == "local"
    np.testing.assert_allclose(
        np.asarray(loaded["embeddings"]["word"]),
        np.asarray(params["embeddings"]["word"]))


def test_load_params_missing_raises(tmp_path):
    from sema_tpu.models.loader import load_params
    spec = get_spec("test-tiny")
    with pytest.raises(FileNotFoundError):
        load_params(spec, weights_path=str(tmp_path / "nope"))

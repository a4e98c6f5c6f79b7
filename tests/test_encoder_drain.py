"""Deferred device→host drain in ``Encoder.encode_texts``.

Batch outputs stay on device until ~SEMA_TPU_EMBED_HOLD_MB megabytes have
accumulated, then drain in bulk (models/encoder.py). These tests force a
tiny hold budget so a small corpus crosses several drain boundaries and
assert the output row mapping survives them, plus the HBM bound and the
progress contract.
"""

import numpy as np
import pytest

import sema_tpu.models.encoder as encoder_mod
from sema_tpu.models import Encoder, get_spec
from sema_tpu.models.loader import random_params
from sema_tpu.tokenizer import HashTokenizer


@pytest.fixture(scope="module")
def encoder():
    spec = get_spec("test-tiny")
    return Encoder(spec, random_params(spec), HashTokenizer(spec.vocab_size),
                   batch_size=8)


def _texts(n=41):
    # varied lengths so bucketing produces different batch shapes
    return [("word " * (1 + (i * 7) % 30)).strip() + f" {i}"
            for i in range(n)]


def test_mid_run_drains_match_single_drain(encoder, monkeypatch):
    # a hold budget smaller than one batch row forces a drain after every
    # batch; the row mapping must be identical to the one-drain-at-end run
    texts = _texts(57)
    monkeypatch.setenv("SEMA_TPU_EMBED_HOLD_MB", "0.000001")
    got = encoder.encode_texts(texts)
    monkeypatch.setenv("SEMA_TPU_EMBED_HOLD_MB", "4096")
    ref = encoder.encode_texts(texts)
    np.testing.assert_allclose(got, ref, atol=1e-6, rtol=1e-6)


def test_partial_final_drain(encoder, monkeypatch):
    # budget ≈ 4 batch outputs: the run crosses a drain boundary mid-way
    # and finishes with a partial held list drained at the end
    spec = encoder.spec
    budget_rows = 4 * encoder.batch_size
    monkeypatch.setenv("SEMA_TPU_EMBED_HOLD_MB",
                       str(budget_rows * spec.dim * 4 / 1e6))
    out = encoder.encode_texts(_texts(200))
    assert out.shape == (200, spec.dim)
    norms = np.linalg.norm(out, axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-3)
    # row mapping identical to the one-drain run
    monkeypatch.setenv("SEMA_TPU_EMBED_HOLD_MB", "4096")
    np.testing.assert_allclose(out, encoder.encode_texts(_texts(200)),
                               atol=1e-6, rtol=1e-6)


def test_progress_monotonic_and_complete(encoder, monkeypatch):
    monkeypatch.setenv("SEMA_TPU_EMBED_HOLD_MB", "0.0001")
    seen = []
    texts = _texts(30)
    encoder.encode_texts(texts, progress=lambda d, t: seen.append((d, t)))
    assert seen[-1] == (len(texts), len(texts))
    assert all(a[0] < b[0] for a, b in zip(seen, seen[1:]))
    assert all(t == len(texts) for _, t in seen)


def test_out_dtype_bf16_matches_f32(encoder, monkeypatch):
    import ml_dtypes
    texts = _texts(20)
    ref = encoder.encode_texts(texts)
    got = encoder.encode_texts(texts, out_dtype=ml_dtypes.bfloat16)
    assert got.dtype == ml_dtypes.bfloat16
    np.testing.assert_allclose(got.astype(np.float32), ref,
                               atol=1 / 128, rtol=1 / 128)
    # the cast happens before the drain: mid-run drains preserve it
    monkeypatch.setenv("SEMA_TPU_EMBED_HOLD_MB", "0.000001")
    got2 = encoder.encode_texts(texts, out_dtype=ml_dtypes.bfloat16)
    np.testing.assert_array_equal(got, got2)

"""Device output-slab accumulation in ``Encoder.encode_texts``.

The slab path (models/encoder.py:_slab_append, opt-in via
SEMA_TPU_EMBED_SLAB=on) replaces one device→host fetch per batch with one
per ~SLAB_ROWS rows. These tests force tiny
slabs so a small corpus crosses several slab boundaries (flush, ready-
queue draining, partial final slab) and assert the output is identical
to the legacy per-batch-drain path.
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


def test_slab_matches_legacy(encoder, monkeypatch):
    texts = _texts()
    monkeypatch.setenv("SEMA_TPU_EMBED_SLAB", "on")
    got = encoder.encode_texts(texts)
    monkeypatch.setenv("SEMA_TPU_EMBED_SLAB", "off")
    ref = encoder.encode_texts(texts)
    np.testing.assert_allclose(got, ref, atol=1e-6, rtol=1e-6)


def test_slab_boundary_crossings(encoder, monkeypatch):
    # slab of 16 rows + batch_size 8 → every second batch flushes; with
    # >2 flushed slabs the ready queue drains mid-run
    monkeypatch.setattr(encoder_mod, "SLAB_ROWS", 16)
    monkeypatch.setenv("SEMA_TPU_EMBED_SLAB", "on")
    texts = _texts(57)
    got = encoder.encode_texts(texts)
    monkeypatch.setenv("SEMA_TPU_EMBED_SLAB", "off")
    ref = encoder.encode_texts(texts)
    np.testing.assert_allclose(got, ref, atol=1e-6, rtol=1e-6)


def test_batch_larger_than_slab(encoder, monkeypatch):
    # a padded batch wider than SLAB_ROWS gets a slab sized to the batch
    monkeypatch.setattr(encoder_mod, "SLAB_ROWS", 4)
    monkeypatch.setenv("SEMA_TPU_EMBED_SLAB", "on")
    texts = _texts(23)
    got = encoder.encode_texts(texts)
    monkeypatch.setenv("SEMA_TPU_EMBED_SLAB", "off")
    ref = encoder.encode_texts(texts)
    np.testing.assert_allclose(got, ref, atol=1e-6, rtol=1e-6)


def test_progress_monotonic_in_slab_mode(encoder, monkeypatch):
    monkeypatch.setattr(encoder_mod, "SLAB_ROWS", 16)
    monkeypatch.setenv("SEMA_TPU_EMBED_SLAB", "on")
    seen = []
    texts = _texts(30)
    encoder.encode_texts(texts, progress=lambda d, t: seen.append((d, t)))
    assert seen[-1] == (len(texts), len(texts))
    assert all(a[0] < b[0] for a, b in zip(seen, seen[1:]))

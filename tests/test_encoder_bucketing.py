"""Length-bucketed batching: order preservation and padding invariance."""

import numpy as np
import pytest

import jax

from sema_tpu.models import Encoder, get_spec
from sema_tpu.models.loader import random_params
from sema_tpu.parallel import make_mesh
from sema_tpu.tokenizer import HashTokenizer


@pytest.fixture(scope="module")
def encoder():
    spec = get_spec("test-tiny")
    return Encoder(spec, random_params(spec), HashTokenizer(spec.vocab_size),
                   batch_size=8)


def _texts():
    # mixed lengths spanning several buckets (test-tiny max_length=32)
    return (["hi"] * 3
            + ["a few more words here now"] * 4
            + ["word " * 20] * 5
            + ["longer " * 40] * 3
            + ["x"])


def test_bucketing_matches_unbucketed(encoder, monkeypatch):
    texts = _texts()
    bucketed = encoder.encode_texts(texts)
    monkeypatch.setenv("SEMA_TPU_BUCKETS", "off")
    flat = encoder.encode_texts(texts)
    # embeddings are padding-length invariant: masked attention zeroes
    # padded keys, masked pooling drops padded positions
    np.testing.assert_allclose(bucketed, flat, atol=1e-5, rtol=1e-5)
    assert bucketed.shape == (len(texts), encoder.spec.dim)


def test_order_preserved_under_bucketing(encoder):
    texts = _texts()
    batch = encoder.encode_texts(texts)
    for i in (0, 5, 9, 15):  # spot-check against single encodes
        single = encoder.encode_query(texts[i])
        cos = float(np.dot(batch[i], single))
        assert cos > 1 - 1e-5, (i, cos)


def test_progress_monotonic_and_complete(encoder):
    seen = []
    encoder.encode_texts(_texts(), progress=lambda d, t: seen.append((d, t)))
    assert seen[-1][0] == seen[-1][1] == len(_texts())
    assert all(a[0] < b[0] for a, b in zip(seen, seen[1:]))


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
def test_bucketing_on_mesh():
    spec = get_spec("test-tiny")
    mesh = make_mesh()
    enc = Encoder(spec, random_params(spec), HashTokenizer(spec.vocab_size),
                  batch_size=8, mesh=mesh, data_axis="index")
    texts = _texts()
    out = enc.encode_texts(texts)
    assert out.shape == (len(texts), spec.dim)
    single = Encoder(spec, random_params(spec),
                     HashTokenizer(spec.vocab_size), batch_size=8)
    ref = single.encode_texts(texts)
    np.testing.assert_allclose(out, ref, atol=1e-4, rtol=1e-4)

"""Semantic quality gate (sema_tpu/quality.py).

Two layers:

- the gate *machinery* is validated offline with synthetic encoders (a
  perfect one must PASS, a garbage one must FAIL, a random-weights one must
  SKIP) — so the harness itself can't rot on boxes without weights;
- the *real* gate runs automatically wherever real MiniLM weights resolve
  (tools/fetch_weights.py → --weights / HF cache), asserting rank-1
  retrieval for every canned paraphrase query, the capability the reference
  gets from its HF download (embeddings.rs:93-103).
"""

import hashlib
from types import SimpleNamespace

import numpy as np
import pytest

from sema_tpu.quality import CORPUS, QUERIES, QualityReport, run_quality_gate


class _FakeEncoder:
    """Encoder-shaped test double; subclasses define _vec(text)."""

    weights_source = "local"
    tokenizer_source = "local"

    def __init__(self, dim=32):
        self.spec = SimpleNamespace(name="test-tiny", dim=dim)

    def encode_texts(self, texts, progress=None):
        out = np.stack([self._vec(t) for t in texts])
        if progress:
            progress(len(texts), len(texts))
        return out

    def encode_query(self, text):
        return self._vec(text)


class PerfectEncoder(_FakeEncoder):
    """Maps each doc and its paraphrase query to the same basis vector."""

    def __init__(self):
        super().__init__(dim=max(32, len(CORPUS)))
        self._doc_axis = {name: i for i, name in enumerate(sorted(CORPUS))}
        self._query_axis = {q: self._doc_axis[doc] for q, doc in QUERIES}

    def _vec(self, text):
        v = np.zeros(self.spec.dim, np.float32)
        for name, content in CORPUS.items():
            if content == text or content.startswith(text[:40]):
                v[self._doc_axis[name]] = 1.0
                return v
        if text in self._query_axis:
            v[self._query_axis[text]] = 1.0
            return v
        v[-1] = 1.0
        return v


class GarbageEncoder(_FakeEncoder):
    """Deterministic but semantically meaningless (hash-seeded random)."""

    def _vec(self, text):
        seed = int.from_bytes(
            hashlib.sha256(text.encode()).digest()[:4], "big")
        v = np.random.default_rng(seed).standard_normal(self.spec.dim)
        return (v / np.linalg.norm(v)).astype(np.float32)


class RandomWeightsEncoder(_FakeEncoder):
    weights_source = "random"

    def _vec(self, text):
        return np.ones(self.spec.dim, np.float32)


def test_gate_passes_with_perfect_encoder():
    report = run_quality_gate(PerfectEncoder())
    assert report.ran
    assert report.correct_at_1 == report.total == len(QUERIES)
    assert report.passed
    assert report.fixture_checked is None  # no fixture for test-tiny


def test_gate_fails_with_garbage_encoder():
    """The gate must have teeth: meaningless embeddings cannot pass."""
    report = run_quality_gate(GarbageEncoder())
    assert report.ran
    assert not report.passed
    assert report.failures


def test_gate_skips_on_random_weights():
    report = run_quality_gate(RandomWeightsEncoder())
    assert not report.ran
    assert "random" in report.reason
    assert not report.passed


def test_corpus_queries_consistent():
    """Every query targets an existing doc; every doc fits in one chunk
    (< 1000 bytes, the chunk window) so retrieval is file-granular."""
    for q, doc in QUERIES:
        assert doc in CORPUS, doc
    for name, text in CORPUS.items():
        assert 50 <= len(text.encode()) < 1000, name
    assert len(QUERIES) >= 10


def _real_encoder_or_none():
    import os
    from sema_tpu.models import Encoder
    from sema_tpu.models.registry import get_spec
    from sema_tpu.models.loader import load_params

    weights = os.environ.get("SEMA_TPU_WEIGHTS", "")
    spec = get_spec(os.environ.get("SEMA_TPU_QUALITY_MODEL", "minilm-l6"))
    try:
        params, source = load_params(spec, weights)
    except FileNotFoundError:
        return None
    if source == "random":
        return None
    cfg = SimpleNamespace(name=spec.name, weights_path=weights,
                          dtype="float32", max_length=None, batch_size=32)
    return Encoder.from_config(cfg)


@pytest.mark.skipif(_real_encoder_or_none() is None,
                    reason="no real weights on this host (zero egress); "
                           "run tools/fetch_weights.py then re-run, or set "
                           "SEMA_TPU_WEIGHTS")
def test_real_weights_semantic_quality():
    """THE capability check: with real MiniLM weights, every paraphrase
    query must rank its document #1, and (if fixtures exist) our encoder
    must match the HF torch reference to cosine >= 0.999."""
    encoder = _real_encoder_or_none()
    report = run_quality_gate(encoder)
    assert report.ran
    assert report.failures == []
    assert report.correct_at_1 == report.total
    if report.fixture_min_cosine is not None:
        assert report.fixture_min_cosine >= 0.999
    assert report.passed

"""v3 positional postings: index-native phrase queries.

v3 segments store per-(term, doc) token positions (text_segment.py
sections 11-12, ≙ tantivy's positional postings / PhraseQuery); phrase
filtering answers from the index without reading content. v2 segments
(no positions) keep the content re-tokenize fallback. The differential
fuzz (test_text_index_fuzz) oracles phrases against content on every
run; these tests pin the structural properties: oracle equivalence of
the positional evaluator itself, the v2 fallback, mixed-version
indexes, and content never being read for rejected candidates.
"""

import json
import random
from pathlib import Path

import numpy as np
import pytest

from sema_tpu.index import text_segment
from sema_tpu.index.text_index import (TextIndex, _has_phrases,
                                       _phrase_rows_positional, tokenize)
from sema_tpu.index.text_segment import Segment, write_segment
from sema_tpu.types import Chunk

from tests.test_text_index_segments import backends


def chunk(i, content, path="f.txt"):
    return Chunk(id=f"{path}:{i}", file_path=Path(path),
                 start_line=1, end_line=1, content=content)


WORDS = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "alpha"]


def _random_docs(rng, n=60):
    return [" ".join(rng.choices(WORDS, k=rng.randint(1, 12)))
            for _ in range(n)]


def test_positional_evaluator_matches_content_oracle(tmp_path):
    rng = random.Random(7)
    docs = _random_docs(rng)
    seg_path = tmp_path / "t.seg"
    recs = [(f"d{i}", "f.txt", 1, 1, c) for i, c in enumerate(docs)]
    write_segment(seg_path, recs, [tokenize(c) for c in docs])
    seg = Segment(seg_path)
    assert seg.has_positions
    for _ in range(200):
        n_ph = rng.randint(1, 2)
        ptoks = [[rng.choice(WORDS) for _ in range(rng.randint(1, 3))]
                 for _ in range(n_ph)]
        got = set(_phrase_rows_positional(seg, ptoks).tolist())
        want = {i for i, c in enumerate(docs) if _has_phrases(c, ptoks)}
        assert got == want, (ptoks, got ^ want)


def _make_v2_index(tmp_path, docs):
    """Hand-build a legacy v2 index (positions absent) as an old build
    would have left it."""
    d = Path(tmp_path) / "text_index"
    (d / "segments").mkdir(parents=True)
    recs = [(f"f.txt:{i}", "f.txt", 1, 1, c) for i, c in enumerate(docs)]
    write_segment(d / "segments" / "g0000-000000.seg", recs,
                  [tokenize(c) for c in docs], version=2)
    (d / "manifest2.json").write_text(json.dumps(
        {"version": 2, "gen": 0, "segments": [{"name": "g0000-000000"}]}))


@pytest.mark.parametrize("backend", backends(), ids=[b[0] for b in backends()])
def test_v2_segments_fall_back_to_content_verify(tmp_path, backend):
    _, cls = backend
    docs = ["alpha beta gamma", "beta alpha gamma", "alpha beta beta",
            "gamma delta", "beta gamma alpha beta"]
    _make_v2_index(tmp_path, docs)
    idx = cls(tmp_path)
    assert not idx.segments[0].has_positions
    hits = idx.search('"alpha beta"', 10)
    assert sorted(c.content for c, _ in hits) == sorted(
        [docs[0], docs[2], docs[4]])
    idx.close()


@pytest.mark.parametrize("backend", backends(), ids=[b[0] for b in backends()])
def test_mixed_v2_v3_index(tmp_path, backend):
    _, cls = backend
    docs = ["alpha beta gamma", "beta alpha gamma"]
    _make_v2_index(tmp_path, docs)
    idx = cls(tmp_path)
    idx.index_chunks([chunk(2, "zeta alpha beta", path="g.txt"),
                      chunk(3, "beta zeta alpha", path="g.txt")])
    assert [s.has_positions for s in idx.segments] == [False, True]
    hits = idx.search('"alpha beta"', 10)
    assert sorted(c.content for c, _ in hits) == [
        "alpha beta gamma", "zeta alpha beta"]
    idx.close()


def test_content_not_read_for_rejected_candidates(tmp_path, monkeypatch):
    """The point of positions: a phrase query over a v3 index reads
    content ONLY for accepted hits."""
    idx = TextIndex(tmp_path)
    docs = (["alpha beta gamma"] * 2
            + ["beta alpha gamma"] * 40)     # 40 rejects outrank nothing
    idx.index_chunks([chunk(i, c) for i, c in enumerate(docs)])
    reads = []
    orig = Segment.content

    def counting(self, i):
        reads.append(i)
        return orig(self, i)

    monkeypatch.setattr(Segment, "content", counting)
    hits = idx.search('"alpha beta"', 10)
    assert len(hits) == 2
    assert len(reads) == 2          # one read per ACCEPTED hit only
    idx.close()


def test_phrase_positions_survive_merge(tmp_path):
    """Merges rewrite v2 (or fragmented v3) segments as fresh v3 —
    phrase queries stay index-native afterwards."""
    idx = TextIndex(tmp_path)
    idx.TARGET_DOCS = 8
    idx.MERGE_FANOUT = 2
    for b in range(4):
        idx.index_chunks([chunk(b * 2 + r,
                                "alpha beta" if (b + r) % 2 else "beta alpha",
                                path=f"p{b}.txt") for r in range(2)])
    assert all(s.has_positions for s in idx.segments)
    hits = idx.search('"alpha beta"', 20)
    assert all(c.content == "alpha beta" for c, _ in hits)
    assert len(hits) == 4
    idx.close()

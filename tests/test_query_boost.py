"""``^boost`` clause boosts — tantivy QueryParser grammar (``term^2``,
``"a b"^1.5``). Boosts multiply the clause's BM25 contribution; an
unboosted query's scores stay bit-identical (c * 1.0 == c). Parity
asserted across both engines on ids AND exact scores."""

from pathlib import Path

import pytest

from sema_tpu.index.text_index import TextIndex, _parse_query
from sema_tpu.types import Chunk


def chunk(i, content):
    return Chunk(id=f"d{i}", file_path=Path("f.txt"), start_line=1,
                 end_line=1, content=content)


DOCS = [
    "cat alone here",        # d0
    "dog alone there",       # d1
    "cat dog both",          # d2
    "cat cat repeated",      # d3
]


@pytest.fixture(params=["python", "native"])
def index(request, tmp_path):
    if request.param == "native":
        pytest.importorskip("sema_tpu.native")
        from sema_tpu.index.text_index import NativeTextIndex as Cls
    else:
        Cls = TextIndex
    ix = Cls(tmp_path / request.param)
    ix.index_chunks([chunk(i, c) for i, c in enumerate(DOCS)])
    yield ix
    ix.close()


def search(ix, q):
    return [(c.id, s) for c, s in ix.search(q, 10)]


# -- parsing -------------------------------------------------------------------

def test_parse_term_boost():
    q = _parse_query("cat^2 dog")
    assert list(zip(q.score_terms, q.score_boosts)) == [
        ("cat", 2.0), ("dog", 1.0)]


def test_parse_fractional_and_phrase_boost():
    q = _parse_query('cat^0.5 "a b"^1.5')
    assert dict(zip(q.score_terms, q.score_boosts)) == {
        "cat": 0.5, "a": 1.5, "b": 1.5}


def test_parse_malformed_boost_is_text():
    # ^x is not a boost: historical parse (tokens [cat, x]) preserved
    q = _parse_query("cat^x")
    assert q.score_terms == ["cat", "x"]
    assert q.score_boosts == [1.0, 1.0]
    # trailing dot without digits is not a boost either
    q = _parse_query("cat^2.")
    assert q.score_terms == ["cat", "2"]


def test_parse_boost_on_occur_clauses():
    q = _parse_query("+cat^2 -dog^3")
    assert list(zip(q.score_terms, q.score_boosts)) == [("cat", 2.0)]
    assert q.not_sets == [["dog"]]          # boost stripped, not scored


def test_parse_boost_on_path_clause_stripped():
    q = _parse_query("path:py^2 cat")
    assert [(list(t), p) for t, p in q.path_must] == [(["py"], False)]
    assert q.score_terms == ["cat"]


def test_parse_multi_token_clause_boost():
    q = _parse_query("foo_bar^2")
    assert list(zip(q.score_terms, q.score_boosts)) == [
        ("foo", 2.0), ("bar", 2.0)]


# -- scoring -------------------------------------------------------------------

def test_boost_scales_contribution(index):
    base = dict(search(index, "cat dog"))
    boosted = dict(search(index, "cat^3 dog"))
    # d1 has only dog: its score is unchanged
    assert boosted["d1"] == base["d1"]
    # d0/d3 have only cat: exactly 3x
    assert boosted["d0"] == pytest.approx(3 * base["d0"], rel=1e-12)
    assert boosted["d3"] == pytest.approx(3 * base["d3"], rel=1e-12)


def test_boost_changes_ranking(index):
    # cat downweighted: the dog-only doc outranks the cat-only docs
    r1 = [i for i, _ in search(index, "cat^0.1 dog")]
    assert r1.index("d1") < r1.index("d0")
    # cat upweighted: the cat-only doc outranks the dog-only doc
    r2 = [i for i, _ in search(index, "cat^9 dog")]
    assert r2.index("d0") < r2.index("d1")


def test_boost_one_is_bit_identical(index):
    assert search(index, "cat^1 dog") == search(index, "cat dog")


def test_phrase_boost(index):
    base = dict(search(index, '"cat dog" alone'))
    boosted = dict(search(index, '"cat dog"^2 alone'))
    # d2 matches the phrase: its phrase-token contributions double
    assert boosted["d2"] > base["d2"]


def test_engine_parity_exact_scores(tmp_path):
    pytest.importorskip("sema_tpu.native")
    from sema_tpu.index.text_index import NativeTextIndex
    queries = ["cat^2 dog", "cat^0.5 dog", 'cat "cat dog"^1.5',
               "+cat^2 -dog", "cat^3.25 dog^0.5", "cat^x dog"]
    res = {}
    for name, cls in (("py", TextIndex), ("nt", NativeTextIndex)):
        ix = cls(tmp_path / name)
        ix.index_chunks([chunk(i, c) for i, c in enumerate(DOCS)])
        res[name] = {q: [(c.id, s) for c, s in ix.search(q, 10)]
                     for q in queries}
        ix.close()
    for q in queries:
        assert res["py"][q] == res["nt"][q], q

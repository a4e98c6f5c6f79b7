"""Keyword query operators — the tantivy QueryParser subset (grammar
spec: text_index._Query): ``+must``, ``-must_not``, infix UPPERCASE
``AND``/``OR``, ``-"excluded phrase"``. The reference parses queries
with tantivy's QueryParser (src/storage/text_indexer.rs:81-83), whose
grammar includes these operators, so they are parity, not extension.
Both engines implement the same grammar; parity is asserted on ids AND
exact scores."""

import random
import string
from pathlib import Path

import pytest

from sema_tpu.index.text_index import TextIndex, _parse_query
from sema_tpu.types import Chunk

from tests.test_text_index_segments import backends  # noqa: F401


def chunk(i, content, path="f.txt"):
    return Chunk(id=f"d{i}", file_path=Path(path), start_line=1,
                 end_line=1, content=content)


DOCS = [
    "the cat sat on the mat",          # d0
    "cat and dog together",            # d1
    "dog only here",                   # d2
    "cat cat cat",                     # d3
    "exponential backoff retry",       # d4
    "backoff without retry",           # d5
    "foo_bar compound token",          # d6
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


def ids(ix, q):
    return [c.id for c, _ in ix.search(q, 10)]


def test_must_not_excludes(index):
    assert set(ids(index, "cat -dog")) == {"d0", "d3"}


def test_must_is_required_should_is_optional(index):
    # +cat dog: cat required; dog only boosts
    got = ids(index, "+cat dog")
    assert set(got) == {"d0", "d1", "d3"}
    assert got[0] == "d1"            # the doc with both ranks first


def test_and_equals_double_must(index):
    assert ids(index, "cat AND dog") == ids(index, "+cat +dog") == ["d1"]


def test_or_is_default(index):
    assert index.search("cat OR dog", 10) == index.search("cat dog", 10)


def test_pure_negative_matches_nothing(index):
    assert ids(index, "-cat") == []
    assert ids(index, '-"backoff retry"') == []


def test_excluded_phrase(index):
    got = ids(index, '-"backoff retry" backoff')
    assert got == ["d5"]             # d4 matches the phrase -> excluded


def test_multi_token_clause_occurs(index):
    # +foo_bar tokenizes to [foo, bar]: both required
    assert ids(index, "+foo_bar cat") [0] == "d6"
    assert set(ids(index, "+foo_bar cat")) == {"d6"}
    # -foo_bar: excluded only when ALL its tokens are present
    assert "d6" not in ids(index, "token -foo_bar")


def test_operators_inside_quotes_are_terms(index):
    # lowercase/quoted and is an ordinary term
    assert ids(index, '"cat and dog"') == ["d1"]
    assert "d1" in ids(index, "and")


def test_and_adjacent_to_phrase_is_sane(index):
    # the phrase is already a required filter; AND promotes the bare side
    got = ids(index, '"backoff retry" AND exponential')
    assert got == ["d4"]


def test_scores_match_across_engines(tmp_path):
    pytest.importorskip("sema_tpu.native")
    from sema_tpu.index.text_index import NativeTextIndex
    py = TextIndex(tmp_path / "p")
    nt = NativeTextIndex(tmp_path / "n")
    rng = random.Random(11)
    words = ["".join(rng.choices(string.ascii_lowercase, k=rng.randint(2, 6)))
             for _ in range(30)]
    docs = [" ".join(rng.choices(words, k=rng.randint(2, 20)))
            for _ in range(120)]
    cs = [chunk(i, c) for i, c in enumerate(docs)]
    py.index_chunks(cs)
    nt.index_chunks(cs)
    queries = []
    for _ in range(40):
        parts = []
        for _ in range(rng.randint(1, 4)):
            r = rng.random()
            w = rng.choice(words)
            if r < 0.2:
                parts.append("+" + w)
            elif r < 0.4:
                parts.append("-" + w)
            elif r < 0.5:
                parts.append(f'"{w} {rng.choice(words)}"')
            elif r < 0.6:
                parts.append(f'-"{w} {rng.choice(words)}"')
            elif r < 0.7:
                parts.append(f"{w} AND {rng.choice(words)}")
            else:
                parts.append(w)
        queries.append(" ".join(parts))
    from sema_tpu.index.text_index import _has_phrases, tokenize

    def oracle_match_set(q):
        """Brute-force qualifying set straight from the grammar spec."""
        pq = _parse_query(q)
        out = set()
        for i, doc in enumerate(docs):
            toks = set(tokenize(doc))
            if any(not set(ms) <= toks for ms in pq.must_sets):
                continue
            if any(set(ns) <= toks for ns in pq.not_sets):
                continue
            if pq.req_phrases and not _has_phrases(doc, pq.req_phrases):
                continue
            if any(_has_phrases(doc, [np]) for np in pq.not_phrases):
                continue
            if not toks & set(pq.score_terms):
                continue     # needs >=1 scoring term to be a candidate
            out.add(f"d{i}")
        return out

    for q in queries:
        hp = [(c.id, s) for c, s in py.search(q, 10)]
        hn = [(c.id, s) for c, s in nt.search(q, 10)]
        assert hp == hn, (q, hp, hn)
        # absolute semantics: unlimited search == brute-force oracle
        all_py = {c.id for c, _ in py.search(q, len(docs) + 1)}
        assert all_py == oracle_match_set(q), q
    py.close()
    nt.close()


def test_operators_on_v2_segments(tmp_path):
    """Phrase exclusion/requirement falls back to content checks on
    legacy v2 (position-free) segments; term operators use postings."""
    from tests.test_text_positions import _make_v2_index
    _make_v2_index(tmp_path, DOCS)
    for mk in _engines():
        ix = mk(tmp_path)
        assert not any(s.has_positions for s in ix.segments)
        assert ids(ix, '-"backoff retry" backoff') == ["f.txt:5"]
        assert ids(ix, "cat AND dog") == ["f.txt:1"]
        assert set(ids(ix, "cat -dog")) == {"f.txt:0", "f.txt:3"}
        ix.close()


def _engines():
    mks = [TextIndex]
    try:
        import sema_tpu.native  # noqa: F401
        from sema_tpu.index.text_index import NativeTextIndex
        mks.append(NativeTextIndex)
    except Exception:  # noqa: BLE001
        pass
    return mks


def test_parse_query_structure():
    q = _parse_query('foo +bar -baz "a b" -"c d" x AND y OR z')
    assert q.score_terms == ["foo", "bar", "x", "y", "z", "a", "b"]
    assert q.must_sets == [["bar"], ["x"], ["y"]]
    assert q.not_sets == [["baz"]]
    assert q.req_phrases == [["a", "b"]]
    assert q.not_phrases == [["c", "d"]]
    # operator-free queries keep the historical shape (bit-identical
    # scoring order: bare tokens then phrase tokens)
    q2 = _parse_query('alpha "p q" beta')
    assert q2.score_terms == ["alpha", "beta", "p", "q"]
    assert not q2.must_sets and not q2.not_sets
    q3 = _parse_query("-only")
    assert q3.score_terms == []


def test_unicode_whitespace_glues_clauses(index):
    """Clause boundaries are ASCII whitespace in BOTH engines (C++
    isspace); a NBSP glues its neighbors into one multi-token SHOULD
    clause, so 'cat<NBSP>AND dog' scores like 'cat and dog' — the AND
    is a term, not an operator (review finding: str.split()'s Unicode
    whitespace made the engines parse this differently)."""
    assert index.search("cat AND dog", 10) == \
        index.search("cat and dog", 10)


def test_ctrl_byte_does_not_break_and_promotion(index):
    """A literal \\x01 (the internal phrase-adjacency marker) in user
    input is sanitized, not mistaken for a required phrase."""
    assert index.search("cat AND \x01 dog", 10) == \
        index.search("cat AND dog", 10)


def test_parse_sanitizes_and_ascii_splits():
    q = _parse_query("cat AND dog")
    assert q.score_terms == ["cat", "and", "dog"]
    assert q.must_sets == []
    q2 = _parse_query("cat AND \x01 dog")
    assert q2.must_sets == [["cat"], ["dog"]]

"""``path:`` field queries — the one queryable non-default field.

The reference indexes ``path`` as TEXT|STORED (src/storage/
text_indexer.rs:32) and hands raw user queries to tantivy's
QueryParser (text_indexer.rs:81-83), which accepts explicitly
qualified fields outside the default field list — so ``path:term``
works in the reference. This engine pins path clauses to FILTER
semantics (never score, bare = MUST; boundary documented in the
_Query grammar spec). Parity asserted across both engines on ids AND
scores.
"""

from pathlib import Path

import pytest

from sema_tpu.index.text_index import TextIndex, _parse_query
from sema_tpu.types import Chunk


def chunk(i, content, path):
    return Chunk(id=f"d{i}", file_path=Path(path), start_line=1,
                 end_line=1, content=content)


DOCS = [
    ("error handling in alpha", "src/alpha_mod.py"),       # d0
    ("error test for alpha", "tests/test_alpha.py"),        # d1
    ("error in beta code", "lib/beta.rs"),                  # d2
    ("warning in gamma code alpha", "lib/gamma.rs"),        # d3
    ("second chunk of alpha module", "src/alpha_mod.py"),   # d4
]


@pytest.fixture(params=["python", "native"])
def index(request, tmp_path):
    if request.param == "native":
        pytest.importorskip("sema_tpu.native")
        from sema_tpu.index.text_index import NativeTextIndex as Cls
    else:
        Cls = TextIndex
    ix = Cls(tmp_path / request.param)
    ix.index_chunks([chunk(i, c, p) for i, (c, p) in enumerate(DOCS)])
    yield ix
    ix.close()


def ids(ix, q):
    return [c.id for c, _ in ix.search(q, 10)]


# -- parsing -------------------------------------------------------------------

def test_parse_path_clauses():
    q = _parse_query('error +path:py -path:tests path:"src alpha"')
    assert q.score_terms == ["error"]
    assert (["src", "alpha"], True) in [(list(t), p)
                                        for t, p in q.path_must]
    assert (["py"], False) in [(list(t), p) for t, p in q.path_must]
    assert [(list(t), p) for t, p in q.path_not] == [(["tests"], False)]


def test_parse_path_tokens_never_score():
    q = _parse_query("path:alpha error")
    assert q.score_terms == ["error"]          # path tokens don't score
    assert q.has_filters


def test_parse_empty_path_clause_dropped():
    q = _parse_query("error path:")
    assert q.score_terms == ["error"]
    assert not q.path_must and not q.path_not


def test_parse_field_name_case_sensitive():
    # tantivy field names are case-sensitive; PATH: is not a field and
    # tokenizes as plain terms
    q = _parse_query("PATH:alpha")
    assert q.score_terms == ["path", "alpha"]
    assert not q.path_must


# -- filtering -----------------------------------------------------------------

def test_bare_path_clause_requires(index):
    assert ids(index, "error path:py") == ["d0", "d1"]


def test_plus_path_same_as_bare(index):
    assert ids(index, "error +path:py") == ids(index, "error path:py")


def test_minus_path_excludes(index):
    assert ids(index, "error -path:tests") == ["d0", "d2"]


def test_path_phrase_consecutive_in_order(index):
    # src/alpha_mod.py tokenizes to [src, alpha, mod, py]
    assert set(ids(index, 'alpha path:"alpha mod"')) == {"d0", "d4"}
    # scattered (non-consecutive) tokens do not satisfy a path phrase
    assert ids(index, 'alpha path:"src py"') == []
    # containment (non-phrase) with the same tokens does match
    assert set(ids(index, "alpha path:src path:py")) == {"d0", "d4"}


def test_path_phrase_order_matters(index):
    assert ids(index, 'alpha path:"mod alpha"') == []


def test_multi_token_path_clause_is_containment(index):
    # path:alpha_mod tokenizes to [alpha, mod]: containment of both
    assert set(ids(index, "error path:alpha_mod")) == {"d0"}


def test_path_filter_composes_with_operators(index):
    assert ids(index, "error AND path:alpha") == ["d0", "d1"]
    assert ids(index, "+error -beta path:py") == ["d0", "d1"]


def test_path_filter_composes_with_content_phrase(index):
    assert ids(index, '"error handling" path:py') == ["d0"]
    assert ids(index, '"error handling" path:tests') == []


# -- filter-only queries -------------------------------------------------------

def test_filter_only_query_matches_with_zero_score(index):
    hits = index.search("path:rs", 10)
    assert [c.id for c, _ in hits] == ["d2", "d3"]
    assert all(s == 0.0 for _, s in hits)


def test_filter_only_respects_limit(index):
    assert len(index.search("path:py", 1)) == 1


def test_filter_only_with_exclusion(index):
    assert ids(index, "path:lib -path:beta") == ["d3"]


def test_pure_negative_path_matches_nothing(index):
    assert ids(index, "-path:beta") == []


def test_filter_only_intersection(index):
    assert ids(index, "+path:lib +path:rs") == ["d2", "d3"]
    assert ids(index, "+path:lib +path:py") == []


# -- interaction with deletes and engine parity --------------------------------

def test_path_filter_after_delete(index):
    index.remove_file_chunks(Path("src/alpha_mod.py"))
    assert ids(index, "error path:py") == ["d1"]
    assert ids(index, "path:alpha") == ["d1"]


def test_engine_parity_scores(tmp_path):
    pytest.importorskip("sema_tpu.native")
    from sema_tpu.index.text_index import NativeTextIndex
    queries = ["error path:py", "error -path:tests", "path:rs",
               'alpha path:"alpha mod"', "error AND path:alpha",
               "path:lib -path:beta", "+path:lib +path:rs"]
    res = {}
    for name, cls in (("py", TextIndex), ("nt", NativeTextIndex)):
        ix = cls(tmp_path / name)
        ix.index_chunks([chunk(i, c, p)
                         for i, (c, p) in enumerate(DOCS)])
        res[name] = {q: [(c.id, s) for c, s in ix.search(q, 10)]
                     for q in queries}
        ix.close()
    for q in queries:
        assert res["py"][q] == res["nt"][q], q


def test_tui_highlight_terms_exclude_path_tokens():
    # the TUI highlights q.score_terms; path tokens must not be in it
    q = _parse_query("error path:alpha -path:tests")
    assert q.score_terms == ["error"]

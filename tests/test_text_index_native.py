"""Native (C++) BM25 index vs the Python oracle: identical rankings,
scores, persistence, deletions. Skipped when the native lib isn't built."""

import random
import string
from pathlib import Path

import pytest

pytest.importorskip("sema_tpu.native")

from sema_tpu.index.text_index import (NativeTextIndex, TextIndex,  # noqa: E402
                                       make_text_index)
from sema_tpu.types import Chunk  # noqa: E402
from tests.test_text_index import chunk  # noqa: E402


def both(tmp_path):
    return (NativeTextIndex(tmp_path / "n"), TextIndex(tmp_path / "p"))


def assert_same_results(native, python, query, limit=10):
    a = native.search(query, limit)
    b = python.search(query, limit)
    assert [(r[0].id, r[0].content) for r in a] == \
        [(r[0].id, r[0].content) for r in b], query
    for (_, sa), (_, sb) in zip(a, b):
        assert sa == pytest.approx(sb, rel=1e-9), query


CORPUS = [
    "the cat sat on the mat",
    "cat cat cat everywhere cats",
    "dogs are great pets",
    "a cat and a dog",
    "foo_bar splits into two tokens",
    "Ünïcödé Löwercase ÉTUDE étude",
    "numbers 42 and 1337 matter",
    "x" * 41 + " dropped longtoken kept",
    "quick brown fox",
    "brown quick fox",
]


@pytest.fixture()
def indexes(tmp_path):
    n, p = both(tmp_path)
    chunks = [chunk(i, c) for i, c in enumerate(CORPUS)]
    n.index_chunks(chunks)
    p.index_chunks(chunks)
    return n, p


@pytest.mark.parametrize("query", [
    "cat", "cat dog", "étude", "ÉTUDE", "foo bar", "42",
    '"quick brown"', "nonexistentterm", "kept", "the",
])
def test_rankings_and_scores_match(indexes, query):
    n, p = indexes
    assert_same_results(n, p, query)


def test_phrase_substring_of_token_parity(tmp_path):
    """A phrase term must match whole tokens only, identically in both
    backends (advisor r1: separator conventions diverged — 'foo "bar"'
    matched 'foo barometer' in Python but not native)."""
    n, p = both(tmp_path)
    docs = ["foo barometer pressure", "foo bar baz", "barometer foo bar"]
    chunks = [chunk(i, c) for i, c in enumerate(docs)]
    n.index_chunks(chunks)
    p.index_chunks(chunks)
    for query in ['foo "bar"', '"bar"', '"foo bar"', '"barometer"',
                  '"ometer"', 'pressure "foo barometer"']:
        assert_same_results(n, p, query)
    # and the semantics are right, not merely consistent: "bar" must not
    # match inside "barometer"
    hits = p.search('"bar"', 10)
    assert {h[0].content for h in hits} == {docs[1], docs[2]}
    hits_n = n.search('"bar"', 10)
    assert {h[0].content for h in hits_n} == {docs[1], docs[2]}


def test_randomized_parity(tmp_path):
    rng = random.Random(7)
    vocab = ["".join(rng.choices(string.ascii_lowercase, k=rng.randint(2, 8)))
             for _ in range(40)]
    docs = [" ".join(rng.choices(vocab, k=rng.randint(3, 30)))
            for _ in range(60)]
    n, p = both(tmp_path)
    chunks = [chunk(i, d, path=f"f{i % 7}.txt") for i, d in enumerate(docs)]
    n.index_chunks(chunks)
    p.index_chunks(chunks)
    for _ in range(25):
        q = " ".join(rng.choices(vocab, k=rng.randint(1, 3)))
        assert_same_results(n, p, q, limit=20)


def test_deletion_parity(indexes, tmp_path):
    n, p = indexes
    assert n.remove_file_chunks(Path("f.txt")) == \
        p.remove_file_chunks(Path("f.txt"))
    # everything was under f.txt → both now empty
    assert n.num_live_docs == p.num_live_docs == 0
    assert n.search("cat", 10) == []


def test_deletion_recomputes_idf(tmp_path):
    n, p = both(tmp_path)
    chunks = [chunk(0, "shared words", path="a.txt"),
              chunk(0, "shared words again", path="b.txt"),
              chunk(0, "unrelated text", path="c.txt")]
    n.index_chunks(chunks)
    p.index_chunks(chunks)
    n.remove_file_chunks(Path("a.txt"))
    p.remove_file_chunks(Path("a.txt"))
    assert_same_results(n, p, "shared")


def test_native_persistence(tmp_path):
    n = NativeTextIndex(tmp_path)
    n.index_chunks([chunk(0, "durable content here")])
    n.remove_file_chunks(Path("nope.txt"))
    n.close()
    n2 = NativeTextIndex(tmp_path)
    assert n2.num_live_docs == 1
    res = n2.search("durable", 10)
    assert res[0][0].content == "durable content here"


def test_native_persistence_tombstones(tmp_path):
    n = NativeTextIndex(tmp_path)
    n.index_chunks([chunk(0, "alpha", path="a.txt"),
                    chunk(0, "beta", path="b.txt")])
    n.remove_file_chunks(Path("a.txt"))
    n.close()
    n2 = NativeTextIndex(tmp_path)
    assert n2.num_live_docs == 1
    assert n2.search("alpha", 10) == []
    assert len(n2.search("beta", 10)) == 1


def test_make_text_index_backend_selection(tmp_path, monkeypatch):
    assert isinstance(make_text_index(tmp_path / "a"), NativeTextIndex)
    monkeypatch.setenv("SEMA_TPU_TEXT_BACKEND", "python")
    assert isinstance(make_text_index(tmp_path / "b"), TextIndex)


def test_auto_opens_python_written_index(tmp_path):
    """The v2 on-disk format is engine-shared: an index written by the
    Python engine keeps answering when auto selects the native engine
    (no silent empty results, no backend pinning needed)."""
    p = TextIndex(tmp_path)
    p.index_chunks([chunk(0, "legacy data survives")])
    p.close()
    idx = make_text_index(tmp_path)
    assert len(idx.search("legacy", 10)) == 1
    # and the reverse: native-written, python-read
    n = NativeTextIndex(tmp_path / "n")
    n.index_chunks([chunk(0, "native written corpus")])
    n.close()
    p2 = TextIndex(tmp_path / "n")
    assert len(p2.search("corpus", 10)) == 1


def test_whitespace_only_phrase_parity(tmp_path):
    """Review finding: a quoted phrase that tokenizes to nothing (e.g.
    '" "') must constrain neither backend — previously the Python oracle
    rejected every doc while the native backend accepted every doc."""
    from sema_tpu.index.text_index import TextIndex, NativeTextIndex
    from sema_tpu.types import Chunk
    from pathlib import Path as P

    docs = [Chunk(id=f"f:{i}", file_path=P("f.txt"), start_line=1,
                  end_line=1, content=c)
            for i, c in enumerate(["foo barometer", "foo bar", "baz"])]
    py = TextIndex(tmp_path / "py")
    nt = NativeTextIndex(tmp_path / "nt")
    for ix in (py, nt):
        ix.index_chunks(docs)
    for q in ('foo " "', 'foo "."', 'foo "bar"', '" " foo'):
        hp = [(c.id, round(s, 5)) for c, s in py.search(q, 10)]
        hn = [(c.id, round(s, 5)) for c, s in nt.search(q, 10)]
        assert hp == hn, (q, hp, hn)
    # the no-token phrase must not reject docs: plain foo hits survive
    assert {c.id for c, _ in py.search('foo " "', 10)} == {"f:0", "f:1"}


def test_threaded_build_byte_identical(tmp_path, monkeypatch):
    """The sharded tokenize+postings build (SEMA_TPU_BUILD_THREADS)
    must produce a byte-identical segment file at ANY thread count:
    doc ids are global and shards stitch in doc order, so the on-disk
    postings/positions/meta are invariant. (This box has one core —
    the speedup is for multi-core hosts; parity is what is pinned.)"""
    from sema_tpu.native import bindings

    rng = random.Random(7)
    words = ["".join(rng.choices(string.ascii_lowercase, k=rng.randint(1, 8)))
             for _ in range(200)]
    docs = []
    for i in range(137):   # odd count: uneven shard boundaries
        body = " ".join(rng.choices(words, k=rng.randint(0, 60)))
        docs.append((f"f{i % 5}.txt:{i}", f"f{i % 5}.txt", i, i + 1, body))

    outs = {}
    for t in ("1", "4", "13"):
        monkeypatch.setenv("SEMA_TPU_BUILD_THREADS", t)
        p = tmp_path / f"seg-t{t}.bin"
        bindings.tseg_build(docs, str(p))
        outs[t] = p.read_bytes()
    assert outs["1"] == outs["4"] == outs["13"]
    assert len(outs["1"]) > 0


def test_threaded_build_more_threads_than_docs(tmp_path, monkeypatch):
    """Thread count above the doc count must clamp, not crash or skew."""
    from sema_tpu.native import bindings

    docs = [("a.txt:0", "a.txt", 1, 2, "tiny corpus of words"),
            ("a.txt:1", "a.txt", 2, 3, "more words here")]
    monkeypatch.setenv("SEMA_TPU_BUILD_THREADS", "64")
    p1 = tmp_path / "many.bin"
    bindings.tseg_build(docs, str(p1))
    monkeypatch.setenv("SEMA_TPU_BUILD_THREADS", "1")
    p2 = tmp_path / "one.bin"
    bindings.tseg_build(docs, str(p2))
    assert p1.read_bytes() == p2.read_bytes()


# -- round-3 review-fix parity regressions -----------------------------------

def _index_both(tmp_path, contents):
    n, p = both(tmp_path)
    cs = [chunk(i, c, path=f"f{i}.txt") for i, c in enumerate(contents)]
    n.index_chunks(cs)
    p.index_chunks(cs)
    return n, p


def test_emoji_and_nonbmp_tokenization_parity(tmp_path):
    """Emoji are separators (not word chars) in BOTH engines; non-BMP
    LETTERS (Deseret, incl. its case mapping) are word chars in both —
    the C++ table accepted every non-BMP codepoint (review finding, r3)."""
    deseret_upper = "\U00010400word"        # uppercase Deseret letter
    contents = ["deploy\U0001F680done rocket",
                deseret_upper,
                "\U00010428word lowercase"]  # its lowercase
    n, p = _index_both(tmp_path, contents)
    for q in ("done", "deploy", "\U00010428word"):
        assert_same_results(n, p, q)
    # emoji split the run: both engines must find the halves
    assert [r[0].id for r in n.search("done", 5)] == ["f0.txt:0"]
    # case-folded non-BMP: the upper-case doc matches the lower query
    ids = {r[0].id for r in n.search("\U00010428word", 5)}
    assert ids == {"f1.txt:1", "f2.txt:2"}


def test_expanding_lowercase_parity(tmp_path):
    """'İ' (whose full lowercase expands to 2 chars) keeps its
    codepoint under the SIMPLE per-cp lowercase both engines now
    implement — a cross-engine open must match terms identically."""
    n, p = _index_both(tmp_path, ["İstanbul guide", "istanbul plain"])
    assert_same_results(n, p, "İstanbul")
    assert_same_results(n, p, "istanbul")
    # the İ doc is NOT folded into plain istanbul (simple lowercase)
    assert [r[0].id for r in p.search("istanbul", 5)] == ["f1.txt:1"]
    assert [r[0].id for r in p.search("İstanbul", 5)] == ["f0.txt:0"]


def test_filepath_prefix_is_not_a_path_clause(tmp_path):
    """`filepath:"..."` must tokenize as plain terms, not become an
    impossible path filter (review finding, r3)."""
    n, p = _index_both(tmp_path, ["server api docs", "other content"])
    for eng in (n, p):
        res = eng.search('filepath:"server api"', 5)
        assert [r[0].id for r in res] == ["f0.txt:0"]
    assert_same_results(n, p, 'filepath:"server api"')
    # the real field still filters
    for eng in (n, p):
        assert eng.search('path:"f0" server', 5)[0][0].id == "f0.txt:0"


def test_huge_boost_does_not_abort(tmp_path):
    """A ~400-digit ^boost overflowed std::stod -> SIGABRT in the
    native engine (serve DoS); both engines now saturate to inf."""
    n, p = _index_both(tmp_path, ["term alpha", "other beta"])
    q = "term^" + "9" * 400
    ra = n.search(q, 5)
    rb = p.search(q, 5)
    assert [r[0].id for r in ra] == [r[0].id for r in rb] == ["f0.txt:0"]


def test_zero_boost_consistent(tmp_path):
    """term^0 zeroes every contribution; both engines drop zero-score
    docs on BOTH accumulator paths (the dense/sparse switch was
    observable; review finding, r3)."""
    n, p = _index_both(tmp_path, ["alpha beta", "beta gamma"])
    for eng in (n, p):
        assert eng.search("alpha^0", 5) == []
    assert_same_results(n, p, "alpha^0 beta")


def test_limit_zero_and_nul_query(tmp_path):
    n, p = _index_both(tmp_path, ["alpha beta", "beta gamma"])
    for eng in (n, p):
        assert eng.search("alpha", 0) == []
        # NUL is a token separator in both engines (C ABI would
        # truncate otherwise)
        assert [r[0].id for r in eng.search("alpha\x00beta", 5)] == \
            [r[0].id for r in eng.search("alpha beta", 5)]
    assert_same_results(n, p, "alpha\x00gamma")


def test_unicode_digit_boost_parity(tmp_path):
    """`term^٢` (Arabic-Indic digit): \\d parsed it as boost 2.0 in
    Python while C++ tokenized it as two terms — both engines now treat
    it as plain terms (review finding, r3)."""
    n, p = _index_both(tmp_path, ["term alpha", "term ٢ beta"])
    assert_same_results(n, p, "term^٢")
    # the Arabic digit is a scoring term, so the doc containing it wins
    assert p.search("term^٢", 5)[0][0].id == "f1.txt:1"

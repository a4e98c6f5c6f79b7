"""BM25 text index (≙ tantivy usage in text_indexer.rs)."""

import math
from pathlib import Path

import pytest

from sema_tpu.index.text_index import TextIndex, tokenize
from sema_tpu.types import Chunk


def chunk(i, content, path="f.txt"):
    return Chunk(id=f"{path}:{i}", file_path=Path(path),
                 start_line=1, end_line=1, content=content)


@pytest.fixture()
def idx(tmp_path):
    return TextIndex(tmp_path)


def test_tokenize_matches_tantivy_default():
    assert tokenize("Hello, World!") == ["hello", "world"]
    assert tokenize("foo_bar baz-qux") == ["foo", "bar", "baz", "qux"]
    assert tokenize("x" * 41) == []          # RemoveLongFilter(40)
    assert tokenize("CamelCase123") == ["camelcase123"]


def test_empty_query_no_results(idx):
    idx.index_chunks([chunk(0, "hello world")])
    assert idx.search("", 10) == []          # text_indexer.rs:76-78
    assert idx.search("   ", 10) == []


def test_bm25_ranking_and_scores(idx):
    idx.index_chunks([
        chunk(0, "the cat sat on the mat"),
        chunk(1, "cat cat cat everywhere cats"),
        chunk(2, "dogs are great pets"),
        chunk(3, "a cat and a dog"),
    ])
    results = idx.search("cat", 10)
    assert [r[0].id for r in results[:1]] == ["f.txt:1"]  # highest tf
    assert all(r[1] > 0 for r in results)                 # real scores kept
    assert len(results) == 3                              # doc 2 has no 'cat'
    # descending scores
    scores = [r[1] for r in results]
    assert scores == sorted(scores, reverse=True)


def test_or_semantics(idx):
    idx.index_chunks([
        chunk(0, "alpha beta"),
        chunk(1, "alpha only here"),
        chunk(2, "beta only here"),
        chunk(3, "gamma delta"),
    ])
    results = idx.search("alpha beta", 10)
    got = {r[0].id for r in results}
    assert got == {"f.txt:0", "f.txt:1", "f.txt:2"}
    # doc matching both terms ranks first
    assert results[0][0].id == "f.txt:0"


def test_phrase_query(idx):
    idx.index_chunks([
        chunk(0, "quick brown fox"),
        chunk(1, "brown quick fox"),
    ])
    results = idx.search('"quick brown"', 10)
    assert [r[0].id for r in results] == ["f.txt:0"]


def test_limit(idx):
    idx.index_chunks([chunk(i, f"common term doc{i}") for i in range(20)])
    assert len(idx.search("common", 5)) == 5


def test_persistence_roundtrip(tmp_path):
    idx = TextIndex(tmp_path)
    idx.index_chunks([chunk(0, "persistent data here")])
    idx.close()
    idx2 = TextIndex(tmp_path)
    results = idx2.search("persistent", 10)
    assert len(results) == 1
    assert results[0][0].content == "persistent data here"


def test_remove_file_chunks(tmp_path):
    idx = TextIndex(tmp_path)
    idx.index_chunks([
        chunk(0, "shared words", path="a.txt"),
        chunk(0, "shared words", path="b.txt"),
    ])
    assert idx.remove_file_chunks(Path("a.txt")) == 1
    results = idx.search("shared", 10)
    assert [str(r[0].file_path) for r in results] == ["b.txt"]
    # df/idf recomputed over live docs only
    assert idx.num_live_docs == 1


def test_bm25_idf_formula(idx):
    # one term in 1 of 2 docs: idf = ln(1 + (2-1+0.5)/(1+0.5)) = ln(2)
    idx.index_chunks([chunk(0, "rare"), chunk(1, "other")])
    results = idx.search("rare", 10)
    dl = 1
    avg = 1.0
    tf = 1
    expected = math.log(2.0) * tf * (1.2 + 1) / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avg))
    assert results[0][1] == pytest.approx(expected)


def test_concurrent_index_and_search(tmp_path):
    """The serve daemon re-indexes from a background thread while HTTP
    threads run keyword searches; the coarse per-index lock must keep
    that race-free (previously the postings dicts mutated under a
    concurrent reader)."""
    import threading
    from sema_tpu.types import Chunk
    from pathlib import Path as P

    idx = TextIndex(tmp_path)
    idx.index_chunks([Chunk(id=f"s:{i}", file_path=P("seed.txt"),
                            start_line=1, end_line=1,
                            content=f"shared seed token{i}")
                      for i in range(50)])
    stop = threading.Event()
    errors = []

    def writer():
        g = 0
        while not stop.is_set():
            g += 1
            try:
                idx.index_chunks([
                    Chunk(id=f"w{g}:{i}", file_path=P(f"w{g}.txt"),
                          start_line=1, end_line=1,
                          content=f"shared write{g} token{i}")
                    for i in range(20)])
                if g % 3 == 0:
                    idx.remove_file_chunks(P(f"w{g - 1}.txt"))
                idx.commit()
            except Exception as e:  # noqa: BLE001
                errors.append(e)
                return

    def reader():
        while not stop.is_set():
            try:
                idx.search("shared", 10)
                idx.search("'shared token3", 10)
            except Exception as e:  # noqa: BLE001
                errors.append(e)
                return

    threads = [threading.Thread(target=writer)] + \
        [threading.Thread(target=reader) for _ in range(3)]
    for t in threads:
        t.start()
    import time
    time.sleep(1.5)
    stop.set()
    for t in threads:
        t.join(timeout=10)
    assert not errors, errors
    assert len(idx.search("shared", 5)) == 5

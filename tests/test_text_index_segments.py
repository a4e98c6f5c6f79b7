"""Segmented text-index persistence (VERDICT r1 weak #4): per-batch
commits append one immutable segment (O(batch), never an index rewrite),
tombstones ride the manifest, the index compacts past 25% dead, and
round-1 single-file indexes migrate on first open. Runs against both the
Python oracle and (when built) the C++ backend."""

import json
from pathlib import Path

import pytest

from sema_tpu.index.text_index import TextIndex, make_text_index
from sema_tpu.types import Chunk


def chunk(i, content, path="f.txt"):
    return Chunk(id=f"{path}:{i}", file_path=Path(path),
                 start_line=1, end_line=1, content=content)


def backends():
    out = [("python", TextIndex)]
    try:
        from sema_tpu.index.text_index import NativeTextIndex
        import sema_tpu.native  # noqa: F401 — probe
        out.append(("native", NativeTextIndex))
    except ImportError:
        pass
    return out


@pytest.fixture(params=[b for b in backends()], ids=[b[0] for b in backends()])
def backend(request):
    return request.param


def seg_files(tmp_path):
    return sorted((Path(tmp_path) / "text_index" / "segments").iterdir())


def test_commit_appends_segments_without_rewrite(tmp_path, backend):
    _, cls = backend
    idx = cls(tmp_path)
    idx.index_chunks([chunk(0, "alpha beta gamma"),
                      chunk(1, "beta gamma delta")])
    first = seg_files(tmp_path)
    assert len(first) == 1
    first_bytes = first[0].read_bytes()

    idx.index_chunks([chunk(2, "gamma delta epsilon", path="g.txt")])
    second = seg_files(tmp_path)
    assert len(second) == 2                       # appended, not rewritten
    assert first[0].read_bytes() == first_bytes   # old segment untouched

    idx.index_chunks([chunk(3, "zeta eta", path="h.txt")])
    assert len(seg_files(tmp_path)) == 3


def test_reopen_after_batches_and_deletes(tmp_path, backend):
    _, cls = backend
    idx = cls(tmp_path)
    idx.index_chunks([chunk(0, "the quick brown fox", path="a.txt"),
                      chunk(1, "jumps over the lazy dog", path="a.txt")])
    idx.index_chunks([chunk(2, "pack my box with jugs", path="b.txt"),
                      chunk(3, "quick silver lining", path="c.txt")])
    assert idx.remove_file_chunks(Path("a.txt")) == 2
    idx.close()

    idx2 = cls(tmp_path)
    assert idx2.num_live_docs == 2
    hits = idx2.search("quick", 10)
    assert [str(c.file_path) for c, _ in hits] == ["c.txt"]
    # scores unchanged across reopen
    assert idx2.search("box", 10)[0][1] == pytest.approx(
        idx.search("box", 10)[0][1])


def test_tombstone_only_commit_rewrites_manifest_not_segments(tmp_path,
                                                              backend):
    name, cls = backend
    idx = cls(tmp_path)
    idx.index_chunks([chunk(0, "one two", path="a.txt"),
                      chunk(1, "three four", path="b.txt"),
                      chunk(2, "five six", path="b.txt"),
                      chunk(3, "seven eight", path="c.txt")])
    before = {p: p.read_bytes() for p in seg_files(tmp_path)}
    idx.remove_file_chunks(Path("a.txt"))   # 25% dead — below threshold
    idx.commit()
    assert {p: p.read_bytes() for p in seg_files(tmp_path)} == before
    manifest = "manifest.native.json" if name == "native" else \
        "manifest.json"
    m = json.loads((Path(tmp_path) / "text_index" / manifest).read_text())
    assert m["deleted"] == [0]


def test_compaction_past_dead_fraction(tmp_path, backend):
    _, cls = backend
    idx = cls(tmp_path)
    idx.index_chunks([chunk(i, f"common word{i}", path="dead.txt")
                      for i in range(8)])
    idx.index_chunks([chunk(8, "common survivor", path="live.txt")])
    idx.remove_file_chunks(Path("dead.txt"))   # ~89% dead
    idx.close()

    idx2 = cls(tmp_path)                       # compacts on load
    assert idx2.num_live_docs == 1
    assert len(seg_files(tmp_path)) == 1
    hits = idx2.search("survivor", 10)
    assert len(hits) == 1 and str(hits[0][0].file_path) == "live.txt"
    # post-compaction appends still work and reload
    idx2.index_chunks([chunk(9, "fresh common doc", path="new.txt")])
    idx2.close()
    idx3 = cls(tmp_path)
    assert idx3.num_live_docs == 2
    assert len(idx3.search("common", 10)) == 2


def test_legacy_python_index_migrates(tmp_path):
    tdir = Path(tmp_path) / "text_index"
    tdir.mkdir(parents=True)
    # round-1 single-file layout, including a tombstone (None doc)
    (tdir / "index.json").write_text(json.dumps({
        "docs": [
            {"id": "a.txt:0", "file_path": "a.txt", "start_line": 1,
             "end_line": 1, "content": "hello world"},
            None,
            {"id": "b.txt:0", "file_path": "b.txt", "start_line": 1,
             "end_line": 1, "content": "goodbye world"},
        ],
        "doc_len": [2, 2, 2],
        "postings": {"hello": {"0": 1}, "world": {"0": 1, "1": 1, "2": 1},
                     "gone": {"1": 1}, "goodbye": {"2": 1}},
    }))
    idx = TextIndex(tmp_path)
    assert not (tdir / "index.json").exists()   # migrated away
    assert (tdir / "manifest.json").exists()
    assert idx.num_live_docs == 2
    assert len(idx.search("world", 10)) == 2
    idx.close()
    idx2 = TextIndex(tmp_path)
    assert idx2.num_live_docs == 2
    assert idx2.search("hello", 10)[0][0].id == "a.txt:0"


def test_legacy_native_index_migrates(tmp_path):
    pytest.importorskip("sema_tpu.native", exc_type=ImportError)
    from sema_tpu.native.bindings import NativeTextIndexHandle
    from sema_tpu.index.text_index import NativeTextIndex
    tdir = Path(tmp_path) / "text_index"
    tdir.mkdir(parents=True)
    h = NativeTextIndexHandle()
    h.add([("a.txt:0", "a.txt", 1, 1, "hello world"),
           ("b.txt:0", "b.txt", 1, 1, "goodbye world")])
    h.remove_file("b.txt")
    h.save(str(tdir / "index.native.bin"))
    del h

    idx = NativeTextIndex(tmp_path)
    assert not (tdir / "index.native.bin").exists()
    assert (tdir / "manifest.native.json").exists()
    assert idx.num_live_docs == 1
    assert idx.search("hello", 10)[0][0].id == "a.txt:0"
    assert idx.search("goodbye", 10) == []
    idx.close()
    assert NativeTextIndex(tmp_path).num_live_docs == 1


def test_segmented_parity_python_vs_native_across_reopen(tmp_path):
    pytest.importorskip("sema_tpu.native", exc_type=ImportError)
    from sema_tpu.index.text_index import NativeTextIndex
    docs1 = [chunk(0, "the cat sat on the mat", path="a.txt"),
             chunk(1, "cat cat cat everywhere", path="a.txt")]
    docs2 = [chunk(2, "dogs are great pets", path="b.txt"),
             chunk(3, "a cat and a dog together", path="c.txt")]
    py = TextIndex(tmp_path / "py")
    nt = NativeTextIndex(tmp_path / "nt")
    for idx in (py, nt):
        idx.index_chunks(docs1)
        idx.index_chunks(docs2)
        idx.remove_file_chunks(Path("a.txt"))
        idx.close()
    py2 = TextIndex(tmp_path / "py")
    nt2 = NativeTextIndex(tmp_path / "nt")
    for q in ("cat", "dog pets", 'cat "a dog"'):
        a = [(c.id, round(s, 6)) for c, s in py2.search(q, 10)]
        b = [(c.id, round(s, 6)) for c, s in nt2.search(q, 10)]
        assert a == b, q


def test_auto_backend_pins_segmented_python_index(tmp_path, monkeypatch):
    monkeypatch.delenv("SEMA_TPU_TEXT_BACKEND", raising=False)
    idx = TextIndex(tmp_path)
    idx.index_chunks([chunk(0, "pinned to python")])
    idx.close()
    again = make_text_index(tmp_path, backend="auto")
    assert isinstance(again, TextIndex)
    assert again.num_live_docs == 1


def test_compaction_never_overwrites_committed_segment(tmp_path, backend):
    """Crash-atomicity (review finding): the compacted segment must be
    written under a name ABSENT from the pre-compaction manifest — a
    crash between the segment write and the manifest write must leave
    the old manifest pointing only at untouched files."""
    _, cls = backend
    idx = cls(tmp_path)
    idx.index_chunks([chunk(i, f"alpha beta{i}", path="dead.txt")
                      for i in range(8)])
    idx.index_chunks([chunk(8, "alpha survivor", path="live.txt")])
    idx.close()
    manifest = cls(tmp_path)._manifest_path
    old_names = {s["name"] for s in
                 json.loads(manifest.read_text())["segments"]}

    idx2 = cls(tmp_path)
    idx2.remove_file_chunks(Path("dead.txt"))
    # trigger compaction (reopen path)
    idx2.close()
    idx3 = cls(tmp_path)
    new_segs = json.loads(manifest.read_text())["segments"]
    # compacted segment uses a FRESH name
    assert all(s["name"] not in old_names for s in new_segs), (
        old_names, new_segs)
    assert idx3.num_live_docs == 1
    # a second compaction cycle keeps alternating fresh names
    idx3.index_chunks([chunk(9 + i, f"alpha extra{i}", path="d2.txt")
                       for i in range(8)])
    idx3.remove_file_chunks(Path("d2.txt"))
    idx3.close()
    prev = {s["name"] for s in new_segs}
    idx4 = cls(tmp_path)
    final = json.loads(manifest.read_text())["segments"]
    assert all(s["name"] not in prev for s in final)
    assert idx4.num_live_docs == 1

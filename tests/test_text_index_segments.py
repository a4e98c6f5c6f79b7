"""Segmented text-index persistence (v2 disk-resident format): per-batch
commits append one immutable binary segment (O(batch), never an index
rewrite), tombstones live in per-segment .del bitmap sidecars, the index
compacts past 25% dead under fresh names, and round-1/2 layouts migrate
on first open. Runs against both the numpy and (when built) C++ engine."""

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


def test_tombstone_only_commit_touches_del_sidecar_only(tmp_path, backend):
    """v2: a delete rewrites only the tiny .del bitmap sidecar — the
    immutable .seg files AND the manifest stay byte-identical."""
    _, cls = backend
    idx = cls(tmp_path)
    idx.index_chunks([chunk(0, "one two", path="a.txt"),
                      chunk(1, "three four", path="b.txt"),
                      chunk(2, "five six", path="b.txt"),
                      chunk(3, "seven eight", path="c.txt")])
    segs_before = {p: p.read_bytes() for p in seg_files(tmp_path)
                   if p.suffix == ".seg"}
    manifest = Path(tmp_path) / "text_index" / "manifest2.json"
    manifest_before = manifest.read_bytes()
    idx.remove_file_chunks(Path("a.txt"))   # 25% dead — below threshold
    idx.commit()
    assert {p: p.read_bytes() for p in seg_files(tmp_path)
            if p.suffix == ".seg"} == segs_before
    assert manifest.read_bytes() == manifest_before
    dels = [p for p in seg_files(tmp_path) if p.suffix == ".del"]
    assert len(dels) == 1
    assert idx.num_live_docs == 3
    # the tombstone is durable without any manifest involvement
    idx.close()
    assert cls(tmp_path).num_live_docs == 3


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


def test_merge_ladder_and_engine_parity_at_scale(tmp_path):
    """Many small commits trigger the log-tiered merges; the merged
    state answers identically across engines, deletes stay O(file) via
    the file-run tables, and the segment count stays ~logarithmic."""
    import sema_tpu.index.text_index as ti
    engines = [ti.TextIndex(tmp_path / "py")]
    try:
        import sema_tpu.native  # noqa: F401 — probe
        engines.append(ti.NativeTextIndex(tmp_path / "nt"))
    except ImportError:
        pass
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta",
             "theta", "kappa"]
    n_batches, per = 40, 5
    for b in range(n_batches):
        batch = [chunk(i, f"{words[(b + i) % 8]} {words[(b * i) % 8]} "
                       f"tag{b} row{i}", path=f"f{b}.txt")
                 for i in range(per)]
        for e in engines:
            e.index_chunks(batch)
    for e in engines:
        # 40 commits collapsed into far fewer segments (fanout 8)
        assert len(e.segments) < 14
        assert e.num_live_docs == n_batches * per
        assert e.remove_file_chunks(Path("f7.txt")) == per
        assert e.num_live_docs == n_batches * per - per
    if len(engines) == 2:
        for q in ("alpha", "beta gamma", "tag3", '"alpha beta"', "row4"):
            a = [(c.id, s) for c, s in engines[0].search(q, 20)]
            b = [(c.id, s) for c, s in engines[1].search(q, 20)]
            assert a == b, q
    # reopen → identical again
    for e in engines:
        e.close()
    r1 = ti.TextIndex(tmp_path / "py")
    assert r1.num_live_docs == n_batches * per - per
    assert not any(str(c.file_path) == "f7.txt"
                   for c, _ in r1.search("tag7", 50))


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
    assert (tdir / "manifest2.json").exists()
    assert idx.num_live_docs == 2
    assert len(idx.search("world", 10)) == 2
    idx.close()
    idx2 = TextIndex(tmp_path)
    assert idx2.num_live_docs == 2
    assert idx2.search("hello", 10)[0][0].id == "a.txt:0"


def _v1_native_doc(doc_id, path, start, end, content, alive=True):
    import struct

    def s(x):
        b = x.encode()
        return struct.pack("<I", len(b)) + b
    return (struct.pack("<B", int(alive)) + s(doc_id) + s(path)
            + struct.pack("<QQ", start, end) + s(content)
            + struct.pack("<I", len(content.split())))


def test_legacy_native_index_migrates(tmp_path):
    """Round-1/2 native binary snapshots migrate without the native lib
    (the v1 reader is pure Python)."""
    import struct
    from sema_tpu.index.text_index import NativeTextIndex
    tdir = Path(tmp_path) / "text_index"
    tdir.mkdir(parents=True)
    # v1 full-snapshot layout ("SEMT"): docs then postings (the migrator
    # re-tokenizes, so an empty postings table is a valid tail)
    blob = (struct.pack("<IIQ", 0x53454D54, 1, 2)
            + _v1_native_doc("a.txt:0", "a.txt", 1, 1, "hello world")
            + _v1_native_doc("b.txt:0", "b.txt", 1, 1, "goodbye world",
                             alive=False)
            + struct.pack("<Q", 0))
    (tdir / "index.native.bin").write_bytes(blob)

    pytest.importorskip("sema_tpu.native", exc_type=ImportError)
    idx = NativeTextIndex(tmp_path)
    assert not (tdir / "index.native.bin").exists()
    assert (tdir / "manifest2.json").exists()
    assert idx.num_live_docs == 1
    assert idx.search("hello", 10)[0][0].id == "a.txt:0"
    assert idx.search("goodbye", 10) == []
    idx.close()
    assert NativeTextIndex(tmp_path).num_live_docs == 1
    # the same legacy layout also migrates under the PYTHON engine
    (tdir.parent / "py").mkdir()
    tdir2 = tdir.parent / "py" / "text_index"
    tdir2.mkdir(parents=True)
    (tdir2 / "index.native.bin").write_bytes(blob)
    assert TextIndex(tdir.parent / "py").num_live_docs == 1


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


def test_auto_backend_opens_any_v2_index(tmp_path, monkeypatch):
    """The engines share the v2 format, so auto selection never strands
    an existing index (pinning, needed for the round-2 split formats, is
    gone)."""
    monkeypatch.delenv("SEMA_TPU_TEXT_BACKEND", raising=False)
    idx = TextIndex(tmp_path)
    idx.index_chunks([chunk(0, "engine shared format")])
    idx.close()
    again = make_text_index(tmp_path, backend="auto")
    assert again.num_live_docs == 1
    assert len(again.search("shared", 10)) == 1


def test_compaction_never_overwrites_committed_segment(tmp_path, backend):
    """Crash-atomicity: compaction rewrites tombstoned segments under
    FRESH (new-generation) names and leaves untombstoned segments'
    files byte-identical — a crash between the segment writes and the
    manifest swap must leave the old manifest pointing only at
    untouched files."""
    _, cls = backend
    idx = cls(tmp_path)
    # the tombstoned segment keeps one live doc so compaction must
    # REWRITE it (all-dead segments are simply dropped)
    idx.index_chunks([chunk(i, f"alpha beta{i}", path="dead.txt")
                      for i in range(8)]
                     + [chunk(8, "alpha keeper", path="keep.txt")])
    idx.index_chunks([chunk(9, "alpha survivor", path="live.txt")])
    idx.close()
    manifest = cls(tmp_path)._manifest_path
    old = json.loads(manifest.read_text())
    old_names = {s["name"] for s in old["segments"]}
    seg_dir = Path(tmp_path) / "text_index" / "segments"
    clean_bytes = {n: (seg_dir / f"{n}.seg").read_bytes()
                   for n in old_names}

    idx2 = cls(tmp_path)
    idx2.remove_file_chunks(Path("dead.txt"))   # 8/10 dead
    idx2.close()
    idx3 = cls(tmp_path)                        # compacts on load
    new = json.loads(manifest.read_text())
    new_names = {s["name"] for s in new["segments"]}
    assert new["gen"] > old["gen"]
    # rewritten segments carry fresh names; survivors are byte-identical
    for n in new_names:
        if n in old_names:
            assert (seg_dir / f"{n}.seg").read_bytes() == clean_bytes[n]
    assert new_names - old_names, "compaction must produce fresh names"
    assert idx3.num_live_docs == 2
    # a second compaction cycle keeps generating fresh names
    idx3.index_chunks([chunk(10 + i, f"alpha extra{i}", path="d2.txt")
                       for i in range(8)])
    idx3.remove_file_chunks(Path("d2.txt"))
    idx3.close()
    idx4 = cls(tmp_path)
    final = json.loads(manifest.read_text())
    assert final["gen"] > new["gen"]
    assert idx4.num_live_docs == 2


def test_dense_path_tie_break_and_parity(tmp_path):
    """High-match queries take the dense-accumulator path; ties at the
    selection boundary must still break by ascending doc id, identically
    across engines and identically to the low-match (sparse) path."""
    import sema_tpu.index.text_index as ti
    engines = [ti.TextIndex(tmp_path / "py")]
    try:
        import sema_tpu.native  # noqa: F401
        engines.append(ti.NativeTextIndex(tmp_path / "nt"))
    except ImportError:
        pass
    # 120 docs with IDENTICAL content → equal scores for "common";
    # plus a few docs with a rare term (sparse-path comparison)
    docs = [chunk(i, "common filler words here", path=f"f{i//8}.txt")
            for i in range(120)]
    docs += [chunk(200 + i, f"rareterm{i} common extra", path="r.txt")
             for i in range(3)]
    for e in engines:
        e.index_chunks(docs)
    for q, limit in (("common", 10), ("common", 50),
                     ("rareterm1", 10), ('"common filler"', 5)):
        results = [e.search(q, limit) for e in engines]
        a = [(c.id, s) for c, s in results[0]]
        for r in results[1:]:
            assert a == [(c.id, s) for c, s in r], q
        assert len(a) == min(limit, 123 if "rare" not in q else 1)
    # equal scores → ascending global doc id (= insertion order here)
    # wins at the selection boundary, for every engine
    for e in engines:
        top = e.search("common", 50)
        scores = [s for _, s in top]
        rows = [int(c.id.rsplit(":", 1)[1]) for c, _ in top]
        i = 0
        while i < len(top):
            j = i
            while j + 1 < len(top) and scores[j + 1] == scores[i]:
                j += 1
            assert rows[i:j + 1] == sorted(rows[i:j + 1]), (i, j, rows)
            i = j + 1

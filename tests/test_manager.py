"""IndexManager: incremental indexing + search dispatch
(≙ StorageManager, storage/mod.rs)."""

from pathlib import Path

import numpy as np
import pytest

from sema_tpu.index import IndexManager
from sema_tpu.models import Encoder, get_spec
from sema_tpu.models.loader import random_params
from sema_tpu.tokenizer import HashTokenizer


@pytest.fixture(scope="module")
def encoder():
    spec = get_spec("test-tiny")
    return Encoder(spec, random_params(spec), HashTokenizer(spec.vocab_size),
                   batch_size=8)


@pytest.fixture()
def tree(tmp_path):
    root = tmp_path / "tree"
    root.mkdir()
    (root / "alpha.py").write_text(
        "def compute_checksum(data):\n    return crc32(data)\n" * 3)
    (root / "beta.md").write_text(
        "# Networking guide\nsockets and protocols explained here\n" * 3)
    return root


def make_mgr(tmp_path, encoder):
    return IndexManager(tmp_path / "data", encoder)


def test_index_and_search(tmp_path, tree, encoder):
    mgr = make_mgr(tmp_path, encoder)
    files = sorted(tree.glob("*"))
    n = mgr.process_and_index_files(files)
    assert n > 0

    # semantic search returns results with real scores
    results = mgr.search("checksum computation", limit=10)
    assert results
    assert all(isinstance(s, float) for _, s in results)

    # keyword dispatch via ' prefix (storage/mod.rs:115-120)
    results = mgr.search("'sockets", limit=10)
    assert results
    assert all("sockets" in c.content for c, _ in results)
    assert str(results[0][0].file_path).endswith("beta.md")

    # bare ' → empty (storage/mod.rs:117-119)
    assert mgr.search("'", limit=10) == []
    mgr.close()


def test_incremental_skip_unchanged(tmp_path, tree, encoder):
    mgr = make_mgr(tmp_path, encoder)
    files = sorted(tree.glob("*"))
    n1 = mgr.process_and_index_files(files)
    assert n1 > 0
    n2 = mgr.process_and_index_files(files)
    assert n2 == 0  # storage/mod.rs:40-41: unchanged hash → skip
    mgr.close()


def test_incremental_reindex_changed(tmp_path, tree, encoder):
    mgr = make_mgr(tmp_path, encoder)
    files = sorted(tree.glob("*"))
    mgr.process_and_index_files(files)
    live_before = mgr.vector_store.live_rows

    (tree / "alpha.py").write_text(
        "def totally_new_function():\n    return 42\n" * 5)
    n = mgr.process_and_index_files(files)
    assert n > 0
    # old alpha chunks tombstoned, new ones live
    results = mgr.search("'totally", limit=10)
    assert results
    old = mgr.search("'crc32", limit=10)
    assert old == []
    mgr.close()


def test_missing_files_skipped(tmp_path, tree, encoder):
    mgr = make_mgr(tmp_path, encoder)
    n = mgr.process_and_index_files([tree / "ghost.py"])
    assert n == 0  # storage/mod.rs:34-36
    mgr.close()


def test_query_embed_failure_falls_back_to_substring(tmp_path, tree,
                                                     encoder, monkeypatch):
    """Embed-failure fallback (≙ lance_indexer.rs:143-148): a failed query
    embedding degrades to a host substring scan instead of erroring."""
    mgr = make_mgr(tmp_path, encoder)
    mgr.process_and_index_files(sorted(tree.glob("*")))

    def boom(*a, **kw):
        raise RuntimeError("device lost")
    monkeypatch.setattr(mgr.encoder, "encode_query_device", boom)
    results = mgr.search("sockets", limit=10)
    assert results  # degraded, not empty
    assert all("sockets" in c.content for c, _ in results)
    assert all(s == 1.0 for _, s in results)  # constant score, like the ref
    # case-sensitive, like SQL LIKE with binary collation
    assert mgr.search("SOCKETS", limit=10) == []
    mgr.close()


def test_crash_retry_semantics(tmp_path, tree, encoder, monkeypatch):
    """Hash recorded only after successful indexing → failed files retried
    (storage/mod.rs:62-66)."""
    mgr = make_mgr(tmp_path, encoder)
    files = sorted(tree.glob("*"))

    def boom(*a, **kw):
        raise RuntimeError("device lost")
    monkeypatch.setattr(mgr.encoder, "encode_texts", boom)
    mgr.process_and_index_files(files)  # vector write fails with warning
    # text index still got the chunks (independent failure domains,
    # storage/mod.rs:101-107) but no hash was recorded? — hashes ARE
    # recorded after index_chunks returns (failures inside are warnings),
    # matching the reference exactly: lance failure + tantivy success →
    # hash written (storage/mod.rs:101-110,62-66).
    monkeypatch.undo()

    mgr2 = IndexManager(tmp_path / "data", encoder)
    n = mgr2.process_and_index_files(files)
    assert n == 0  # parity: hash was recorded despite the vector failure
    # but semantic search finds nothing — same desync the reference permits
    assert mgr2.vector_store.live_rows == 0
    mgr2.close()


def test_index_chunks_sliced_batches(tmp_path, encoder, monkeypatch):
    """The indexing loop slices big corpora into bounded commits (both
    indexes are designed for O(batch) + amortized merges; a one-shot
    million-chunk batch held ~GBs of transients). Results and counts
    must be identical to the one-shot path."""
    monkeypatch.setenv("SEMA_TPU_INDEX_BATCH", "3")
    root = tmp_path / "bigtree"
    root.mkdir()
    for i in range(4):
        # ~3 chunks per file: 3 KB of text with a per-file token
        (root / f"doc{i}.txt").write_text(
            (f"findmetoken{i} " + "lorem ipsum dolor sit amet " * 6
             + "\n") * 20)
    mgr = IndexManager(tmp_path / "data", encoder)
    n = mgr.process_and_index_files(sorted(root.glob("*.txt")))
    assert n > 3
    # one vector segment per slice
    assert len(mgr.vector_store.segments) == (n + 2) // 3
    assert mgr.vector_store.live_rows == n
    for i in range(4):
        hits = mgr.search(f"'findmetoken{i}", limit=5)
        assert hits and all(c.file_path == root / f"doc{i}.txt"
                            for c, _ in hits)
    # incremental skip still holds across the sliced path
    assert mgr.process_and_index_files(sorted(root.glob("*.txt"))) == 0
    mgr.close()


# -- round-3 review-fix regressions -----------------------------------------

def test_deleted_file_purged_with_root(tmp_path, tree, encoder):
    """A file deleted from disk is purged from BOTH indexes on the next
    run when the crawl root is passed (the reference never purges —
    its global index serves deleted files' chunks forever)."""
    mgr = make_mgr(tmp_path, encoder)
    files = sorted(tree.glob("*"))
    mgr.process_and_index_files(files, purge_missing_under=tree)
    res = mgr.search("networking sockets guide", 5)
    assert any("beta.md" in str(c.file_path) for c, _ in res)

    (tree / "beta.md").unlink()
    mgr.process_and_index_files(sorted(tree.glob("*")),
                                purge_missing_under=tree)
    res = mgr.search("networking sockets guide", 5)
    assert not any("beta.md" in str(c.file_path) for c, _ in res)
    res = mgr.search("'networking", 5)
    assert not any("beta.md" in str(c.file_path) for c, _ in res)
    assert mgr.vector_store.get_file_hash(tree / "beta.md") is None
    mgr.close()


def test_purge_scoped_to_root(tmp_path, encoder):
    """Purging is scoped to the crawl root: files of OTHER indexed
    roots are absent from this crawl but must survive."""
    mgr = make_mgr(tmp_path, encoder)
    r1 = tmp_path / "r1"; r1.mkdir()
    r2 = tmp_path / "r2"; r2.mkdir()
    (r1 / "one.py").write_text("def one():\n    return 1\n" * 5)
    (r2 / "two.py").write_text("def two():\n    return 2\n" * 5)
    mgr.process_and_index_files(sorted(r1.glob("*")), purge_missing_under=r1)
    mgr.process_and_index_files(sorted(r2.glob("*")), purge_missing_under=r2)
    # re-index r1 only: r2's file is missing from THIS crawl but exists
    mgr.process_and_index_files(sorted(r1.glob("*")), purge_missing_under=r1)
    assert mgr.vector_store.get_file_hash(r2 / "two.py") is not None
    mgr.close()


def test_zero_chunk_file_converges(tmp_path, tree, encoder):
    """A changed file that now yields ZERO chunks (truncated below the
    50-byte minimum) records its hash and is skipped next run —
    previously it re-detected as changed forever."""
    mgr = make_mgr(tmp_path, encoder)
    files = sorted(tree.glob("*"))
    mgr.process_and_index_files(files)
    (tree / "alpha.py").write_text("tiny\n")   # < MIN_CHUNK_SIZE
    mgr.process_and_index_files(sorted(tree.glob("*")))
    from sema_tpu.ingest.hashing import hash_file
    assert (mgr.vector_store.get_file_hash(tree / "alpha.py")
            == hash_file(tree / "alpha.py"))
    # third run: nothing to do
    removed = []
    orig = mgr.vector_store.remove_file_chunks
    mgr.vector_store.remove_file_chunks = \
        lambda f: removed.append(f) or orig(f)
    n = mgr.process_and_index_files(sorted(tree.glob("*")))
    assert n == 0 and not removed
    mgr.close()


def test_recorded_hash_is_checktime_hash(tmp_path, tree, encoder, monkeypatch):
    """The hash recorded after indexing is the CHECK-time hash (whose
    content was chunked), not a re-hash — a mid-run editor save must
    re-index next run instead of being masked forever."""
    mgr = make_mgr(tmp_path, encoder)
    f = tree / "alpha.py"
    files = sorted(tree.glob("*"))

    import sema_tpu.index.manager as mgr_mod
    real_process = mgr_mod.process_files

    def mutate_then_process(paths):
        chunks = real_process(paths)
        f.write_text("def changed_mid_run():\n    return 42\n" * 4)
        return chunks
    monkeypatch.setattr(mgr_mod, "process_files", mutate_then_process)
    mgr.process_and_index_files(files)
    monkeypatch.setattr(mgr_mod, "process_files", real_process)

    from sema_tpu.ingest.hashing import hash_file
    assert (mgr.vector_store.get_file_hash(f) != hash_file(f))
    n = mgr.process_and_index_files(sorted(tree.glob("*")))
    assert n > 0   # the mid-run save re-indexes
    mgr.close()

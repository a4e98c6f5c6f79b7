"""BM25 full-text index.

Replaces the reference's Tantivy index (src/storage/text_indexer.rs):

- tokenization matches tantivy's ``default`` analyzer: split on
  non-alphanumeric, lowercase, drop tokens longer than 40 chars;
- scoring is BM25 with tantivy's parameters (k1=0.9? no — tantivy uses the
  Lucene constants k1=1.2, b=0.75) over an OR-of-terms query, the behavior
  of ``QueryParser`` + ``TopDocs`` at text_indexer.rs:81-83; quoted phrases
  require all terms adjacent in order;
- real scores are returned (text_indexer.rs:144-153 keeps them, unlike the
  semantic path);
- ``commit()`` persists to disk; the index reopens incrementally
  (text_indexer.rs:159-162).

Persistence is segmented like tantivy's (text_indexer.rs:58-73 commits per
batch; tantivy writes immutable segment files): each commit appends ONE
immutable segment holding just the docs added since the previous commit,
plus a small manifest (ordered segment list + tombstoned doc ids) rewritten
atomically. Per-batch commit cost is O(batch), not O(index) — the round-1
whole-file rewrite was an O(N²) build at the 10M-chunk config. Tombstones
accumulate in the manifest until the dead fraction crosses 25%, then the
index compacts to a single fresh segment on load. Pre-segment single-file
indexes (``index.json`` / ``index.native.bin``) migrate on first open.

The pure-Python implementation below is the semantics oracle; the C++
native backend (sema_tpu/native, ≙ tantivy's role) accelerates it with an
equivalent segmented layout (binary segment files).
"""

from __future__ import annotations

import json
import math
import os
import re
from collections import Counter, defaultdict
from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple

from sema_tpu.types import Chunk
from sema_tpu.utils.fsio import atomic_write_json as _atomic_write_json


def _locked(fn):
    """Serialize a method behind the instance's RLock. The text index
    is mutated by the serve daemon's re-index thread while HTTP threads
    run keyword searches (sema-tpu serve --reindex-interval); unlike the
    vector store's snapshot-based buckets, the postings dicts (and the
    native backend's C++ vectors, which reallocate) need the coarse
    lock — searches are sub-ms, so contention is negligible."""
    import functools

    @functools.wraps(fn)
    def wrapper(self, *a, **kw):
        with self._lock:
            return fn(self, *a, **kw)
    return wrapper

K1 = 1.2
B = 0.75
MAX_TOKEN_LEN = 40  # tantivy default analyzer's RemoveLongFilter(40)
_COMPACT_DEAD_FRACTION = 0.25


# tantivy SimpleTokenizer splits on non-alphanumeric (unicode-aware);
# '_' is NOT alphanumeric in Rust, so "foo_bar" → ["foo", "bar"]
_SPLIT_RE = re.compile(r"[^\W_]+", re.UNICODE)


def tokenize(text: str) -> List[str]:
    """tantivy default analyzer: alphanumeric runs, lowercased, ≤40 chars."""
    out = []
    for m in _SPLIT_RE.finditer(text):
        tok = m.group(0).lower()
        if len(tok) <= MAX_TOKEN_LEN:
            out.append(tok)
    return out


class TextIndex:
    def __init__(self, data_dir: Path | str):
        import threading
        self._lock = threading.RLock()
        self.dir = Path(data_dir) / "text_index"
        self.seg_dir = self.dir / "segments"
        self.seg_dir.mkdir(parents=True, exist_ok=True)
        self.docs: List[Optional[dict]] = []      # None = deleted
        self.doc_len: List[int] = []
        self.postings: Dict[str, Dict[int, int]] = defaultdict(dict)
        self._segments: List[dict] = []           # [{"name", "docs"}]
        self._committed_docs = 0                  # docs persisted in segments
        self._deleted: set = set()                # tombstoned global doc ids
        self._committed_deleted: set = set()      # ids in the manifest
        # postings of the not-yet-committed doc tail, ids relative to
        # _committed_docs (accumulated at add time so a commit never walks
        # the global postings table)
        self._pending_postings: Dict[str, Dict[int, int]] = defaultdict(dict)
        self._load()

    # -- persistence ------------------------------------------------------------

    @property
    def _manifest_path(self) -> Path:
        return self.dir / "manifest.json"

    @property
    def _legacy_path(self) -> Path:
        return self.dir / "index.json"

    def _seg_path(self, name: str) -> Path:
        return self.seg_dir / f"{name}.json"

    def _seg_name(self) -> str:
        name = f"seg-{len(self._segments):06d}-{self._committed_docs:09d}"
        if any(s["name"] == name for s in self._segments):
            name = "seg-compact"  # post-compaction numbering restarted
        return name

    def _load(self) -> None:
        if self._manifest_path.exists():
            m = json.loads(self._manifest_path.read_text())
            for s in m["segments"]:
                seg = json.loads(self._seg_path(s["name"]).read_text())
                base = len(self.docs)
                self.docs.extend(seg["docs"])
                self.doc_len.extend(seg["doc_len"])
                for term, plist in seg["postings"].items():
                    tgt = self.postings[term]
                    for rel, tf in plist.items():
                        tgt[base + int(rel)] = tf
                self._segments.append(dict(s))
            self._committed_docs = len(self.docs)
            for i in m.get("deleted", []):
                self.docs[i] = None
                self._deleted.add(i)
            self._committed_deleted = set(self._deleted)
            self._maybe_compact()
        elif self._legacy_path.exists():
            # one-time migration from the round-1 single-file format
            data = json.loads(self._legacy_path.read_text())
            self.docs = data["docs"]
            self.doc_len = data["doc_len"]
            for term, plist in data["postings"].items():
                self.postings[term] = {int(d): tf for d, tf in
                                       plist.items()}
            self._deleted = {i for i, d in enumerate(self.docs)
                             if d is None}
            self._rewrite_as_single_segment()
            self._legacy_path.unlink()

    def _write_manifest(self) -> None:
        _atomic_write_json(self._manifest_path, {
            "version": 1,
            "segments": self._segments,
            "deleted": sorted(self._deleted),
        })
        self._committed_deleted = set(self._deleted)

    def _rewrite_as_single_segment(self) -> None:
        """Persist the whole in-memory index as one fresh segment
        (migration and compaction tail).

        Crash-atomicity: the new segment must be written under a name
        ABSENT from the old manifest — the collision check has to run
        against the OLD segment list (clearing the list first would
        always pick the old first segment's name and overwrite a file
        the still-committed manifest points at; a crash before the
        manifest write would then corrupt the index on next load)."""
        old_names = {s["name"] for s in self._segments}
        old_files = [self._seg_path(s["name"]) for s in self._segments]
        self._segments = []
        self._committed_docs = 0
        name = self._seg_name()
        if name in old_names:
            name = "seg-compact"
        if self.docs:
            _atomic_write_json(self._seg_path(name), {
                "docs": self.docs,
                "doc_len": self.doc_len,
                "postings": {t: p for t, p in self.postings.items()},
            })
            self._segments = [{"name": name, "docs": len(self.docs)}]
        self._committed_docs = len(self.docs)
        self._pending_postings = defaultdict(dict)
        self._write_manifest()
        keep = self._seg_path(name)
        for p in old_files:
            if p != keep:
                p.unlink(missing_ok=True)

    def _maybe_compact(self) -> None:
        total = len(self.docs)
        if total == 0 or len(self._deleted) / total <= \
                _COMPACT_DEAD_FRACTION:
            return
        keep = [i for i in range(total) if self.docs[i] is not None]
        remap = {old: new for new, old in enumerate(keep)}
        self.docs = [self.docs[i] for i in keep]
        self.doc_len = [self.doc_len[i] for i in keep]
        postings: Dict[str, Dict[int, int]] = defaultdict(dict)
        for term, plist in self.postings.items():
            for d, tf in plist.items():
                if d in remap:
                    postings[term][remap[d]] = tf
        self.postings = postings
        self._deleted = set()
        self._rewrite_as_single_segment()

    @_locked
    def commit(self) -> None:
        """Durable write (≙ tantivy writer.commit, text_indexer.rs:70,159).
        Appends one segment with the new docs (cost O(batch)); tombstones
        ride the manifest."""
        wrote = False
        if len(self.docs) > self._committed_docs:
            name = self._seg_name()
            _atomic_write_json(self._seg_path(name), {
                "docs": self.docs[self._committed_docs:],
                "doc_len": self.doc_len[self._committed_docs:],
                "postings": {t: p for t, p in
                             self._pending_postings.items()},
            })
            self._segments.append(
                {"name": name,
                 "docs": len(self.docs) - self._committed_docs})
            self._committed_docs = len(self.docs)
            self._pending_postings = defaultdict(dict)
            wrote = True
        if wrote or self._deleted != self._committed_deleted \
                or not self._manifest_path.exists():
            self._write_manifest()

    # -- mutation ----------------------------------------------------------------

    @_locked
    def index_chunks(self, chunks: Sequence[Chunk]) -> None:
        """Add documents and commit (text_indexer.rs:58-73 commits per batch)."""
        for c in chunks:
            doc_id = len(self.docs)
            rel_id = doc_id - self._committed_docs
            tokens = tokenize(c.content)
            self.docs.append({
                "id": c.id, "file_path": str(c.file_path),
                "start_line": c.start_line, "end_line": c.end_line,
                "content": c.content,
            })
            self.doc_len.append(len(tokens))
            for term, tf in Counter(tokens).items():
                self.postings[term][doc_id] = tf
                self._pending_postings[term][rel_id] = tf
        self.commit()

    @_locked
    def remove_file_chunks(self, file_path) -> int:
        """Tombstone a file's documents (delete-then-reindex support)."""
        target = str(file_path)
        removed = 0
        for i, doc in enumerate(self.docs):
            if doc is not None and doc["file_path"] == target:
                self.docs[i] = None
                self._deleted.add(i)
                removed += 1
        return removed

    # -- search -------------------------------------------------------------------

    @property
    def num_live_docs(self) -> int:
        return sum(1 for d in self.docs if d is not None)

    def _avg_len(self) -> float:
        live = [(l, d) for l, d in zip(self.doc_len, self.docs) if d is not None]
        if not live:
            return 0.0
        return sum(l for l, _ in live) / len(live)

    def _bm25_scores(self, terms: List[str]) -> Dict[int, float]:
        n_docs = self.num_live_docs
        if n_docs == 0:
            return {}
        avg = self._avg_len() or 1.0
        scores: Dict[int, float] = defaultdict(float)
        for term in terms:
            plist = self.postings.get(term)
            if not plist:
                continue
            df = sum(1 for d in plist if self.docs[d] is not None)
            if df == 0:
                continue
            idf = math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))
            for doc_id, tf in plist.items():
                if self.docs[doc_id] is None:
                    continue
                dl = self.doc_len[doc_id]
                denom = tf + K1 * (1 - B + B * dl / avg)
                scores[doc_id] += idf * tf * (K1 + 1) / denom
        return scores

    @_locked
    def search(self, query: str, limit: int) -> List[Tuple[Chunk, float]]:
        """OR-of-terms BM25 (tantivy QueryParser default); quoted
        substrings add an exact-phrase filter. Empty query → no results
        (text_indexer.rs:76-78)."""
        query = query.strip()
        if not query:
            return []

        phrases = re.findall(r'"([^"]+)"', query)
        bare = re.sub(r'"[^"]*"', " ", query)
        terms = tokenize(bare) + [t for p in phrases for t in tokenize(p)]
        if not terms:
            return []

        scores = self._bm25_scores(terms)

        if phrases:
            def has_phrases(doc) -> bool:
                # sentinel-wrapped join: every token is bounded by \x00 on
                # BOTH sides so a phrase term can never match a substring of
                # a longer token ("bar" must not match "barometer"); the
                # native backend uses the identical convention
                toks = tokenize(doc["content"])
                joined = "\x00" + "\x00".join(toks) + "\x00"
                # a phrase with no tokens (whitespace/punctuation only)
                # carries no constraint — skip it, matching the native
                # backend (a '"\x00\x00"' needle would instead reject
                # every doc)
                return all(
                    ("\x00" + "\x00".join(pt) + "\x00") in joined
                    for pt in (tokenize(p) for p in phrases) if pt)
            scores = {d: s for d, s in scores.items()
                      if has_phrases(self.docs[d])}

        ranked = sorted(scores.items(), key=lambda kv: -kv[1])[:limit]
        out: List[Tuple[Chunk, float]] = []
        for doc_id, score in ranked:
            d = self.docs[doc_id]
            out.append((Chunk(
                id=d["id"], file_path=Path(d["file_path"]),
                start_line=d["start_line"], end_line=d["end_line"],
                content=d["content"]), float(score)))
        return out

    @_locked
    def close(self) -> None:
        self.commit()


class NativeTextIndex:
    """C++-backed BM25 index (≙ tantivy's role; SURVEY.md §2 native
    inventory). Same interface and semantics as :class:`TextIndex`; the
    test suite asserts identical rankings and scores against the Python
    oracle. Persists segmented binary files under ``text_index/segments/``
    plus ``manifest.native.json`` (same incremental-commit design as the
    Python oracle; migrates round-1 ``index.native.bin`` snapshots)."""

    def __init__(self, data_dir: Path | str):
        import threading
        from sema_tpu.native.bindings import NativeTextIndexHandle
        self._lock = threading.RLock()
        self.dir = Path(data_dir) / "text_index"
        self.seg_dir = self.dir / "segments"
        self.seg_dir.mkdir(parents=True, exist_ok=True)
        self._h = NativeTextIndexHandle()
        self._segments: List[dict] = []
        self._committed_docs = 0
        self._committed_deleted: set = set()
        self._tombstones_dirty = False
        if self._manifest_path.exists():
            m = json.loads(self._manifest_path.read_text())
            for s in m["segments"]:
                self._h.load_segment(str(self._seg_path(s["name"])))
                self._segments.append(dict(s))
            self._h.set_deleted(m.get("deleted", []))
            self._committed_docs = self._h.num_docs()
            self._committed_deleted = set(m.get("deleted", []))
            self._maybe_compact()
        elif self._legacy_path.exists():
            # one-time migration from the round-1 full-snapshot format
            self._h.load(str(self._legacy_path))
            self._rewrite_as_single_segment()
            self._legacy_path.unlink()

    @property
    def _manifest_path(self) -> Path:
        return self.dir / "manifest.native.json"

    @property
    def _legacy_path(self) -> Path:
        return self.dir / "index.native.bin"

    def _seg_path(self, name: str) -> Path:
        return self.seg_dir / f"{name}.bin"

    def _seg_name(self) -> str:
        name = f"seg-{len(self._segments):06d}-{self._committed_docs:09d}"
        if any(s["name"] == name for s in self._segments):
            name = "seg-compact"
        return name

    def _write_manifest(self, deleted) -> None:
        _atomic_write_json(self._manifest_path, {
            "version": 1,
            "segments": self._segments,
            "deleted": sorted(deleted),
        })
        self._committed_deleted = set(deleted)

    def _rewrite_as_single_segment(self) -> None:
        # fresh name vs the OLD manifest's segments (see the Python
        # backend's docstring: crash-atomicity requires it)
        old_names = {s["name"] for s in self._segments}
        old_files = [self._seg_path(s["name"]) for s in self._segments]
        self._segments = []
        self._committed_docs = 0
        name = self._seg_name()
        if name in old_names:
            name = "seg-compact"
        n = self._h.num_docs()
        if n:
            self._h.save_segment(str(self._seg_path(name)), 0)
            self._segments = [{"name": name, "docs": n}]
        self._committed_docs = n
        self._write_manifest(self._h.deleted_ids())
        keep = self._seg_path(name)
        for p in old_files:
            if p != keep:
                p.unlink(missing_ok=True)

    def _maybe_compact(self) -> None:
        total = self._h.num_docs()
        dead = total - self._h.num_live()
        if total == 0 or dead / total <= _COMPACT_DEAD_FRACTION:
            return
        self._h.compact()
        self._rewrite_as_single_segment()

    @property
    def num_live_docs(self) -> int:
        return self._h.num_live()

    @_locked
    def index_chunks(self, chunks: Sequence[Chunk]) -> None:
        self._h.add((c.id, str(c.file_path), c.start_line, c.end_line,
                     c.content) for c in chunks)
        self.commit()

    @_locked
    def remove_file_chunks(self, file_path) -> int:
        n = self._h.remove_file(str(file_path))
        if n:
            self._tombstones_dirty = True
        return n

    @_locked
    def search(self, query: str, limit: int) -> List[Tuple[Chunk, float]]:
        query = query.strip()
        if not query:
            return []
        return [
            (Chunk(id=i, file_path=Path(p), start_line=s, end_line=e,
                   content=c), float(score))
            for i, p, s, e, c, score in self._h.search(query, limit)]

    @_locked
    def commit(self) -> None:
        wrote = False
        n = self._h.num_docs()
        if n > self._committed_docs:
            name = self._seg_name()
            self._h.save_segment(str(self._seg_path(name)),
                                 self._committed_docs)
            self._segments.append(
                {"name": name, "docs": n - self._committed_docs})
            self._committed_docs = n
            wrote = True
        # materialize the tombstone list only when it could have changed:
        # deleted_ids() walks every doc in C++ and marshals the full list
        # through the FFI — O(total docs) work a per-batch commit must
        # not pay unconditionally (review finding)
        if wrote or self._tombstones_dirty \
                or not self._manifest_path.exists():
            self._write_manifest(self._h.deleted_ids())
            self._tombstones_dirty = False

    @_locked
    def close(self) -> None:
        self.commit()


def make_text_index(data_dir: Path | str, backend: str = "auto"):
    """Backend selection: 'native' (C++), 'python', or 'auto' (native when
    built; SEMA_TPU_TEXT_BACKEND overrides). In auto mode an existing
    on-disk index pins its backend — an index built by the Python backend
    must not silently appear empty when the native library shows up later."""
    backend = os.environ.get("SEMA_TPU_TEXT_BACKEND", backend)
    if backend == "python":
        return TextIndex(data_dir)
    if backend == "auto":
        tdir = Path(data_dir) / "text_index"
        py_index = (tdir / "index.json").exists() or \
            (tdir / "manifest.json").exists()
        native_index = (tdir / "index.native.bin").exists() or \
            (tdir / "manifest.native.json").exists()
        if py_index and not native_index:
            return TextIndex(data_dir)
    try:
        return NativeTextIndex(data_dir)
    except ImportError:
        if backend == "native":
            raise
        return TextIndex(data_dir)

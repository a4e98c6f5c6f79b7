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

The pure-Python implementation below is the semantics oracle; the C++
native backend (sema_tpu/native, ≙ tantivy's role) accelerates it with the
same on-disk format.
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

K1 = 1.2
B = 0.75
MAX_TOKEN_LEN = 40  # tantivy default analyzer's RemoveLongFilter(40)

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
        self.dir = Path(data_dir) / "text_index"
        self.dir.mkdir(parents=True, exist_ok=True)
        self.docs: List[Optional[dict]] = []      # None = deleted
        self.doc_len: List[int] = []
        self.postings: Dict[str, Dict[int, int]] = defaultdict(dict)
        self._dirty = False
        self._load()

    # -- persistence ------------------------------------------------------------

    @property
    def _path(self) -> Path:
        return self.dir / "index.json"

    def _load(self) -> None:
        if not self._path.exists():
            return
        data = json.loads(self._path.read_text())
        self.docs = data["docs"]
        self.doc_len = data["doc_len"]
        self.postings = defaultdict(dict)
        for term, plist in data["postings"].items():
            self.postings[term] = {int(d): tf for d, tf in plist.items()}

    def commit(self) -> None:
        """Durable write (≙ tantivy writer.commit, text_indexer.rs:70,159)."""
        if not self._dirty and self._path.exists():
            return
        tmp = self._path.with_suffix(".tmp")
        tmp.write_text(json.dumps({
            "docs": self.docs,
            "doc_len": self.doc_len,
            "postings": {t: p for t, p in self.postings.items()},
        }))
        os.replace(tmp, self._path)
        self._dirty = False

    # -- mutation ----------------------------------------------------------------

    def index_chunks(self, chunks: Sequence[Chunk]) -> None:
        """Add documents and commit (text_indexer.rs:58-73 commits per batch)."""
        for c in chunks:
            doc_id = len(self.docs)
            tokens = tokenize(c.content)
            self.docs.append({
                "id": c.id, "file_path": str(c.file_path),
                "start_line": c.start_line, "end_line": c.end_line,
                "content": c.content,
            })
            self.doc_len.append(len(tokens))
            for term, tf in Counter(tokens).items():
                self.postings[term][doc_id] = tf
        self._dirty = True
        self.commit()

    def remove_file_chunks(self, file_path) -> int:
        """Tombstone a file's documents (delete-then-reindex support)."""
        target = str(file_path)
        removed = 0
        for i, doc in enumerate(self.docs):
            if doc is not None and doc["file_path"] == target:
                self.docs[i] = None
                removed += 1
        if removed:
            self._dirty = True
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
                return all(
                    ("\x00" + "\x00".join(tokenize(p)) + "\x00") in joined
                    for p in phrases)
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

    def close(self) -> None:
        self.commit()


class NativeTextIndex:
    """C++-backed BM25 index (≙ tantivy's role; SURVEY.md §2 native
    inventory). Same interface and semantics as :class:`TextIndex`; the
    test suite asserts identical rankings and scores against the Python
    oracle. Persists to ``text_index/index.native.bin``."""

    def __init__(self, data_dir: Path | str):
        from sema_tpu.native.bindings import NativeTextIndexHandle
        self.dir = Path(data_dir) / "text_index"
        self.dir.mkdir(parents=True, exist_ok=True)
        self._h = NativeTextIndexHandle()
        self._dirty = False
        if self._path.exists():
            self._h.load(str(self._path))

    @property
    def _path(self) -> Path:
        return self.dir / "index.native.bin"

    @property
    def num_live_docs(self) -> int:
        return self._h.num_live()

    def index_chunks(self, chunks: Sequence[Chunk]) -> None:
        self._h.add((c.id, str(c.file_path), c.start_line, c.end_line,
                     c.content) for c in chunks)
        self._dirty = True
        self.commit()

    def remove_file_chunks(self, file_path) -> int:
        removed = self._h.remove_file(str(file_path))
        if removed:
            self._dirty = True
        return removed

    def search(self, query: str, limit: int) -> List[Tuple[Chunk, float]]:
        query = query.strip()
        if not query:
            return []
        return [
            (Chunk(id=i, file_path=Path(p), start_line=s, end_line=e,
                   content=c), float(score))
            for i, p, s, e, c, score in self._h.search(query, limit)]

    def commit(self) -> None:
        if self._dirty or not self._path.exists():
            self._h.save(str(self._path))
            self._dirty = False

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
        if (tdir / "index.json").exists() and \
                not (tdir / "index.native.bin").exists():
            return TextIndex(data_dir)
    try:
        return NativeTextIndex(data_dir)
    except ImportError:
        if backend == "native":
            raise
        return TextIndex(data_dir)

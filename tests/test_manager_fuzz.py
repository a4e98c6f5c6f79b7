"""Randomized integration fuzz for the incremental-index state machine.

Seeded random op sequences over a real directory tree — create, modify,
delete, touch-without-change — each followed by a re-index
(``process_and_index_files``), mirroring what the TUI/CLI/serve loop
does (storage/mod.rs:30-52 semantics). After every step the manager's
search results are checked against first-principles expectations:

- every live file's planted unique token is findable by keyword search
  and maps to that file;
- no deleted file's token ever surfaces (vector or text path);
- unchanged files are not re-embedded (encoder call counting — the
  hash-manifest skip is the reference's core incremental contract);
- the vector store's live row count equals the chunker's output over
  the live tree.
"""

import random
from pathlib import Path

import numpy as np
import pytest

from sema_tpu.index.manager import IndexManager
from sema_tpu.ingest.chunker import process_files
from sema_tpu.models import Encoder, get_spec
from sema_tpu.models.loader import random_params
from sema_tpu.tokenizer import HashTokenizer


class CountingEncoder:
    """Real test-tiny encoder + a counter of embedded texts."""

    def __init__(self):
        spec = get_spec("test-tiny")
        self._enc = Encoder(spec, random_params(spec),
                            HashTokenizer(spec.vocab_size), batch_size=8)
        self.spec = spec
        self.embedded = 0

    def encode_texts(self, texts, progress=None, out_dtype=np.float32,
                     return_device=False):
        self.embedded += len(texts)
        return self._enc.encode_texts(texts, progress=progress,
                                      out_dtype=out_dtype,
                                      return_device=return_device)

    def encode_query(self, text):
        return self._enc.encode_query(text)


def _file_text(fid: int, version: int) -> str:
    # ~3 chunks per file; a unique token marks (file, version)
    token = f"uniqtok{fid}v{version}"
    body = " ".join(f"word{(fid * 31 + i * 7 + version) % 97}"
                    for i in range(60))
    return f"{token} {body}\n" * 12


@pytest.mark.parametrize("seed", [11, 57])
def test_incremental_index_fuzz(tmp_path, seed):
    rng = random.Random(seed)
    tree = tmp_path / "tree"
    tree.mkdir()
    enc = CountingEncoder()
    mgr = IndexManager(tmp_path / "data", enc)

    live: dict = {}      # fid -> version
    dead: set = set()    # fids whose files were deleted
    next_fid = 0

    def reindex():
        files = sorted(tree.glob("*.txt"))
        mgr.process_and_index_files(files)
        # parity with the reference: deletions are handled by the
        # caller's crawl no longer listing the file; the manager prunes
        # rows when the file is re-indexed or explicitly removed — the
        # CLI/TUI path removes stale hashes via remove_file_chunks
        for fid in list(dead):
            p = tree / f"f{fid}.txt"
            if mgr.vector_store.get_file_hash(p) is not None:
                mgr.vector_store.remove_file_chunks(p)
                mgr.text_index.remove_file_chunks(p)
                mgr.vector_store.remove_file_hash(p)

    def check():
        # (d) live row count == chunker over the live tree
        files = sorted(tree.glob("*.txt"))
        expected_chunks = len(process_files(files))
        assert mgr.vector_store.live_rows == expected_chunks
        # (a)+(b): keyword search per planted token
        for fid, ver in live.items():
            hits = mgr.search(f"'uniqtok{fid}v{ver}", limit=5)
            assert hits, f"live token of f{fid} v{ver} not found"
            assert all(c.file_path == tree / f"f{fid}.txt"
                       for c, _ in hits)
        for fid in dead:
            assert not mgr.search(f"'uniqtok{fid}v0", limit=5)

    for step in range(18):
        op = rng.random()
        if op < 0.4 or not live:                      # create
            fid, next_fid = next_fid, next_fid + 1
            (tree / f"f{fid}.txt").write_text(_file_text(fid, 0))
            live[fid] = 0
        elif op < 0.65:                               # modify
            fid = rng.choice(sorted(live))
            old_ver = live[fid]
            live[fid] = old_ver + 1
            (tree / f"f{fid}.txt").write_text(
                _file_text(fid, live[fid]))
        elif op < 0.8 and len(live) > 1:              # delete
            fid = rng.choice(sorted(live))
            (tree / f"f{fid}.txt").unlink()
            del live[fid]
            dead.add(fid)
        else:                                         # touch, no change
            fid = rng.choice(sorted(live))
            p = tree / f"f{fid}.txt"
            p.write_text(p.read_text())

        before = enc.embedded
        reindex()
        # (c) only changed/new content embeds: per-step upper bound is
        # the chunks of ONE file's current text (touches embed nothing)
        one_file = len(process_files(
            [tree / f"f{max(live, default=0)}.txt"])) if live else 0
        assert enc.embedded - before <= max(one_file, 4) * 2
        check()

    # a full re-index of the unchanged tree embeds nothing
    before = enc.embedded
    reindex()
    assert enc.embedded == before
    check()
    mgr.close()

"""Search engine state machine (≙ engine.rs) — headless tests."""

from pathlib import Path

import pytest

from sema_tpu.search.engine import (Engine, group_results_by_file,
                                    SEARCH_RESULTS_LIMIT)
from sema_tpu.types import AppState, Chunk, SearchResult, UIMode


def sr(path, start, score, end=None):
    return SearchResult(
        chunk=Chunk(id=f"{path}:{start}", file_path=Path(path),
                    start_line=start, end_line=end or start + 5,
                    content="x"), score=score)


class FakeManager:
    def __init__(self, results=None, error=None):
        self.results = results or []
        self.error = error
        self.calls = []

    def search(self, query, limit):
        self.calls.append((query, limit))
        if self.error:
            raise self.error
        return [(r.chunk, r.score) for r in self.results]


def test_group_results_one_row_per_file():
    """engine.rs:156-182."""
    results = [sr("a.py", 30, 0.5), sr("a.py", 10, 0.9),
               sr("b.py", 1, 0.7)]
    grouped = group_results_by_file(results)
    assert len(grouped) == 2
    # a.py row carries the earliest chunk and the count
    a = next(g for g in grouped if g.chunk.file_path == Path("a.py"))
    assert a.chunk.start_line == 10
    assert a.total_matches_in_file == 2
    # sorted by score desc: a.py group kept its first-by-line score (0.9)
    assert [str(g.chunk.file_path) for g in grouped] == ["a.py", "b.py"]


def test_group_results_tiebreak_deterministic():
    grouped = group_results_by_file(
        [sr("z.py", 1, 0.5), sr("a.py", 1, 0.5)])
    assert [str(g.chunk.file_path) for g in grouped] == ["a.py", "z.py"]


def test_execute_search_short_query_rejected():
    mgr = FakeManager([sr("a.py", 1, 1.0)])
    eng = Engine(index_manager=mgr)
    eng.execute_search("ab")  # app.rs:165: <= 2 BYTES
    assert mgr.calls == []
    assert eng.search_results == []


def test_execute_search_gate_counts_utf8_bytes():
    """app.rs:165 gates on query.trim().len() — UTF-8 bytes in Rust — so a
    single CJK character (3 bytes) passes while two ASCII chars don't."""
    mgr = FakeManager([sr("a.py", 1, 1.0)])
    eng = Engine(index_manager=mgr)
    eng.execute_search("中")  # 1 char, 3 UTF-8 bytes → accepted
    assert mgr.calls == [("中", SEARCH_RESULTS_LIMIT)]


def test_execute_search_populates_and_switches_mode():
    mgr = FakeManager([sr("a.py", 1, 1.0)])
    eng = Engine(index_manager=mgr)
    eng.execute_search("hello")
    assert mgr.calls == [("hello", SEARCH_RESULTS_LIMIT)]
    assert len(eng.search_results) == 1
    assert eng.ui_mode is UIMode.SEARCH_RESULTS


def test_execute_search_error_captured():
    eng = Engine(index_manager=FakeManager(error=RuntimeError("boom")))
    eng.execute_search("hello")
    assert eng.search_error == "Search failed: boom"
    assert eng.search_results == []


def test_execute_search_without_manager():
    eng = Engine()
    eng.execute_search("hello")
    assert eng.search_error == "Failed to initialize search"


def test_clear_search_resets_state():
    eng = Engine(index_manager=FakeManager([sr("a.py", 1, 1.0)]))
    eng.execute_search("hello")
    eng.selected_search_result = 3
    eng.clear_search()
    assert eng.search_results == []
    assert eng.selected_search_result == 0
    assert eng.ui_mode is UIMode.SEARCH_INPUT
    assert eng.current_search_query == ""


def test_load_file_content_cap(tmp_path):
    big = tmp_path / "big.txt"
    big.write_bytes(b"x" * 2_000_000)
    out = Engine.load_file_content(big)
    assert out == "File too large to display (1.9 MB)"  # engine.rs:188-190


def test_load_file_content_missing(tmp_path):
    out = Engine.load_file_content(tmp_path / "ghost.txt")
    assert out.startswith("Failed to read file:")


def test_update_current_file_content(tmp_path):
    f = tmp_path / "f.txt"
    f.write_text("hello\n")
    eng = Engine()
    eng.update_current_file_content(f)
    assert eng.current_file_content == "hello\n"
    assert eng.current_file_path == f

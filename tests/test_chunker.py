"""Chunker parity tests (boundary rules of reference processor.rs:31-85)."""

from pathlib import Path

import pytest

from sema_tpu.ingest import chunker
from sema_tpu.ingest.chunker import create_chunks


def test_short_content_produces_no_chunks():
    # ref processor.rs:34-36: content < MIN_CHUNK_SIZE (50) → nothing
    assert create_chunks(Path("f.txt"), "x" * 49) == []
    assert create_chunks(Path("f.txt"), "") == []


def test_minimum_content_single_chunk():
    chunks = create_chunks(Path("f.txt"), "x" * 50)
    assert len(chunks) == 1
    assert chunks[0].id == "f.txt:0"
    assert chunks[0].content == "x" * 50
    assert chunks[0].start_line == 1
    assert chunks[0].end_line == 1


def test_exact_window_no_newlines():
    # 2000 bytes, no newlines: first window is [0,1000); since safe_end <
    # len and no '\n', boundary stays at 1000. next start = 900.
    content = "a" * 2000
    chunks = create_chunks(Path("f"), content)
    assert chunks[0].content == "a" * 1000
    assert chunks[1].id == "f:1"
    # windows: [0,1000), [900,1900), [1800,2000), then the overlap backs up
    # into the already-emitted tail and yields [1900,2000) as well — the
    # reference algorithm emits this duplicate tail (processor.rs:72-79).
    assert chunks[1].content == "a" * 1000
    assert chunks[2].content == "a" * 200
    assert chunks[3].content == "a" * 100
    assert len(chunks) == 4


def test_newline_snapping():
    # A newline at byte 500 pulls the first chunk end back to 501.
    content = "b" * 500 + "\n" + "c" * 1500
    chunks = create_chunks(Path("f"), content)
    assert chunks[0].content == "b" * 500 + "\n"
    assert chunks[0].start_line == 1
    assert chunks[0].end_line == 2  # start_line + 1 newline in chunk
    # next start = 501 - 100 = 401
    assert chunks[1].content.startswith("b" * 99 + "\n")
    assert chunks[1].start_line == 1


def test_final_window_reaching_eof_is_not_newline_snapped():
    # ref processor.rs:49: snapping only applies when safe_end < len
    content = "x" * 100 + "\n" + "y" * 100
    chunks = create_chunks(Path("f"), content)
    # First window covers the whole 201-byte file unsnapped; the overlap
    # then backs start up to 101 and emits the 100-byte tail again
    # (processor.rs:72-79).
    assert len(chunks) == 2
    assert chunks[0].content == content
    assert chunks[0].end_line == 2
    assert chunks[1].content == "y" * 100
    assert chunks[1].start_line == 2


def test_utf8_boundary_snapping(monkeypatch):
    # Shrink the window so a multibyte char straddles it.
    monkeypatch.setattr(chunker, "CHUNK_SIZE", 10)
    monkeypatch.setattr(chunker, "OVERLAP_SIZE", 2)
    monkeypatch.setattr(chunker, "MIN_CHUNK_SIZE", 1)
    # "ééééé" = 10 bytes; content "xééééé" puts a é straddling byte 10.
    content = "xé" * 8  # 24 bytes, é at odd byte offsets
    chunks = create_chunks(Path("f"), content)
    for c in chunks:
        c.content.encode("utf-8")  # every chunk decodes cleanly
    # byte 10 falls mid-é (bytes: x é x é x é x... x at 0,3,6,9; é at 1,4,...)
    # content bytes: x(1) é(2) repeated → boundaries at 0,1,3,4,6,7,9,10,12...
    # byte 10 IS a boundary here; check a case where it isn't:
    content2 = "é" * 12  # é = 2 bytes → byte 10 is a boundary; use 3-byte chars
    content3 = "€" * 8   # € = 3 bytes, 24 bytes total; byte 10 is mid-char
    chunks3 = create_chunks(Path("f"), content3)
    assert chunks3[0].content == "€" * 3  # snapped back from 10 to 9
    for c in chunks3:
        c.content.encode("utf-8")


def test_min_size_filter_with_first_chunk_exception(monkeypatch):
    monkeypatch.setattr(chunker, "CHUNK_SIZE", 10)
    monkeypatch.setattr(chunker, "OVERLAP_SIZE", 0)
    monkeypatch.setattr(chunker, "MIN_CHUNK_SIZE", 8)
    # 14 bytes: windows [0,10) and [10,14). Second is 4 < MIN → dropped,
    # but a first window shorter than MIN would be kept (chunk_id == 0).
    content = "0123456789abcd"
    chunks = create_chunks(Path("f"), content)
    assert [c.content for c in chunks] == ["0123456789"]


def test_line_numbers_multiline():
    lines = [f"line {i:03d} " + "-" * 40 for i in range(60)]  # ~50B each
    content = "\n".join(lines) + "\n"
    chunks = create_chunks(Path("f"), content)
    assert chunks[0].start_line == 1
    # reconstruct: every chunk's start_line equals 1 + newlines before it
    data = content.encode()
    for c in chunks:
        idx = data.find(c.content.encode())
        assert idx != -1
        assert c.start_line == data.count(b"\n", 0, idx) + 1
        assert c.end_line == c.start_line + c.content.count("\n")


def test_overlap_advancement_never_stalls(monkeypatch):
    # Pathological: window snaps back to a newline right after start; the
    # next_start <= start guard must force progress (processor.rs:72-77).
    monkeypatch.setattr(chunker, "CHUNK_SIZE", 10)
    monkeypatch.setattr(chunker, "OVERLAP_SIZE", 9)
    monkeypatch.setattr(chunker, "MIN_CHUNK_SIZE", 1)
    content = "a\n" * 50
    chunks = create_chunks(Path("f"), content)
    assert len(chunks) > 0
    # full coverage of the file
    assert "".join(c.content[: len(c.content)] for c in chunks)  # terminates


def test_coverage_invariant():
    # Concatenating chunks with overlap removed reproduces the file.
    content = "".join(f"word{i} " + ("\n" if i % 7 == 0 else "") for i in range(2000))
    chunks = create_chunks(Path("f"), content)
    data = content.encode()
    pos = 0
    for c in chunks:
        b = c.content.encode()
        idx = data.find(b, max(0, pos - 200))
        assert idx != -1 and idx <= pos  # chunks tile with overlap
        pos = max(pos, idx + len(b))
    assert pos == len(data)


def test_process_files_swallows_errors(tmp_path):
    good = tmp_path / "good.txt"
    good.write_text("hello world, " * 10)
    bad = tmp_path / "bad.bin"
    bad.write_bytes(b"\xff\xfe" + b"x" * 100)  # invalid UTF-8 → skipped
    missing = tmp_path / "missing.txt"
    from sema_tpu.ingest.chunker import process_files
    chunks = process_files([good, bad, missing], use_native=False)
    assert all(c.file_path == good for c in chunks)
    # 130-byte file → full window + 100-byte overlap tail
    assert len(chunks) == 2

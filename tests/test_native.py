"""C++ native extension vs the pure-Python oracles — byte-identical outputs.

Skipped when libsema_native.so is not built (make -C native).
"""

import random
import string
from pathlib import Path

import pytest

native = pytest.importorskip("sema_tpu.native")

from sema_tpu.crawl import FileCrawler  # noqa: E402
from sema_tpu.ingest.chunker import process_files  # noqa: E402
from sema_tpu.ingest.hashing import hash_file  # noqa: E402
from sema_tpu.types import CrawlerConfig  # noqa: E402


# -- hashing ----------------------------------------------------------------

def test_hash_parity(tmp_path):
    for size in (0, 5, 1000, 1_048_576, 2_000_001):
        f = tmp_path / f"f{size}"
        f.write_bytes(random.Random(size).randbytes(size))
        assert native.hash_file_native(str(f)) == hash_file(f)


def test_hash_missing_file_raises():
    with pytest.raises(OSError):
        native.hash_file_native("/no/such/file")


# -- chunker -----------------------------------------------------------------

def _random_text(rng, n):
    pieces = []
    total = 0
    while total < n:
        word = "".join(rng.choices(string.ascii_letters + "éü中", k=rng.randint(1, 12)))
        sep = rng.choice([" ", " ", " ", "\n", "\n\n"])
        pieces.append(word + sep)
        total += len(word) + len(sep)
    return "".join(pieces)


def _cmp_chunks(a, b):
    assert len(a) == len(b)
    for x, y in zip(a, b):
        assert x.id == y.id
        assert x.file_path == y.file_path
        assert x.start_line == y.start_line
        assert x.end_line == y.end_line
        assert x.content == y.content


def test_chunker_parity_random_files(tmp_path):
    rng = random.Random(42)
    files = []
    for i, size in enumerate([0, 30, 49, 50, 51, 999, 1000, 1001, 3500,
                              10000, 50000]):
        f = tmp_path / f"t{i}.txt"
        f.write_text(_random_text(rng, size))
        files.append(f)
    py = process_files(files, use_native=False)
    cc = process_files(files, use_native=True)
    _cmp_chunks(cc, py)


def test_chunker_parity_edge_contents(tmp_path):
    cases = {
        "nonewline.txt": "x" * 2500,
        "allnewlines.txt": "\n" * 300,
        "crlf.txt": ("line one\r\n" * 150),
        "exact1000.txt": "a" * 999 + "\n" + "b" * 600,
        "multibyte.txt": "€" * 800,          # 3-byte chars straddling windows
        "mixed.txt": ("héllo wörld 中文 " * 120),
    }
    files = []
    for name, content in cases.items():
        f = tmp_path / name
        f.write_text(content, newline="")
        files.append(f)
    _cmp_chunks(process_files(files, use_native=True),
                process_files(files, use_native=False))


def test_chunker_skips_invalid_utf8(tmp_path):
    bad = tmp_path / "bad.bin"
    bad.write_bytes(b"\xff\xfe" + b"a" * 200)
    good = tmp_path / "good.txt"
    good.write_text("fine content " * 20)
    out = process_files([bad, good], use_native=True)
    assert all(c.file_path == good for c in out)


# -- crawler ------------------------------------------------------------------

def _tree(tmp_path):
    root = tmp_path / "tree"
    (root / "src").mkdir(parents=True)
    (root / "src" / "a.py").write_text("print(1)\n")
    (root / "src" / "b.RS").write_text("fn main() {}\n")
    (root / "noext").write_text("data\n")
    (root / "empty.py").write_text("")
    (root / ".hidden.py").write_text("x\n")
    (root / "big.py").write_text("x" * 5000)
    nm = root / "node_modules"
    nm.mkdir()
    (nm / "dep.py").write_text("y\n")
    (root / ".gitignore").write_text("*.log\nbuild/\n!keep.log\n")
    (root / "x.log").write_text("log\n")
    (root / "keep.log").write_text("keep\n")
    b = root / "build"
    b.mkdir()
    (b / "gen.py").write_text("z\n")
    sub = root / "sub"
    sub.mkdir()
    (sub / ".gitignore").write_text("secret*\n")
    (sub / "secret.py").write_text("s\n")
    (sub / "open.py").write_text("o\n")
    return root


@pytest.mark.parametrize("kw", [
    dict(file_extensions=("py", "rs", "log")),
    dict(file_extensions=("py",), include_hidden=True),
    dict(file_extensions=(), max_file_size=100),
    dict(file_extensions=("py",), ignore_gitignore=False),
    dict(file_extensions=("py", "log"),
         exclude_patterns=("node_modules", "*.log")),
])
def test_crawler_parity(tmp_path, kw):
    root = _tree(tmp_path)
    cfg = CrawlerConfig(**kw)
    py = FileCrawler(cfg).crawl_directory(root, use_native=False)
    cc = FileCrawler(cfg).crawl_directory(root, use_native=True)
    assert [str(p) for p in cc] == [str(p) for p in py]


def test_crawler_parity_default_config(tmp_path):
    root = _tree(tmp_path)
    from sema_tpu.config import GeneralConfig
    g = GeneralConfig()
    cfg = CrawlerConfig(
        max_file_size=g.max_file_size,
        file_extensions=tuple(g.file_extensions),
        exclude_patterns=tuple(g.exclude_patterns),
        ignore_gitignore=g.ignore_gitignore)
    py = FileCrawler(cfg).crawl_directory(root, use_native=False)
    cc = FileCrawler(cfg).crawl_directory(root, use_native=True)
    assert [str(p) for p in cc] == [str(p) for p in py]


def test_crawler_nonexistent_root():
    cfg = CrawlerConfig()
    assert FileCrawler(cfg).crawl_directory("/no/such/dir", use_native=True) == []

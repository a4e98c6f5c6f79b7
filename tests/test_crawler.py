"""Crawler behavior (ref src/crawler/mod.rs)."""

import os
from pathlib import Path

import pytest

from sema_tpu.crawl import FileCrawler
from sema_tpu.types import CrawlerConfig


def crawl(root, **kw):
    cfg = CrawlerConfig(**kw)
    return FileCrawler(cfg).crawl_directory(root, use_native=False)


def make_tree(tmp_path):
    (tmp_path / "a.py").write_text("print('hi')\n")
    (tmp_path / "b.rs").write_text("fn main() {}\n")
    (tmp_path / "noext").write_text("data\n")
    (tmp_path / "empty.py").write_text("")
    (tmp_path / ".hidden.py").write_text("x = 1\n")
    sub = tmp_path / "sub"
    sub.mkdir()
    (sub / "c.md").write_text("# doc\n")
    hid = tmp_path / ".hiddendir"
    hid.mkdir()
    (hid / "d.py").write_text("y = 2\n")
    return tmp_path


def names(files, root):
    return sorted(str(Path(f).relative_to(root)) for f in files)


def test_extension_filter_and_no_ext_rejected(tmp_path):
    make_tree(tmp_path)
    files = crawl(tmp_path, file_extensions=("py", "md"))
    # noext rejected (crawler/mod.rs:88-91); empty.py rejected (size 0,
    # crawler/mod.rs:84); hidden skipped by default (crawler/mod.rs:47)
    assert names(files, tmp_path) == ["a.py", "sub/c.md"]


def test_extension_normalization(tmp_path):
    make_tree(tmp_path)
    # "*.PY" and ".Md" normalize to py/md (crawler/mod.rs:33-37)
    files = crawl(tmp_path, file_extensions=("*.PY", ".Md"))
    assert names(files, tmp_path) == ["a.py", "sub/c.md"]


def test_empty_extension_list_admits_all_nonempty(tmp_path):
    make_tree(tmp_path)
    files = crawl(tmp_path, file_extensions=())
    assert "noext" in names(files, tmp_path)


def test_include_hidden(tmp_path):
    make_tree(tmp_path)
    files = crawl(tmp_path, file_extensions=("py",), include_hidden=True)
    got = names(files, tmp_path)
    assert ".hidden.py" in got and ".hiddendir/d.py" in got


def test_max_file_size(tmp_path):
    (tmp_path / "small.py").write_text("x" * 10)
    (tmp_path / "big.py").write_text("x" * 1000)
    files = crawl(tmp_path, file_extensions=("py",), max_file_size=100)
    assert names(files, tmp_path) == ["small.py"]


def test_exclude_patterns_components(tmp_path):
    nm = tmp_path / "node_modules"
    nm.mkdir()
    (nm / "pkg.js").write_text("module.exports = 1\n")
    (tmp_path / "app.js").write_text("let x = 1\n")
    (tmp_path / "junk.tmp.js").write_text("x\n")
    files = crawl(tmp_path, file_extensions=("js",),
                  exclude_patterns=("node_modules", "junk.*"))
    assert names(files, tmp_path) == ["app.js"]


def test_gitignore_honored(tmp_path):
    (tmp_path / ".gitignore").write_text("*.log\nbuild/\n")
    (tmp_path / "keep.log").write_text("nope\n")  # wait: ignored
    (tmp_path / "main.py").write_text("x\n")
    b = tmp_path / "build"
    b.mkdir()
    (b / "out.py").write_text("y\n")
    files = crawl(tmp_path, file_extensions=("py", "log"), ignore_gitignore=True)
    assert names(files, tmp_path) == ["main.py"]


def test_gitignore_disabled(tmp_path):
    (tmp_path / ".gitignore").write_text("*.py\n")
    (tmp_path / "main.py").write_text("x\n")
    files = crawl(tmp_path, file_extensions=("py",), ignore_gitignore=False)
    assert names(files, tmp_path) == ["main.py"]


def test_nested_gitignore_negation(tmp_path):
    (tmp_path / ".gitignore").write_text("*.gen\n")
    sub = tmp_path / "sub"
    sub.mkdir()
    (sub / ".gitignore").write_text("!keep.gen\n")
    (tmp_path / "top.gen").write_text("a\n")
    (sub / "keep.gen").write_text("b\n")
    (sub / "drop.gen").write_text("c\n")
    files = crawl(tmp_path, file_extensions=("gen",))
    assert names(files, tmp_path) == ["sub/keep.gen"]


def test_symlinks_not_followed_by_default(tmp_path):
    target = tmp_path / "real.py"
    target.write_text("x = 1\n")
    link = tmp_path / "link.py"
    os.symlink(target, link)
    files = crawl(tmp_path, file_extensions=("py",))
    assert names(files, tmp_path) == ["real.py"]


def test_symlinks_followed_with_cycle_protection(tmp_path):
    d = tmp_path / "d"
    d.mkdir()
    (d / "f.py").write_text("x\n")
    os.symlink(d, tmp_path / "dlink")
    os.symlink(tmp_path, d / "cycle")  # cycle back to root
    files = crawl(tmp_path, file_extensions=("py",), follow_symlinks=True)
    # terminates, finds f.py via at least one path
    assert any(str(f).endswith("f.py") for f in files)


def test_deterministic_order(tmp_path):
    for n in ("z.py", "a.py", "m.py"):
        (tmp_path / n).write_text("x\n")
    files = crawl(tmp_path, file_extensions=("py",))
    assert files == sorted(files)


# -- round-3 review-fix regressions (both backends where applicable) --------

BACKENDS = [False]
try:
    import sema_tpu.native  # noqa: F401
    BACKENDS.append(True)
except ImportError:
    pass


def crawl2(root, native, **kw):
    cfg = CrawlerConfig(**kw)
    return FileCrawler(cfg).crawl_directory(root, use_native=native)


@pytest.mark.parametrize("native", BACKENDS)
def test_ancestor_gitignore_honored(tmp_path, native):
    """Indexing repo/src still honors repo/.gitignore (the ignore
    crate's parents(true) default)."""
    (tmp_path / ".git").mkdir()
    (tmp_path / ".gitignore").write_text("*.log\nbuild/\n")
    src = tmp_path / "src"
    (src / "build").mkdir(parents=True)
    (src / "keep.py").write_text("x = 1\n" * 10)
    (src / "debug.log").write_text("log line\n" * 10)
    (src / "build" / "gen.py").write_text("y = 2\n" * 10)
    got = names(crawl2(src, native), src)
    assert got == ["keep.py"]


@pytest.mark.parametrize("native", BACKENDS)
def test_ancestor_gitignore_stops_at_repo_boundary(tmp_path, native):
    """A .gitignore ABOVE the repository boundary (.git) is not
    consulted."""
    (tmp_path / ".gitignore").write_text("*.py\n")   # outside the repo
    repo = tmp_path / "repo"
    repo.mkdir()
    (repo / ".git").mkdir()
    (repo / "keep.py").write_text("x = 1\n" * 10)
    got = names(crawl2(repo, native), repo)
    assert got == ["keep.py"]


@pytest.mark.parametrize("native", BACKENDS)
def test_gitignore_backslash_escapes(tmp_path, native):
    r"""'\#notes.txt' ignores the literal file '#notes.txt' (git
    escape semantics); previously the rule could never match."""
    (tmp_path / ".gitignore").write_text("\\#notes.txt\n\\!bang.py\n")
    (tmp_path / "#notes.txt").write_text("note " * 20)
    (tmp_path / "!bang.py").write_text("x = 1\n" * 10)
    (tmp_path / "keep.txt").write_text("keep " * 20)
    got = names(crawl2(tmp_path, native), tmp_path)
    assert got == ["keep.txt"]


@pytest.mark.parametrize("native", BACKENDS)
def test_sibling_symlinks_both_indexed(tmp_path, native):
    """Two non-cyclic paths to one directory index it under BOTH paths
    (ancestor-chain cycle breaking, not global inode dedup)."""
    target = tmp_path / "target"
    target.mkdir()
    (target / "f.py").write_text("x = 1\n" * 10)
    os.symlink(target, tmp_path / "s1")
    os.symlink(target, tmp_path / "s2")
    got = names(crawl2(tmp_path, native, follow_symlinks=True), tmp_path)
    assert got == ["s1/f.py", "s2/f.py", "target/f.py"]


@pytest.mark.parametrize("native", BACKENDS)
def test_symlink_cycle_still_broken(tmp_path, native):
    d = tmp_path / "d"
    d.mkdir()
    (d / "f.py").write_text("x = 1\n" * 10)
    os.symlink(tmp_path, d / "loop")
    got = names(crawl2(tmp_path, native, follow_symlinks=True), tmp_path)
    assert got == ["d/f.py"]


@pytest.mark.parametrize("native", BACKENDS)
def test_exclude_glob_does_not_cross_slash(tmp_path, native):
    """'docs/*.md' excludes only one level deep — fnmatch's '*'
    crossed '/' and silently dropped whole subtrees."""
    docs = tmp_path / "docs"
    (docs / "api").mkdir(parents=True)
    (docs / "top.md").write_text("top " * 20)
    (docs / "api" / "deep.md").write_text("deep " * 20)
    got = names(crawl2(tmp_path, native, exclude_patterns=("docs/*.md",)),
                tmp_path)
    assert got == ["docs/api/deep.md"]


def test_deep_tree_no_recursion_error(tmp_path):
    """~1200-deep tree: the pure-Python walk must not hit Python's
    recursion limit (the reference's walker is iterative)."""
    d = tmp_path
    for i in range(1200):
        d = d / "n"
        d.mkdir()
    (d / "leaf.py").write_text("x = 1\n" * 10)
    got = crawl(tmp_path)
    assert len(got) == 1 and got[0].name == "leaf.py"

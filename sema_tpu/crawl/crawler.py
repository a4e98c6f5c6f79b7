"""Gitignore-aware directory crawler.

Parity with the reference's ``src/crawler/mod.rs``:

- honors per-directory ``.gitignore`` files when ``ignore_gitignore=True``
  (the flag *enables* gitignore filtering — it feeds
  ``WalkBuilder::git_ignore`` directly, crawler/mod.rs:50);
- skips hidden entries (dotfiles/dirs) unless ``include_hidden``
  (crawler/mod.rs:47);
- does not cross filesystem boundaries (``same_file_system(true)``,
  crawler/mod.rs:51);
- symlinks are not followed unless ``follow_symlinks``; when following,
  cycles are broken by (st_dev, st_ino) ancestor tracking
  (crawler/mod.rs:46);
- keeps only regular files with 0 < size <= max_file_size
  (crawler/mod.rs:84-86);
- extension allow-list: each configured extension is normalized by stripping
  ``*.``/``.`` prefixes and lowercasing; files with no extension are rejected
  whenever the list is non-empty (crawler/mod.rs:28-42, 88-100);
- exclude patterns: the reference *intends* to exclude its configured
  patterns but passes them to ``WalkBuilder::add_ignore`` as file *paths*
  (crawler/mod.rs:53-55), which silently does nothing. We implement the
  intent: a path is excluded when any path component — or the root-relative
  path — glob-matches a pattern.

Results are returned in sorted order for determinism (the reference's walk
order is unspecified).

The C++ native backend (sema_tpu/native) implements the same walk with
parallel directory listing; used automatically when built.
"""

from __future__ import annotations

import fnmatch
import os
from pathlib import Path
from typing import List, Optional, Set, Tuple

from sema_tpu.crawl.gitignore import GitignoreMatcher, GitignoreStack
from sema_tpu.types import CrawlerConfig


def _normalize_extensions(extensions) -> Optional[Set[str]]:
    """Ref crawler/mod.rs:28-42: strip '*.'/'.' prefixes, lowercase."""
    if not extensions:
        return None
    out = set()
    for ext in extensions:
        e = ext
        if e.startswith("*."):
            e = e[2:]
        e = e.lstrip(".")
        out.add(e.lower())
    return out


class FileCrawler:
    def __init__(self, config: CrawlerConfig):
        self.config = config
        self._extensions = _normalize_extensions(config.file_extensions)
        self._exclude = list(config.exclude_patterns)

    def crawl_directory(self, root_path: Path | str,
                        use_native: Optional[bool] = None) -> List[Path]:
        """Walk ``root_path`` and return the files to index, sorted."""
        root = Path(root_path)
        if use_native is not False:
            try:
                from sema_tpu.native import crawl_native
            except ImportError:
                if use_native:
                    raise
            else:
                return [Path(p) for p in crawl_native(str(root), self.config)]
        return self._crawl_python(root)

    # -- pure-Python walk ---------------------------------------------------

    def _excluded(self, rel_path: str, name: str) -> bool:
        for pattern in self._exclude:
            if fnmatch.fnmatch(name, pattern) or fnmatch.fnmatch(rel_path, pattern):
                return True
            if "/" not in pattern:
                for part in rel_path.split("/"):
                    if fnmatch.fnmatch(part, pattern):
                        return True
        return False

    def _crawl_python(self, root: Path) -> List[Path]:
        cfg = self.config
        files: List[Path] = []
        try:
            root_dev = root.stat().st_dev
        except OSError:
            return files

        stack = GitignoreStack()
        visited_dirs: Set[Tuple[int, int]] = set()

        def walk(dir_path: Path, dir_rel: str) -> None:
            if cfg.follow_symlinks:
                try:
                    st = dir_path.stat()
                except OSError:
                    return
                key = (st.st_dev, st.st_ino)
                if key in visited_dirs:
                    return
                visited_dirs.add(key)

            stack.pop_to(dir_rel)
            if cfg.ignore_gitignore:
                gi = dir_path / ".gitignore"
                try:
                    if gi.is_file():
                        stack.push(dir_rel, GitignoreMatcher(
                            gi.read_text(errors="replace").splitlines()))
                except OSError:
                    pass

            try:
                entries = sorted(os.scandir(dir_path), key=lambda e: e.name)
            except OSError:
                return

            for entry in entries:
                name = entry.name
                rel = f"{dir_rel}/{name}" if dir_rel else name
                if not cfg.include_hidden and name.startswith("."):
                    continue
                if self._excluded(rel, name):
                    continue
                try:
                    is_symlink = entry.is_symlink()
                    is_dir = entry.is_dir(follow_symlinks=cfg.follow_symlinks)
                    is_file = entry.is_file(follow_symlinks=cfg.follow_symlinks)
                except OSError:
                    continue
                if is_symlink and not cfg.follow_symlinks:
                    # ignore-crate behavior: unfollowed symlinks are yielded
                    # but fail metadata.is_file() → dropped (crawler/mod.rs:84)
                    continue
                if is_dir:
                    if cfg.ignore_gitignore and stack.ignored(rel, is_dir=True):
                        continue
                    try:
                        if entry.stat(follow_symlinks=cfg.follow_symlinks).st_dev != root_dev:
                            continue  # same_file_system(true)
                    except OSError:
                        continue
                    walk(Path(entry.path), rel)
                    stack.pop_to(dir_rel)
                elif is_file:
                    if cfg.ignore_gitignore and stack.ignored(rel, is_dir=False):
                        continue
                    try:
                        size = entry.stat(follow_symlinks=cfg.follow_symlinks).st_size
                    except OSError:
                        continue
                    if size == 0 or size > cfg.max_file_size:
                        continue
                    if self._extensions is not None:
                        dot = name.rfind(".")
                        if dot <= 0:
                            continue
                        if name[dot + 1:].lower() not in self._extensions:
                            continue
                    files.append(Path(entry.path))

        walk(root, "")
        return sorted(files)

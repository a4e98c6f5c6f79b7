"""Config defaults, persistence, and CLI override precedence
(ref src/config/mod.rs, src/main.rs:31-59)."""

import argparse

from sema_tpu.config import (
    Config, ConfigManager, GeneralConfig,
    DEFAULT_FILE_EXTENSIONS, DEFAULT_EXCLUDE_PATTERNS,
    apply_cli_overrides, dumps_toml, loads_toml,
)


def test_defaults_match_reference():
    g = GeneralConfig()
    assert g.max_file_size == 10_485_760            # config/mod.rs:29
    assert len(g.file_extensions) == 71             # config/mod.rs:30-102
    assert g.file_extensions[0] == "rs"
    assert g.file_extensions[-1] == "tsv"
    assert g.exclude_patterns == [
        ".git", "target", "node_modules", ".cache", "*.tmp", "*.log"]
    assert g.follow_symlinks is False
    assert g.include_hidden is False
    assert g.ignore_gitignore is True               # config/mod.rs:113


def test_toml_roundtrip():
    cfg = Config()
    cfg.general.max_file_size = 123
    cfg.general.file_extensions = ["py", "md"]
    cfg.model.name = "e5-base"
    cfg.mesh.shape = [2, 4]
    loaded = loads_toml(dumps_toml(cfg))
    assert loaded.general.max_file_size == 123
    assert loaded.general.file_extensions == ["py", "md"]
    assert loaded.model.name == "e5-base"
    assert loaded.mesh.shape == [2, 4]


def test_create_on_first_run(tmp_home):
    mgr = ConfigManager()
    mgr.init()
    assert mgr.config_file.exists()
    cfg = mgr.load_config()
    assert cfg.general.max_file_size == 10_485_760


def test_load_writes_defaults_when_missing(tmp_home):
    mgr = ConfigManager()
    cfg = mgr.load_config()  # ref config/mod.rs:149-154
    assert mgr.config_file.exists()
    assert cfg.general.ignore_gitignore is True


def test_unknown_keys_ignored():
    cfg = loads_toml("[general]\nmax_file_size = 5\nbogus = 1\n[extra]\nz = 2")
    assert cfg.general.max_file_size == 5


def _args(**kw):
    ns = argparse.Namespace(
        max_file_size=None, include_hidden=False, follow_symlinks=False,
        ignore_gitignore=False, extensions=None, exclude=None, model=None)
    for k, v in kw.items():
        setattr(ns, k, v)
    return ns


def test_cli_overrides_extensions_replace():
    # ref main.rs:48-50: --extensions replaces the defaults entirely
    cfg = apply_cli_overrides(Config(), _args(extensions=["zig"]))
    assert cfg.general.file_extensions == ["zig"]


def test_cli_overrides_exclude_appends_dedup():
    # ref main.rs:52-58: --exclude appends, skipping duplicates
    cfg = apply_cli_overrides(Config(), _args(exclude=["dist", ".git"]))
    assert cfg.general.exclude_patterns == DEFAULT_EXCLUDE_PATTERNS + ["dist"]


def test_cli_overrides_flags():
    cfg = apply_cli_overrides(Config(), _args(
        max_file_size=42, include_hidden=True, follow_symlinks=True,
        ignore_gitignore=True))
    assert cfg.general.max_file_size == 42
    assert cfg.general.include_hidden is True
    assert cfg.general.follow_symlinks is True
    assert cfg.general.ignore_gitignore is True


def test_cli_no_overrides_is_identity():
    cfg = apply_cli_overrides(Config(), _args())
    assert cfg.general.max_file_size == 10_485_760
    assert cfg.general.file_extensions == DEFAULT_FILE_EXTENSIONS

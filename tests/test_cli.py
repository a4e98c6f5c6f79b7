"""CLI integration: headless index + query end-to-end (SURVEY.md §4
integration tier), on CPU with the tiny test encoder."""

import json
from pathlib import Path

import pytest

from sema_tpu import cli


@pytest.fixture()
def fixture_tree(tmp_path):
    root = tmp_path / "tree"
    root.mkdir()
    (root / "parser.py").write_text(
        "def parse_expression(tokens):\n"
        "    '''Parse arithmetic expressions into an AST.'''\n"
        "    return build_tree(tokens)\n" * 4)
    (root / "net.md").write_text(
        "# HTTP networking\nRetry logic with exponential backoff.\n" * 4)
    (root / ".gitignore").write_text("*.log\n")
    (root / "noise.log").write_text("should not be indexed " * 10)
    return root


@pytest.fixture()
def cli_env(tmp_home, monkeypatch):
    # tiny model keeps the test fast; hash tokenizer (no vocab on disk)
    monkeypatch.setattr(
        cli, "load_config", _tiny_config_loader(cli.load_config))
    return tmp_home


def _tiny_config_loader(orig):
    def load(args):
        config = orig(args)
        config.model.name = "test-tiny"
        config.model.max_length = 32
        config.model.batch_size = 8
        return config
    return load


def test_parse_args_default_is_tui():
    args = cli.parse_args(["/some/dir", "--include-hidden"])
    assert args.command == "tui"
    assert args.directory == "/some/dir"
    assert args.include_hidden is True


def test_parse_args_subcommands():
    args = cli.parse_args(["index", ".", "--reindex"])
    assert args.command == "index" and args.reindex
    args = cli.parse_args(["query", "hello", "--limit", "5", "--json"])
    assert args.command == "query" and args.limit == 5


def test_resolve_directory_errors(tmp_path):
    args = cli.parse_args(["index", str(tmp_path / "ghost")])
    with pytest.raises(SystemExit, match="does not exist"):
        cli.resolve_directory(args)
    f = tmp_path / "afile"
    f.write_text("x")
    args = cli.parse_args(["index", str(f)])
    with pytest.raises(SystemExit, match="is not a directory"):
        cli.resolve_directory(args)


def test_index_then_query_roundtrip(cli_env, fixture_tree, capsys):
    rc = cli.main(["index", str(fixture_tree)])
    assert rc == 0
    out = capsys.readouterr().out
    assert "crawled 2 files" in out
    assert "indexed" in out

    # keyword query through the full CLI path
    rc = cli.main(["query", "'backoff", "--json"])
    assert rc == 0
    lines = [json.loads(l) for l in capsys.readouterr().out.splitlines()]
    assert lines
    assert all("net.md" in r["file_path"] for r in lines)
    assert all(r["score"] > 0 for r in lines)

    # semantic query (random weights — just verify mechanics + shape)
    rc = cli.main(["query", "parse expressions", "--limit", "3"])
    out = capsys.readouterr().out
    assert rc == 0
    assert out.strip()  # some results printed


def test_incremental_second_index(cli_env, fixture_tree, capsys):
    cli.main(["index", str(fixture_tree)])
    capsys.readouterr()
    cli.main(["index", str(fixture_tree)])
    out = capsys.readouterr().out
    assert "indexed 0 chunks" in out


def test_reindex_flag_wipes(cli_env, fixture_tree, capsys):
    cli.main(["index", str(fixture_tree)])
    capsys.readouterr()
    cli.main(["index", str(fixture_tree), "--reindex"])
    out = capsys.readouterr().out
    assert "indexed 0 chunks" not in out  # everything re-indexed


def test_query_group_flag(cli_env, fixture_tree, capsys):
    cli.main(["index", str(fixture_tree)])
    capsys.readouterr()
    cli.main(["query", "'networking", "--group"])
    out = capsys.readouterr().out
    # grouped: one row for net.md (+N more)
    assert out.count("net.md") == 1

"""Command-line interface.

Flag parity with the reference's clap parser (src/cli/args.rs:10-46):
positional directory + --max-file-size --include-hidden --follow-symlinks
--extensions --exclude --ignore-gitignore. Config loading and override
precedence mirror src/main.rs:21-59; directory resolution (canonicalize,
must-be-dir errors) mirrors src/main.rs:61-86.

Beyond the reference (which is TUI-only, SURVEY.md §1 notes): headless
subcommands —

    sema-tpu [DIR] [flags]          crawl+index+TUI (reference behavior)
    sema-tpu index [DIR] [flags]    headless index build
    sema-tpu query "text" [flags]   headless query ('-prefix = keyword)
    sema-tpu bench [flags]          performance benchmark
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path
from typing import List, Optional

from sema_tpu.config import (Config, ConfigManager, apply_cli_overrides,
                             data_dir)
from sema_tpu.types import CrawlerConfig

SUBCOMMANDS = {"index", "query", "tui", "bench", "serve", "doctor"}


def _add_crawl_flags(p: argparse.ArgumentParser) -> None:
    p.add_argument("directory", nargs="?", help="Directory path to crawl")
    p.add_argument("--max-file-size", type=int, default=None,
                   help="Maximum file size to process (in bytes)")
    p.add_argument("--include-hidden", action="store_true",
                   help="Include hidden files in crawling")
    p.add_argument("--follow-symlinks", action="store_true",
                   help="Follow symbolic links")
    p.add_argument("--extensions", type=lambda s: s.split(","), default=None,
                   help="File extensions to crawl (comma-separated). "
                        "When specified, ignores default extensions.")
    p.add_argument("--exclude", type=lambda s: s.split(","), default=None,
                   help="Additional patterns to exclude (comma-separated)")
    p.add_argument("--ignore-gitignore", action="store_true",
                   help="Ignore files and patterns listed in .gitignore files")


def _add_model_flags(p: argparse.ArgumentParser) -> None:
    p.add_argument("--model", default=None,
                   help="Encoder model (minilm-l6, bge-small-en, e5-base, "
                        "gte-large)")
    p.add_argument("--weights", default=None,
                   help="Local safetensors dir for encoder weights")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="sema-tpu",
        description="Semantic File Search — TPU-native semantic + keyword "
                    "search in local files")
    # version parity with the reference's clap metadata (cli/args.rs:9)
    from sema_tpu import __version__
    p.add_argument("--version", action="version",
                   version=f"sema-tpu {__version__}")
    sub = p.add_subparsers(dest="command")

    tui = sub.add_parser("tui", help="interactive TUI (default)")
    _add_crawl_flags(tui)
    _add_model_flags(tui)

    index = sub.add_parser("index", help="build/update the index headlessly")
    _add_crawl_flags(index)
    _add_model_flags(index)
    index.add_argument("--reindex", action="store_true",
                       help="Discard the existing index first")
    index.add_argument("--stats", action="store_true",
                       help="Print per-stage timing JSON")

    query = sub.add_parser("query", help="run one query against the index")
    query.add_argument("text", help="query text; prefix with ' for keyword "
                                    "(BM25) search")
    query.add_argument("--limit", type=int, default=50,
                       help="max results (default 50)")
    query.add_argument("--json", action="store_true", help="JSON output")
    query.add_argument("--group", action="store_true",
                       help="group results by file (TUI behavior)")
    query.add_argument("--trace", metavar="DIR", default=None,
                       help="capture a jax.profiler trace into DIR")
    _add_model_flags(query)

    bench = sub.add_parser("bench", help="run the standard benchmark")
    bench.add_argument("--config", default="minilm-10k",
                       help="benchmark config name")
    _add_model_flags(bench)

    serve = sub.add_parser("serve", help="HTTP search daemon over the index")
    _add_crawl_flags(serve)
    serve.add_argument("--host", default="127.0.0.1")
    serve.add_argument("--port", type=int, default=7700)
    serve.add_argument("--reindex-interval", type=float, default=0,
                       metavar="SECONDS",
                       help="re-crawl the directory and incrementally "
                            "index changed files every N seconds while "
                            "serving (0 = off)")
    _add_model_flags(serve)

    doctor = sub.add_parser(
        "doctor", help="environment + semantic-quality self-check")
    _add_model_flags(doctor)
    doctor.add_argument("--skip-quality", action="store_true",
                        help="only report environment, skip the canned-"
                             "corpus retrieval gate")

    return p


def parse_args(argv: Optional[List[str]] = None) -> argparse.Namespace:
    argv = list(sys.argv[1:] if argv is None else argv)
    # reference behavior: bare `sema-tpu [DIR] [flags]` runs the TUI
    passthrough = ("-h", "--help", "--version")
    if not argv or (argv[0] not in SUBCOMMANDS
                    and argv[0] not in passthrough):
        argv = ["tui"] + argv
    return build_parser().parse_args(argv)


def load_config(args) -> Config:
    """main.rs:21-29: init-on-first-run, then CLI overrides in memory."""
    manager = ConfigManager()
    manager.init()
    config = manager.load_config()
    if getattr(args, "weights", None):
        config.model.weights_path = args.weights
    return apply_cli_overrides(config, args)


def resolve_directory(args) -> Path:
    """main.rs:61-86: default cwd, canonicalize, must be a directory."""
    target = Path(getattr(args, "directory", None) or os.getcwd())
    try:
        canonical = target.resolve(strict=True)
    except OSError:
        sys.exit(f"Error: Directory '{target}' does not exist or cannot be "
                 f"accessed")
    if not canonical.is_dir():
        sys.exit(f"Error: '{canonical}' is not a directory")
    return canonical


def crawler_config(config: Config) -> CrawlerConfig:
    g = config.general
    return CrawlerConfig(
        max_file_size=g.max_file_size,
        follow_symlinks=g.follow_symlinks,
        include_hidden=g.include_hidden,
        file_extensions=tuple(g.file_extensions),
        exclude_patterns=tuple(g.exclude_patterns),
        ignore_gitignore=g.ignore_gitignore)


def make_index_manager(config: Config, metrics=None):
    from sema_tpu.index import IndexManager
    from sema_tpu.models import Encoder
    from sema_tpu.parallel.mesh import default_mesh

    if metrics is None and os.environ.get("SEMA_TPU_LOG"):
        from sema_tpu.utils.metrics import Metrics
        metrics = Metrics(log_stream=open(
            os.environ["SEMA_TPU_LOG"], "a", buffering=1))

    model_axis = config.mesh.model_axis or None
    slice_axis = config.mesh.slice_axis or None
    if model_axis or slice_axis:
        # extra mesh axes: "model" = tensor parallelism for the encoder's
        # weight shards (the store's arrays replicate across it via
        # their PartitionSpecs); "slice" = multislice DCN axis, OUTERMOST
        # so store row blocks are slice-major (the two-level merge's
        # shard-id arithmetic assumes that). One mesh serves every
        # program.
        from sema_tpu.parallel.mesh import make_mesh
        axes = ([slice_axis] if slice_axis else []) \
            + [config.mesh.data_axis] \
            + ([model_axis] if model_axis else []) \
            + [config.mesh.index_axis]
        if len(config.mesh.shape) != len(axes):
            raise SystemExit(
                f"[mesh] model_axis/slice_axis require an explicit "
                f"{len(axes)}-entry shape ({' x '.join(axes)}), e.g. "
                f"shape = {[1] * (len(axes) - 1) + [8]} on 8 chips")
        mesh = make_mesh(shape=config.mesh.shape, axis_names=tuple(axes))
    elif config.mesh.shape:
        from sema_tpu.parallel.mesh import make_mesh
        mesh = make_mesh(shape=config.mesh.shape,
                         axis_names=(config.mesh.data_axis,
                                     config.mesh.index_axis))
    else:
        mesh = default_mesh()
    encoder = Encoder.from_config(config.model, mesh=mesh,
                                  data_axis="index",
                                  model_axis=model_axis)
    if encoder.weights_source == "random":
        print("Warning: no weights for model "
              f"{config.model.name!r} (auto-fetch from the HF hub failed "
              "or was disabled); using random init (rankings will be "
              "meaningless). Pass --weights, populate the HF cache, or "
              "run on a networked machine.", file=sys.stderr)
    return IndexManager(
        data_dir(), encoder, store_dtype=config.index.store_dtype,
        mesh=mesh, slice_axis=slice_axis,
        metrics=metrics, rescore_k=config.index.rescore_k,
        hbm_budget_mb=config.index.hbm_budget_mb,
        ivf=config.index.ivf, ivf_nprobe=config.index.ivf_nprobe,
        ivf_min_recall=config.index.ivf_min_recall)


def cmd_index(args) -> int:
    from sema_tpu.crawl import FileCrawler
    from sema_tpu.utils.metrics import Metrics

    config = load_config(args)
    directory = resolve_directory(args)

    if args.reindex:
        import shutil
        for sub in ("vector_index", "text_index"):
            shutil.rmtree(data_dir() / sub, ignore_errors=True)

    metrics = Metrics()
    t0 = time.perf_counter()
    with metrics.timer("crawl"):
        files = FileCrawler(crawler_config(config)).crawl_directory(directory)
    print(f"crawled {len(files)} files")

    mgr = make_index_manager(config, metrics=metrics)

    def progress(stage, done, total):
        if total:
            print(f"\r{stage}: {done}/{total}", end="", file=sys.stderr)
            if done == total:
                print(file=sys.stderr)

    n = mgr.process_and_index_files(files, progress=progress,
                                    purge_missing_under=directory)
    mgr.close()
    dt = time.perf_counter() - t0
    print(f"indexed {n} chunks in {dt:.1f}s "
          f"({mgr.vector_store.live_rows} live vectors)")
    if args.stats:
        print(json.dumps(metrics.report(), indent=2))
    return 0


def cmd_query(args) -> int:
    import contextlib

    config = load_config(args)
    mgr = make_index_manager(config)
    tracer = contextlib.nullcontext()
    if getattr(args, "trace", None):
        from sema_tpu.utils.metrics import trace
        tracer = trace(args.trace)
    t0 = time.perf_counter()
    with tracer:
        results = mgr.search(args.text, args.limit)
    dt = time.perf_counter() - t0

    if args.group:
        from sema_tpu.search.engine import group_results_by_file
        from sema_tpu.types import SearchResult
        grouped = group_results_by_file(
            [SearchResult(chunk=c, score=s) for c, s in results])
        results = [(g.chunk, g.score) for g in grouped]
        counts = {str(g.chunk.file_path): g.total_matches_in_file
                  for g in grouped}

    if args.json:
        for chunk, score in results:
            print(json.dumps({
                "id": chunk.id, "file_path": str(chunk.file_path),
                "start_line": chunk.start_line, "end_line": chunk.end_line,
                "score": score,
                "content": chunk.content}))
    else:
        if not results:
            print("no results")
        for chunk, score in results:
            loc = f"{chunk.file_path}:L{chunk.start_line}-{chunk.end_line}"
            extra = (f"  (+{counts[str(chunk.file_path)] - 1} more)"
                     if args.group and counts.get(str(chunk.file_path), 1) > 1
                     else "")
            print(f"{score:8.4f}  {loc}{extra}")
        print(f"-- {len(results)} results in {dt * 1e3:.1f} ms",
              file=sys.stderr)
    return 0


def cmd_tui(args) -> int:
    from sema_tpu.tui.app import run_app
    config = load_config(args)
    directory = resolve_directory(args)
    return run_app(directory, config)


def cmd_bench(args) -> int:
    import bench as bench_mod  # repo-root bench.py drives the same path
    return bench_mod.run(config_name=args.config)


def _apply_platform_override() -> None:
    """Honor SEMA_TPU_PLATFORM=cpu|tpu. JAX_PLATFORMS alone is not enough on
    hosts whose TPU plugin pins the platform; the config flag wins if set
    before the first backend initialization."""
    platform = os.environ.get("SEMA_TPU_PLATFORM")
    if platform:
        import jax
        jax.config.update("jax_platforms", platform)


def cmd_doctor(args) -> int:
    """Self-check: environment, weight resolution, semantic quality.

    The quality gate (sema_tpu/quality.py) is the runnable proof of the
    capability the reference gets from its HF download
    (embeddings.rs:93-103): with real weights it must rank every canned
    paraphrase query's document at position 1.
    """
    import jax

    from sema_tpu.models import Encoder

    config = load_config(args)
    print(f"jax backend      : {jax.default_backend()} "
          f"({jax.device_count()} device(s))")
    try:
        import sema_tpu.native.bindings  # noqa: F401
        print("native extension : built (crawler/chunker/xxh3/BM25 in C++)")
    except ImportError:
        print("native extension : NOT built — run `make -C native` "
              "(pure-Python fallbacks active)")

    encoder = Encoder.from_config(config.model)
    print(f"model            : {encoder.spec.name} "
          f"({encoder.spec.dim}-d, {encoder.spec.num_layers} layers)")
    print(f"weights          : {encoder.weights_source}")
    print(f"tokenizer        : {encoder.tokenizer_source}")

    # device numeric self-test: planted-winner scans (all three backends'
    # real store/search paths) + encoder-vs-XLA-f32 cosine, run on the
    # ATTACHED backend — CPU-green suites can't see hardware-only fusion
    # bugs (sema_tpu/selftest.py docstring has the round-3 case study)
    from sema_tpu.selftest import run_device_selftest
    selftest_ok = True
    for name, ok, detail in run_device_selftest(
            config.model, dim=encoder.spec.dim, encoder=encoder):
        selftest_ok &= ok
        print(f"device {name:<15}: {'ok' if ok else 'FAIL'} — {detail}")

    if args.skip_quality:
        return 0 if selftest_ok else 1
    from sema_tpu.quality import run_quality_gate
    report = run_quality_gate(encoder)
    if not report.ran:
        print(f"quality gate     : SKIPPED — {report.reason}")
        return 1
    print(f"quality gate     : {report.correct_at_1}/{report.total} "
          f"queries ranked their document #1")
    for query, expected, got in report.failures:
        print(f"  MISS  {query!r}: expected {expected}, got {got}")
    if report.fixture_min_cosine is not None:
        print(f"fixture vectors  : {report.fixture_checked} checked, "
              f"min cosine {report.fixture_min_cosine:.6f} "
              f"(gate ≥ 0.999)")
    else:
        print("fixture vectors  : no fixture file (generate with "
              "tools/fetch_weights.py --make-fixtures)")
    passed = report.passed and selftest_ok
    print(f"RESULT           : {'PASS' if passed else 'FAIL'}")
    return 0 if passed else 1


def cmd_serve(args) -> int:
    from sema_tpu.search.http_server import serve_forever
    config = load_config(args)
    mgr = make_index_manager(config)

    stop = None
    if args.reindex_interval > 0:
        # streaming re-index while serving: the store's arena tail makes
        # appends O(batch) device work and searches are lock-free on a
        # bucket snapshot; the text index serializes mutations behind
        # its own lock. Same pattern the serving load test stresses
        # (tools/load_test.py, BASELINE config 5).
        import threading
        from sema_tpu.crawl import FileCrawler
        directory = resolve_directory(args)
        stop = threading.Event()

        def reindex_loop():
            while not stop.wait(args.reindex_interval):
                try:
                    files = FileCrawler(
                        crawler_config(config)).crawl_directory(directory)
                    n = mgr.process_and_index_files(
                        files, purge_missing_under=directory)
                    if n:
                        print(f"re-indexed {n} chunks "
                              f"({mgr.vector_store.live_rows} live)",
                              file=sys.stderr)
                except Exception as e:  # noqa: BLE001 — keep serving
                    print(f"re-index failed: {e}", file=sys.stderr)

        threading.Thread(target=reindex_loop, daemon=True,
                         name="reindex").start()
        print(f"re-indexing {directory} every "
              f"{args.reindex_interval:g}s", file=sys.stderr)
    try:
        serve_forever(mgr, host=args.host, port=args.port)
    finally:
        if stop is not None:
            stop.set()
    return 0


def main(argv: Optional[List[str]] = None) -> int:
    args = parse_args(argv)
    _apply_platform_override()
    from sema_tpu.utils.jaxcache import enable as enable_comp_cache
    enable_comp_cache()
    cmd = {"index": cmd_index, "query": cmd_query, "tui": cmd_tui,
           "bench": cmd_bench, "serve": cmd_serve,
           "doctor": cmd_doctor}[args.command or "tui"]
    return cmd(args)


if __name__ == "__main__":
    sys.exit(main())

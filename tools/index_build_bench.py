"""End-to-end index-build throughput (BASELINE config 3's build claim).

The BASELINE target "index 1M chunks (768-d) in <5 min on v5e-8" has an
encoder-rate proxy in bench.py but was never measured through the REAL
build pipeline: crawl → chunk (C++) → hash → tokenize → length-bucketed
device embedding → dual-index write (device vector segments + disk text
segments). This tool generates a synthetic source tree, runs
``IndexManager.process_and_index_files`` end-to-end, and reports
chunks/sec plus the per-stage breakdown from the manager's metrics.

Single-chip numbers extrapolate linearly to a v5e-8 data-parallel mesh
for the embed stage (the dominant device cost); host stages (chunk,
tokenize, text-index) are per-host. Prints ONE JSON line.

Usage: python tools/index_build_bench.py --chunks 50000 [--model minilm-l6]
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

_LOREM = ("the quick brown fox jumps over the lazy dog while the "
          "crawler walks directory trees and the chunker splits byte "
          "windows on newline boundaries before the encoder embeds "
          "them into the device resident store for exact retrieval ")


def build_tree(root: Path, n_chunks: int) -> int:
    """~1000-byte chunks, a few dozen chunks per file (chunker windows
    are 1000 B / 100 B overlap, so ~n_chunks come out of n_chunks KB)."""
    root.mkdir(parents=True)
    per_file = 32  # ~32 KB files
    n_files = max(1, n_chunks // per_file)
    body = (_LOREM * 6)[:900]
    for i in range(n_files):
        lines = [f"file{i} chunk{j} " + body for j in range(per_file)]
        (root / f"src_{i:05d}.txt").write_text("\n".join(lines))
    return n_files


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--chunks", type=int, default=50_000)
    ap.add_argument("--model", default="minilm-l6")
    ap.add_argument("--quant", default="none")
    args = ap.parse_args()

    from sema_tpu.utils.jaxcache import enable as enable_comp_cache
    enable_comp_cache()
    import os
    if os.environ.get("SEMA_TPU_PLATFORM"):
        import jax
        jax.config.update("jax_platforms", os.environ["SEMA_TPU_PLATFORM"])
    import jax
    import jax.numpy as jnp

    from sema_tpu.index import IndexManager
    from sema_tpu.models import Encoder, get_spec
    from sema_tpu.models.loader import random_params
    from sema_tpu.tokenizer import load_tokenizer
    from sema_tpu.utils.metrics import Metrics

    tmp = Path(tempfile.mkdtemp(prefix="sema-ibench-"))
    tree = tmp / "tree"
    t0 = time.perf_counter()
    n_files = build_tree(tree, args.chunks)
    gen_s = time.perf_counter() - t0

    spec = get_spec(args.model)
    params = random_params(spec, seed=0)
    tok, _ = load_tokenizer(spec.vocab_size, spec.hf_repo)
    enc = Encoder(spec, params, tok, compute_dtype=jnp.bfloat16,
                  quant=args.quant)
    metrics = Metrics()
    mgr = IndexManager(tmp / "data", enc, metrics=metrics)

    files = sorted(tree.glob("*"))
    t0 = time.perf_counter()
    n = mgr.process_and_index_files(files)
    build_s = time.perf_counter() - t0
    mgr.close()

    stages = {name: round(t * 1e3, 1)
              for name, t in metrics.stage_time.items()}
    out = {
        "model": args.model,
        "quant": args.quant,
        "files": n_files,
        "chunks": n,
        "tree_gen_s": round(gen_s, 1),
        "build_s": round(build_s, 1),
        "chunks_per_sec_e2e": round(n / build_s, 1),
        "stage_totals_ms": stages,
        "device": str(jax.devices()[0]),
        "extrapolated_1m_chunks_min_1chip": round(
            1e6 / (n / build_s) / 60, 1),
    }
    print(json.dumps(out))
    shutil.rmtree(tmp, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())

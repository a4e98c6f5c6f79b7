#!/usr/bin/env python
"""Fetch encoder weights from the HF hub into a local directory.

The reference downloads its model + tokenizer from the HF hub at startup on
every machine (reference embeddings.rs:93-103, via hf-hub). This framework is
offline-first: weights are resolved from a local directory or the HF cache
(sema_tpu/models/loader.py), and this tool is the one network-touching step —
run it ONCE on a machine with egress, then ship/point `--weights` at the
output directory.

Usage:

    python tools/fetch_weights.py minilm-l6                 # → ./weights/minilm-l6
    python tools/fetch_weights.py --all --dest /data/weights
    python tools/fetch_weights.py minilm-l6 --make-fixtures # + quality-gate
                                                            #   reference vectors

``--make-fixtures`` additionally embeds the canned quality corpus
(sema_tpu/quality.py) with the ORIGINAL HF torch model and writes the
vectors to ``tests/fixtures/quality_vectors_<model>.npz``. The quality gate
then asserts our JAX encoder matches them to cosine >= 0.999 — an
independent cross-check (HF torch vs our stacked-scan JAX forward) on top
of the retrieval assertions.

Zero-egress hosts: this tool fails fast with a clear message; everything
else in the framework keeps working (random-init fallback).
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO_ROOT))

from sema_tpu.models.registry import ENCODERS  # noqa: E402

# weight + tokenizer + config files our loader/tokenizer understand
# (loader.py _WEIGHT_FILES; wordpiece.py load_tokenizer)
_PATTERNS = ["model.safetensors", "pytorch_model.bin", "tokenizer.json",
             "vocab.txt", "config.json", "tokenizer_config.json",
             "special_tokens_map.json"]


def fetch(model: str, dest: Path) -> Path:
    spec = ENCODERS[model]
    if not spec.hf_repo:
        raise SystemExit(f"model {model!r} has no HF repo (test-only spec)")
    try:
        from huggingface_hub import snapshot_download
    except ImportError:
        raise SystemExit(
            "huggingface_hub is not installed; run this tool on a machine "
            "with it (pip install huggingface_hub) and copy the output dir")
    out = dest / model
    out.mkdir(parents=True, exist_ok=True)
    print(f"fetching {spec.hf_repo} -> {out}")
    try:
        snapshot_download(repo_id=spec.hf_repo, allow_patterns=_PATTERNS,
                          local_dir=out)
    except Exception as e:  # noqa: BLE001 — surface network errors plainly
        raise SystemExit(
            f"download failed ({type(e).__name__}: {e}). This host may have "
            f"no egress; run on a connected machine and copy {out} over.")
    have = sorted(p.name for p in out.iterdir())
    print(f"  files: {have}")
    if not any((out / w).exists()
               for w in ("model.safetensors", "pytorch_model.bin")):
        raise SystemExit(f"no weight file landed in {out}; repo layout "
                         f"unexpected — pass a different --dest and retry")
    return out


def make_fixtures(model: str, weights_dir: Path) -> Path:
    """Embed the quality corpus with the HF torch model; save reference
    vectors for the 0.999-cosine cross-check in the quality gate."""
    import numpy as np

    from sema_tpu.quality import CORPUS, QUERIES

    try:
        import torch
        from transformers import AutoModel, AutoTokenizer
    except ImportError:
        raise SystemExit("--make-fixtures needs torch + transformers")

    spec = ENCODERS[model]
    tok = AutoTokenizer.from_pretrained(str(weights_dir))
    hf = AutoModel.from_pretrained(str(weights_dir))
    hf.eval()

    names = sorted(CORPUS)
    texts = [CORPUS[n] for n in names] + [q for q, _ in QUERIES]
    with torch.no_grad():
        enc = tok(texts, padding="max_length", truncation=True,
                  max_length=spec.default_max_length, return_tensors="pt")
        hidden = hf(**enc).last_hidden_state
        mask = enc["attention_mask"].unsqueeze(-1).float()
        if spec.pooling == "cls":
            pooled = hidden[:, 0]
        else:  # masked mean (reference embeddings.rs:61-91)
            pooled = (hidden * mask).sum(1) / mask.sum(1).clamp(min=1e-9)
        vecs = torch.nn.functional.normalize(pooled, dim=-1).numpy()

    out = REPO_ROOT / "tests" / "fixtures" / f"quality_vectors_{model}.npz"
    out.parent.mkdir(parents=True, exist_ok=True)
    np.savez(out,
             doc_names=np.array(names),
             doc_vectors=vecs[:len(names)].astype(np.float32),
             query_texts=np.array([q for q, _ in QUERIES]),
             query_vectors=vecs[len(names):].astype(np.float32))
    print(f"wrote {out} ({len(names)} docs, {len(QUERIES)} queries)")
    return out


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("models", nargs="*",
                    help=f"model names ({sorted(k for k, s in ENCODERS.items() if s.hf_repo)})")
    ap.add_argument("--all", action="store_true",
                    help="fetch every registered model")
    ap.add_argument("--dest", type=Path, default=REPO_ROOT / "weights",
                    help="output root (default ./weights)")
    ap.add_argument("--make-fixtures", action="store_true",
                    help="also write quality-gate reference vectors "
                         "(requires torch+transformers)")
    args = ap.parse_args(argv)

    models = ([k for k, s in ENCODERS.items() if s.hf_repo] if args.all
              else args.models)
    if not models:
        ap.error("give model names or --all")
    for m in models:
        out = fetch(m, args.dest)
        if args.make_fixtures:
            make_fixtures(m, out)
        print(f"done. Use: sema-tpu index <dir> --model {m} --weights {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

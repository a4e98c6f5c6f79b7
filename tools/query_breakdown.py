"""Single-query e2e latency anatomy (VERDICT r2 weak #5 / next #9).

Decomposes `manager.search`-shaped semantic query latency into its
stages on a real disk-backed store:

    tokenize        host-only WordPiece of the query text
    rtt             one trivial device dispatch + fetch (the pump floor)
    embed_device    sustained encoder forward (pipelined, batch 1-pad)
    scan_device     sustained scan (pipelined async/finish)
    embed_e2e       one encoder forward, dispatch → fetch
    search_e2e      encode_query_device → VectorStore.search, per call
                    (the CLI / engine path)

The residual `search_e2e − tokenize − embed_device − scan_device` is
host+pump overhead; comparing it against `rtt × dispatches` shows
whether the gap is tunnel round-trips (it is, on this box) or framework
host work. Prints ONE JSON line.

Usage: python tools/query_breakdown.py --rows 262144 [--iters 32]
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def _p50(xs):
    return float(np.percentile(xs, 50))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--rows", type=int, default=262_144)
    ap.add_argument("--dim", type=int, default=384)
    ap.add_argument("--iters", type=int, default=32)
    args = ap.parse_args()

    from sema_tpu.utils.jaxcache import enable as enable_comp_cache
    enable_comp_cache()
    import os
    if os.environ.get("SEMA_TPU_PLATFORM"):
        import jax
        jax.config.update("jax_platforms", os.environ["SEMA_TPU_PLATFORM"])
    import jax
    import jax.numpy as jnp

    from load_test import build_store
    from sema_tpu.models import Encoder, get_spec
    from sema_tpu.models.loader import random_params
    from sema_tpu.tokenizer import load_tokenizer

    tmp = tempfile.mkdtemp(prefix="sema-qbreak-")
    store, probes, planted = build_store(tmp, args.rows, args.dim)

    spec = get_spec("minilm-l6")
    params = random_params(spec, seed=0)
    tok, _ = load_tokenizer(spec.vocab_size, spec.hf_repo)
    enc = Encoder(spec, params, tok, compute_dtype=jnp.bfloat16)

    query_text = "how does the crawler respect gitignore rules"
    n = args.iters

    # warm every executable
    qv = enc.encode_query_device(query_text)
    store.search(qv, 10)

    # tokenize (host only)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        enc.tokenize_batch([query_text], pad_to=1)
        ts.append(time.perf_counter() - t0)
    tokenize_ms = _p50(ts) * 1e3

    # pump round-trip floor: trivial dispatch + tiny fetch
    tiny = jnp.zeros((8, 128), jnp.float32)
    bump = jax.jit(lambda x: x + 1.0)
    np.asarray(bump(tiny))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        np.asarray(bump(tiny))[0, 0]
        ts.append(time.perf_counter() - t0)
    rtt_ms = _p50(ts) * 1e3

    # sustained device times (pipelined, honest fetch of the last result)
    ids, mask = enc.tokenize_batch([query_text], pad_to=1)
    dids, dmask = jnp.asarray(ids), jnp.asarray(mask)

    def sustained(dispatch_one, fetch):
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            out = None
            for _ in range(n):
                out = dispatch_one()
            fetch(out)
            best = min(best, (time.perf_counter() - t0) / n)
        return best * 1e3

    embed_dev_ms = sustained(lambda: enc.embed_ids(dids, dmask),
                             lambda o: np.asarray(o)[:1, :1])

    def scan_disp():
        return store.search_batch_async(np.asarray(probes[:1]), 10)

    def scan_fetch(h):
        store.search_batch_finish(h, probes[:1])

    t0 = time.perf_counter()
    hs = [scan_disp() for _ in range(n)]
    for h in hs:
        scan_fetch(h)
    scan_dev_ms = (time.perf_counter() - t0) / n * 1e3

    # e2e per call
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        np.asarray(enc.embed_ids(dids, dmask))[0]
        ts.append(time.perf_counter() - t0)
    embed_e2e_ms = _p50(ts) * 1e3

    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        qv = enc.encode_query_device(query_text)
        res = store.search(qv, 10)
        ts.append(time.perf_counter() - t0)
    # random-init encoder: rankings are meaningless by design — assert
    # only that the path returns results
    assert res, "semantic search returned nothing"
    search_e2e_ms = _p50(ts) * 1e3

    residual = search_e2e_ms - tokenize_ms - embed_dev_ms - scan_dev_ms
    out = {
        "rows": args.rows,
        "tokenize_ms": round(tokenize_ms, 3),
        "rtt_ms": round(rtt_ms, 3),
        "embed_device_ms": round(embed_dev_ms, 3),
        "scan_device_ms": round(scan_dev_ms, 3),
        "embed_e2e_ms": round(embed_e2e_ms, 3),
        "search_e2e_ms": round(search_e2e_ms, 3),
        "residual_ms": round(residual, 3),
        "residual_in_rtts": round(residual / rtt_ms, 2) if rtt_ms else None,
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(out))
    store.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())

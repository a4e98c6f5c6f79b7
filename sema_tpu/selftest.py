"""Device numeric self-test: end-to-end checks of the scan and encoder
paths on the ATTACHED jax backend.

A CPU-green test suite cannot see hardware-only failures: XLA fuses
differently per backend, and e.g. the TPU VPU flushes f32 denormals
inside arithmetic fusions — which silently zeroed every packed result id
below 2^23 on the XLA scan path (scores stayed correct, so ranking
looked plausible) until an on-device end-to-end check caught it in
round 3. ``sema-tpu doctor`` runs these probes on whatever backend the
session will actually use, through the REAL store/search code paths:

- ``scan-ids``: a small store (XLA/hier path — the one the flush bug
  hit) with planted self-match winners; every probe must return its own
  row id. Ids < 2^23 are exactly the denormal-dangerous range.
- ``scan-ids-pallas``: the same gate with the fused Pallas kernel forced
  (tile-padded store; interpret mode off-TPU).
- ``scan-int8``: the quantized scan + full-precision rescore path.
- ``scan-ivf``: IVF (ANN) mode — sealed bucket clustered by device
  k-means, self-match probes through the pruned scalar-prefetch kernel
  (asserted: the pruned executable really dispatched), hits mapped back
  through the cluster permutation.
- ``encoder-parity``: the configured encoder (fused kernels, bf16, maybe
  int8) against a same-process XLA f32 reference forward — cosine must
  be ≥ 0.999 (matches the weight-porting gate in tests; meaningful with
  random init too, it checks numerics, not semantics).

Each check returns ``(name, ok, detail)``; doctor prints one line per
check and fails on any miss. (≙ nothing in the reference — it has no
self-test; this is the operational answer to running one binary across
CPU/TPU backends.)
"""

from __future__ import annotations

import os
import tempfile
from contextlib import contextmanager
from pathlib import Path
from typing import List, Optional, Tuple

import numpy as np

Check = Tuple[str, bool, str]


@contextmanager
def _env(key: str, value: Optional[str]):
    old = os.environ.get(key)
    try:
        if value is None:
            os.environ.pop(key, None)
        else:
            os.environ[key] = value
        yield
    finally:
        if old is None:
            os.environ.pop(key, None)
        else:
            os.environ[key] = old


def _scan_check(name: str, dim: int, store_dtype: str,
                backend: Optional[str], rows: int,
                mesh: bool = False, spill: bool = False,
                ivf: bool = False) -> Check:
    from sema_tpu.index.vector_store import VectorStore
    from sema_tpu.types import Chunk

    rng = np.random.default_rng(7)
    vecs = rng.standard_normal((rows, dim)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    chunks = [Chunk(id=f"r{i}", file_path=Path("selftest.txt"),
                    start_line=1, end_line=1, content="")
              for i in range(rows)]
    probes = [0, 1, rows // 3, rows - 2, rows - 1]
    mesh_obj = None
    if mesh:
        # a mesh over ALL local devices (often just 1): the shard_map
        # all-gather merge program — the multi-chip code path — must
        # lower and run on this backend even when the axis size is 1
        import jax

        from sema_tpu.parallel.mesh import make_mesh
        mesh_obj = make_mesh(shape=[len(jax.devices())],
                             axis_names=("index",))
    with tempfile.TemporaryDirectory() as td, \
            _env("SEMA_TPU_SCAN_BACKEND", backend), \
            _env("SEMA_TPU_IVF_NPROBE", "2" if ivf else None), \
            _env("SEMA_TPU_HBM_BUDGET_MB", "0.000001" if spill else None):
        store = VectorStore(td, dim=dim, model="selftest",
                            store_dtype=store_dtype, mesh=mesh_obj,
                            ivf=ivf)
        if spill:
            # instance-level shrink so this small store actually seals
            # and spills, and streams in >1 slice
            store.SEAL_ROWS = 128
            store.SPILL_SLICE_ROWS = 128
        if ivf:
            # instance-level shrink so this small store seals and
            # clusters; the forced pallas backend pads the bucket to
            # 2048 rows -> 16 tiles of 128, probe budget 4, so an
            # nprobe=2 self-match probe (<= 4 boundary-crossing tiles)
            # always fits and takes the PRUNED kernel, not the fallback
            store.SEAL_ROWS = 256
            store.IVF_TILE = 128
            store.IVF_CLUSTER_ROWS = 128
            if spill:
                # spilled blobs aren't pallas-padded: admit every tile
                # so the blob probe (not the streamed fallback) is the
                # path under test regardless of cluster imbalance
                store.IVF_BUDGET_DIV = 1
        store.add_chunks(chunks, vecs)
        misses = []
        if spill and not all(b.get("host_resident")
                             for b in store.device_buckets()):
            misses.append("store did not spill (check is vacuous)")
        ivf_field = "ivf_spill" if (ivf and spill) else "ivf"
        if ivf and not any(b.get(ivf_field) is not None
                           for b in store.device_buckets()):
            misses.append("store did not cluster (check is vacuous)")
        for p in probes:
            res = store.search(vecs[p], k=1)
            got = res[0][0].id if res else "<none>"
            if got != f"r{p}":
                misses.append(f"row {p} -> {got}")
        if ivf and not any(key[0] == "ivf" for key in store._topk_fns):
            misses.append("probe fell back to the exact scan "
                          "(pruned kernel never dispatched)")
        store.close()
    if misses:
        return (name, False, "planted winners missed: " + "; ".join(misses))
    return (name, True, f"{len(probes)} planted winners exact "
                        f"({rows} rows, {store_dtype}"
                        f"{', spilled' if spill else ''}"
                        f"{', ivf-pruned' if ivf else ''})")


def _encoder_parity_check(model_cfg, enc=None) -> Check:
    """Configured encoder vs a same-process XLA f32 reference forward.
    Pass ``enc`` to reuse an already-constructed encoder (doctor holds
    one — re-loading weights costs seconds and ~GB of I/O for
    gte-large-class models); only the f32 reference is built here."""
    from dataclasses import replace

    from sema_tpu.models import Encoder

    texts = [f"self test document number {i} with a few more words "
             f"to cross one vector register" for i in range(8)]
    if enc is None:
        enc = Encoder.from_config(model_cfg)
    with _env("SEMA_TPU_ATTN", "xla"), _env("SEMA_TPU_ENCODER_QUANT",
                                            "none"):
        ref = Encoder.from_config(
            replace(model_cfg, dtype="float32", quant="none"))
    a = enc.encode_texts(texts)
    b = ref.encode_texts(texts)
    cos = float(np.min(np.sum(a * b, axis=1)))
    ok = cos >= 0.999
    return ("encoder-parity", ok,
            f"min cosine {cos:.6f} vs XLA f32 (gate >= 0.999; "
            f"{enc.spec.name}, quant={enc.quant})")


def run_device_selftest(model_cfg=None, dim: int = 384,
                        with_encoder: bool = True,
                        encoder=None) -> List[Check]:
    checks = [
        # 300 rows pads to 128-aligned -> the XLA/hier scan path
        _scan_check("scan-ids", dim, "bfloat16", None, rows=300),
        # pallas pin pads the store to the kernel tile (2048)
        _scan_check("scan-ids-pallas", dim, "bfloat16", "pallas", rows=300),
        _scan_check("scan-int8", dim, "int8", None, rows=300),
        # the sharded (shard_map all-gather) program on this backend
        _scan_check("scan-mesh", dim, "bfloat16", None, rows=300,
                    mesh=True),
        # HBM spill: host-resident bucket streamed in 3 slices (incl. a
        # partial tail) through this backend's staging path
        _scan_check("scan-spill", dim, "bfloat16", None, rows=300,
                    spill=True),
        # IVF (ANN) mode: sealed bucket k-means-clustered, self-match
        # probes through the PRUNED scalar-prefetch kernel (pallas pin
        # so the path is eligible off-TPU too), hits mapped back
        # through the cluster permutation
        _scan_check("scan-ivf", dim, "bfloat16", "pallas", rows=300,
                    ivf=True),
        # spilled IVF: the over-HBM bucket's cluster-major disk blob
        # serves the probe — only the probed tiles are staged/uploaded
        # (900 rows -> 1024-row layout, 8 tiles of 128, all admissible)
        _scan_check("scan-spill-ivf", dim, "bfloat16", "pallas",
                    rows=900, ivf=True, spill=True),
    ]
    if with_encoder and model_cfg is not None:
        checks.append(_encoder_parity_check(model_cfg, enc=encoder))
    return checks

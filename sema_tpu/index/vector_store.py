"""Device-resident embedding store with segment persistence.

Replaces the reference's LanceDB table (src/storage/lance_indexer.rs): chunk
vectors live as one (N, d) bf16 matrix in device HBM (sharded over the mesh
``index`` axis when multi-chip), scanned exactly at HBM bandwidth; chunk
metadata stays on host.

On-disk layout (``<data_dir>/vector_index/``)::

    manifest.json           model/dim/dtype, segment table, tombstones
    seg-000000.bin          raw row-major embeddings, store dtype (memmapped)
    seg-000000.meta.jsonl   one chunk per line (id, path, lines, content)
    seg-000000.meta.idx     uint64 byte offsets of each jsonl line (+ end)
    seg-000000.files.json   {file_path: [row ids]} for tombstoning

Metadata access is offset-indexed: ``chunk_at``/``rows_at`` are O(log S)
segment lookups plus one ``os.pread`` of a single line / one memmap row —
no segment is ever fully resident on host, so a 100M-row store costs RAM
proportional to what is actually touched, not to the corpus (the vectors'
device copy is built bucket-by-bucket from the memmaps). The two sidecar
files are derivable; indexes written before they existed are migrated by
one streaming pass on first load.

Design points:

- **append segments + tombstones**: adding files appends a new segment;
  re-indexing a changed file tombstones its old rows (filtered on-device by
  the validity mask) and appends fresh ones — mirroring the reference's
  delete-then-reindex (storage/mod.rs:42-47) without rewriting the store.
  Segments are compacted away when the dead fraction exceeds 25% on load.
- **LSM-style device buckets**: each streamed append uploads only its own
  mini-bucket (O(batch) device traffic while serving); a fragmented tail
  consolidates past MAX_TAIL_BUCKETS, and buckets past SEAL_ROWS are
  sealed permanently.
- **atomic manifest**: the manifest is written via rename; a crash
  mid-append leaves the previous manifest pointing at fully-written
  segments only (the reference can desync its two indexes on crash,
  SURVEY.md §5 checkpoint notes — here the manifest IS the commit point).
- **static device shapes**: the device matrix pads N up to a shard-aligned
  multiple so one executable serves the store between mutations; padding
  rows are invalid in the mask.

The file-hash manifest (``file_index.json``) that drives incremental
indexing (≙ the reference's ``file_index`` LanceDB table,
lance_indexer.rs:165-232) also lives here.
"""

from __future__ import annotations

import json
import os
import threading
import time
from functools import partial
from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import ml_dtypes
import numpy as np

from sema_tpu.types import Chunk
from sema_tpu.utils.fsio import (atomic_write_json as _atomic_write_json,
                                 fsync_dir as _fsync_dir,
                                 fsync_file as _fsync_file)

# dtype of the persisted segment files; the int8 mode persists bf16
# originals (the device holds the quantized copy, the disk keeps full
# precision for the rescore pass and future re-quantization)
_STORE_DTYPES = {
    "bfloat16": ml_dtypes.bfloat16,
    "float32": np.float32,
    "float16": np.float16,
    "int8": ml_dtypes.bfloat16,
}

MANIFEST_VERSION = 1
_COMPACT_DEAD_FRACTION = 0.25


@jax.jit
def _device_append2(arr: jax.Array, vals: jax.Array,
                    row0: jax.Array) -> jax.Array:
    """Write ``vals`` into ``arr`` at row ``row0`` on device (arena-tail
    append). The offset is traced: one executable per shape pair covers
    every append position. No donation — the input buffer stays alive for
    in-flight searches holding the previous bucket snapshot."""
    return jax.lax.dynamic_update_slice(arr, vals, (row0, jnp.int32(0)))


@jax.jit
def _device_append1(arr: jax.Array, vals: jax.Array,
                    row0: jax.Array) -> jax.Array:
    return jax.lax.dynamic_update_slice(arr, vals, (row0,))


@partial(jax.jit, donate_argnums=0)
def _quantize_rows_device(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Symmetric per-row int8 ON DEVICE: (N, d) bf16 → (int8 (N, d),
    f32 scales (N,)). The scheme is ops/quant.quantize_query applied to
    store rows (ONE device implementation of the formula; the host
    quantize_rows remains the test oracle — device output matches it to
    within 1 quantum, XLA reciprocal-multiply rounding). Moving this
    on-device removes an O(store) single-core numpy pass from every
    int8 bucket build (a 10M×1024 store is ~40 GB of host f32 math
    otherwise) and keeps the upload at bf16 width; under a mesh the
    row-wise map partitions over the index axis with no collectives.
    The bf16 input buffer is donated — XLA reuses it in place."""
    from sema_tpu.ops.quant import quantize_query
    return quantize_query(x.astype(jnp.float32))



def _stage_tiles(n_live: int, budget: int) -> int:
    """Staging-buffer size (in tiles) for a spilled-IVF probe of
    ``n_live`` tiles: pow2 steps below 64 (tiny probes stay tiny), then
    64-tile steps — never worse than pow2 sizing, identical to it in
    the 64-255 range (waste is a flat ≤63 tiles, so ≤25% only past
    ~256 live tiles; measured: pure pow2 staged 256 tiles for a
    150-tile probe, a 1.7× upload tax, 192 under this rule). Bounded
    variant count per (k, dtype): 6 pow2 sizes + budget/64 step sizes,
    and a workload typically recurs on 1-3 of them."""
    if n_live >= 64:
        b_eff = (n_live + 63) // 64 * 64
    else:
        b_eff = 2
        while b_eff < n_live:
            b_eff *= 2
    return min(b_eff, budget)


def _split_stage_halves(b_eff: int) -> tuple:
    """Split a staging size into two pieces summing to ``b_eff``, each
    rounded to the same pow2/64-step grid as :func:`_stage_tiles` so the
    two-half dispatch reuses the single-probe compiled-kernel sizes
    instead of minting arbitrary halves (e.g. 192 → 64 + 128, not
    96 + 96, which would add a fresh jit variant per (k, dtype)).
    For any on-grid ``b_eff`` both halves are on-grid; an off-grid
    ``b_eff`` (the budget cap) contributes at most one off-grid
    remainder."""
    half = b_eff // 2
    if half >= 64:
        b1 = half // 64 * 64
    else:
        b1 = 1
        while b1 * 2 <= half:
            b1 *= 2
    return b1, b_eff - b1


class _Segment:
    """One immutable on-disk segment, accessed lazily.

    Vectors are a read-only ``np.memmap`` (pages fault in on touch and can
    be evicted — host RSS stays bounded at any store size). Chunk metadata
    is read per row via the ``.meta.idx`` offset sidecar + ``os.pread``
    (thread-safe, no shared seek position), never loaded wholesale."""

    def __init__(self, dir: Path, name: str, rows: int, dim: int,
                 np_dtype, deleted: Optional[set] = None):
        self.dir = dir
        self.name = name
        self.rows = rows
        self.dim = dim
        self.np_dtype = np_dtype
        self.deleted: set = deleted if deleted is not None else set()
        self._vectors: Optional[np.memmap] = None
        self._offsets: Optional[np.ndarray] = None  # (rows+1,) uint64
        self._meta_fd: Optional[int] = None
        self._fd_lock = threading.Lock()
        self._file_rows: Optional[Dict[str, List[int]]] = None

    # -- paths
    @property
    def vec_path(self) -> Path:
        return self.dir / f"{self.name}.bin"

    @property
    def meta_path(self) -> Path:
        return self.dir / f"{self.name}.meta.jsonl"

    @property
    def idx_path(self) -> Path:
        return self.dir / f"{self.name}.meta.idx"

    @property
    def files_path(self) -> Path:
        return self.dir / f"{self.name}.files.json"

    def paths(self) -> List[Path]:
        return [self.vec_path, self.meta_path, self.idx_path,
                self.files_path]

    # -- lazy accessors
    @property
    def vectors(self) -> np.ndarray:
        if self._vectors is None:
            self._vectors = np.memmap(
                self.vec_path, dtype=self.np_dtype, mode="r",
                shape=(self.rows, self.dim))
        return self._vectors

    def _ensure_sidecars(self) -> None:
        """Build .meta.idx / .files.json for pre-sidecar indexes (one
        streaming pass; atomic writes so a crash mid-migration retries).
        Serialized behind ``_fd_lock``: two serving threads touching a
        legacy segment concurrently would otherwise both write the SAME
        .tmp path — truncating each other mid-tofile and committing an
        interleaved offsets file (permanently: the corrupt sidecar then
        exists, so migration never re-runs)."""
        with self._fd_lock:
            if self.idx_path.exists() and self.files_path.exists():
                return
            offsets = [0]
            file_rows: Dict[str, List[int]] = {}
            with open(self.meta_path, "rb") as f:
                for i, line in enumerate(f):
                    offsets.append(offsets[-1] + len(line))
                    path = json.loads(line)["file_path"]
                    file_rows.setdefault(path, []).append(i)
            tmp = self.idx_path.with_suffix(".tmp")
            np.asarray(offsets, dtype=np.uint64).tofile(tmp)
            os.replace(tmp, self.idx_path)
            _atomic_write_json(self.files_path, file_rows)

    @property
    def offsets(self) -> np.ndarray:
        if self._offsets is None:
            self._ensure_sidecars()
            self._offsets = np.fromfile(self.idx_path, dtype=np.uint64)
        return self._offsets

    def file_rows(self) -> Dict[str, List[int]]:
        if self._file_rows is None:
            self._ensure_sidecars()
            self._file_rows = json.loads(self.files_path.read_text())
        return self._file_rows

    def meta_row(self, i: int) -> dict:
        off = self.offsets
        start, end = int(off[i]), int(off[i + 1])
        if self._meta_fd is None:
            # concurrent serving threads race the lazy open; without the
            # lock a double-open leaks one fd per race (pread itself is
            # thread-safe — only the open needs guarding)
            with self._fd_lock:
                if self._meta_fd is None:
                    self._meta_fd = os.open(self.meta_path, os.O_RDONLY)
        return json.loads(os.pread(self._meta_fd, end - start, start))

    def iter_meta(self):
        """Stream (row, dict) pairs without residency (substring scan,
        compaction)."""
        with open(self.meta_path, "rb") as f:
            for i, line in enumerate(f):
                yield i, json.loads(line)

    def close(self) -> None:
        if self._meta_fd is not None:
            os.close(self._meta_fd)
            self._meta_fd = None
        self._vectors = None

    @staticmethod
    def write(dir: Path, name: str, dim: int, np_dtype,
              vectors: np.ndarray, meta: Sequence[dict]) -> "_Segment":
        """Write a fresh segment (vectors + jsonl + both sidecars).

        Data files are fsynced before the caller's manifest commit: the
        manifest rename is the commit point, and without the barrier
        power loss could make the rename durable while these pages are
        not (the crash-desync the module docstring rules out)."""
        seg = _Segment(dir, name, len(meta), dim, np_dtype)
        np.ascontiguousarray(vectors, dtype=np_dtype).tofile(seg.vec_path)
        offsets = [0]
        file_rows: Dict[str, List[int]] = {}
        with open(seg.meta_path, "wb") as f:
            for i, row in enumerate(meta):
                line = (json.dumps(row) + "\n").encode()
                f.write(line)
                offsets.append(offsets[-1] + len(line))
                file_rows.setdefault(row["file_path"], []).append(i)
        tmp = seg.idx_path.with_suffix(".tmp")
        np.asarray(offsets, dtype=np.uint64).tofile(tmp)
        os.replace(tmp, seg.idx_path)
        _atomic_write_json(seg.files_path, file_rows)
        _fsync_file(seg.vec_path)
        _fsync_file(seg.meta_path)
        _fsync_file(seg.idx_path)
        _fsync_dir(dir)
        return seg


class VectorStore:
    def __init__(self, data_dir: Path | str, dim: int, model: str,
                 store_dtype: str = "bfloat16", mesh=None,
                 index_axis: str = "index", slice_axis: Optional[str] = None,
                 rescore_k: int = 100,
                 hbm_budget_mb: float = 0.0, ivf: bool = False,
                 ivf_nprobe: int = 32, ivf_min_recall: float = 0.0):
        self.dir = Path(data_dir) / "vector_index"
        self.dir.mkdir(parents=True, exist_ok=True)
        self.dim = dim
        self.model = model
        self.store_dtype = store_dtype
        self.np_dtype = _STORE_DTYPES[store_dtype]
        self.rescore_k = rescore_k
        self.hbm_budget_mb = hbm_budget_mb   # 0 = auto; [index] config knob
        # IVF (ANN) mode: cluster sealed buckets at build time and prune
        # small-batch scans to the probed clusters' tiles (ops/ivf.py +
        # the scalar-prefetch kernels in ops/pallas_topk.py). Opt-in —
        # the exact scan stays the default AND the per-dispatch fallback
        # whenever a probe's tile union exceeds the budget (large query
        # batches) or a bucket is unsealed/spilled/sharded.
        env_ivf = os.environ.get("SEMA_TPU_IVF")
        self.ivf = (env_ivf not in ("", "0")) if env_ivf is not None \
            else ivf
        # operator knob: a smaller seal threshold lets rehearsals/smokes
        # engage the sealed-bucket machinery (IVF clustering, spill)
        # without quarter-million-row builds — instance attr shadows the
        # class constant, so tests that monkeypatch the class still win
        env_seal = os.environ.get("SEMA_TPU_SEAL_ROWS")
        if env_seal:
            try:
                self.SEAL_ROWS = max(1, int(env_seal))
            except ValueError:
                import sys as _sys
                print(f"Warning: ignoring malformed "
                      f"SEMA_TPU_SEAL_ROWS={env_seal!r}",
                      file=_sys.stderr)
        self.ivf_nprobe = int(os.environ.get("SEMA_TPU_IVF_NPROBE",
                                             ivf_nprobe))
        # Recall contract (docs/API.md "IVF recall contract"): a MEAN
        # recall@10 target that maps to nprobe through the measured
        # frontier, or — above the ANN plateau — routes every query to
        # the exact scan, the only true recall floor. Clustering still
        # happens at seal time, so the knob can be relaxed later without
        # a rebuild. An explicit SEMA_TPU_IVF_NPROBE wins: it is the
        # expert override the contract is built on top of.
        self.ivf_min_recall = float(os.environ.get(
            "SEMA_TPU_IVF_MIN_RECALL", ivf_min_recall))
        self._ivf_route_exact = False
        if self.ivf and self.ivf_min_recall > 0:
            nprobe = self.nprobe_for_recall(self.ivf_min_recall)
            if nprobe is None:
                self._ivf_route_exact = True
            elif "SEMA_TPU_IVF_NPROBE" not in os.environ:
                self.ivf_nprobe = max(self.ivf_nprobe, nprobe)
        self.mesh = mesh
        self.index_axis = index_axis
        # multislice (BASELINE config 5): a second mesh axis mapping
        # across TPU slices (DCN). Store rows shard over BOTH axes
        # (slice-major row blocks) and candidate merges run in two
        # levels — within the slice over ICI, then only the slice
        # winners over DCN (parallel/multislice.py). Honored whenever
        # the axis exists on the mesh, even at size 1 (the level-2
        # gather is then a no-op and program shapes stay uniform).
        self.slice_axis = (
            slice_axis if (mesh is not None and slice_axis
                           and slice_axis in mesh.axis_names) else None)
        self.segments: List[_Segment] = []
        self._starts: Optional[np.ndarray] = None  # cumulative row offsets
        self.file_hashes: Dict[str, str] = {}
        self._buckets = None          # list of device bucket dicts
        self._valid_dirty = False     # tombstones pending mask re-upload
        # device-resident rows handed to add_chunks while a device copy is
        # live (serve-time re-index): segment name → jax.Array, consumed by
        # the next bucket build so the arena extension skips the
        # host→device re-upload. Bounded: every _build_device drains it.
        self._pending_dev: Dict[str, "jax.Array"] = {}
        self._topk_fns: Dict[Tuple[int, int, str], callable] = {}
        self._spill_ex = None   # lazy 1-thread slice-fill prefetcher
        # union probe views over the spilled buckets' IVF layouts
        # (_spill_union_view), keyed by bucket-list identity
        self._spill_union: Dict[tuple, dict] = {}
        # bounded row→chunk cache: serving materializes the same hot rows
        # over and over (rows are immutable once written; compaction only
        # happens at load, before any caller holds row ids)
        self._chunk_cache: Dict[int, Chunk] = {}
        self._chunk_cache_max = 65_536
        # streaming re-index runs concurrently with serving (QueryBatcher /
        # HTTP daemon threads); mutations and bucket (re)builds serialize
        # behind this lock, searches take a consistent bucket snapshot
        self._lock = threading.RLock()
        # destructive maintenance (load-time compaction, orphan sweep)
        # UNLINKS committed files, so it must only run in the process
        # that owns the store: a second process merely opening the index
        # (serve starting while index runs) would otherwise delete files
        # the writer's in-memory segment list still references. Advisory
        # flock on <dir>/.lock; non-owners open read/search-capable but
        # skip maintenance.
        self._owner = False
        self._lock_fd = None
        try:
            import fcntl
            self._lock_fd = os.open(self.dir / ".lock",
                                    os.O_CREAT | os.O_RDWR, 0o644)
            fcntl.flock(self._lock_fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
            self._owner = True
        except BlockingIOError:
            # another instance holds the store: open read/search-capable,
            # defer destructive maintenance to the owner
            os.close(self._lock_fd)
            self._lock_fd = None
        except (ImportError, OSError):
            # no flock support on this platform/filesystem: fall back to
            # the historical single-process assumption rather than
            # silently disabling compaction forever
            if self._lock_fd is not None:
                os.close(self._lock_fd)
                self._lock_fd = None
            self._owner = True
        self._load()

    # -- persistence ----------------------------------------------------------

    @property
    def _manifest_path(self) -> Path:
        return self.dir / "manifest.json"

    @property
    def _hashes_path(self) -> Path:
        return self.dir / "file_index.json"

    def _load(self) -> None:
        if self._hashes_path.exists():
            self.file_hashes = json.loads(self._hashes_path.read_text())
        if not self._manifest_path.exists():
            # no manifest = nothing ever committed; a crash before the
            # first commit can still have left segment files behind
            if self._owner:
                self._sweep_orphans()
            return
        m = json.loads(self._manifest_path.read_text())
        if m.get("model") != self.model or m.get("dim") != self.dim:
            raise ValueError(
                f"index at {self.dir} was built with model="
                f"{m.get('model')!r} dim={m.get('dim')}; current config is "
                f"model={self.model!r} dim={self.dim}. Re-index with "
                f"`sema-tpu index --reindex` or switch the model back.")
        if m.get("store_dtype") != self.store_dtype:
            # the on-disk format wins (switching requires a re-index);
            # surface it so a config change isn't silently ignored
            import sys
            print(f"Warning: index at {self.dir} uses store_dtype="
                  f"{m['store_dtype']!r}; ignoring configured "
                  f"{self.store_dtype!r} (re-index to switch)",
                  file=sys.stderr)
            self.store_dtype = m["store_dtype"]
            self.np_dtype = _STORE_DTYPES[self.store_dtype]
        for seg in m["segments"]:
            self.segments.append(_Segment(
                self.dir, seg["name"], seg["rows"], self.dim,
                self.np_dtype, deleted=set(seg.get("deleted", []))))
        if self._owner:
            # compaction and the sweep unlink committed files — owner only
            # (see the flock in __init__); a non-owner open defers both to
            # the owner's next load
            self._maybe_compact()
            self._sweep_orphans()

    def _sweep_orphans(self) -> None:
        """Unlink segment files the manifest doesn't reference: leftovers
        of a crash between a segment write and its manifest commit (the
        manifest IS the commit point — such a segment was never durable),
        or between a compaction's manifest commit and its unlink pass.
        Without the sweep those files leak disk forever; with it, load
        converges to the committed state.

        Age-gated to files >1 h old: the store is single-mutator by
        design (like the reference's LanceDB dir), but a second process
        merely OPENING the index (e.g. `serve` starting while `index` is
        mid-append) must not destroy the writer's not-yet-committed
        segment — a fresh uncommitted file is either an in-flight append
        (will commit within seconds) or a crash leftover that the next
        load after the gate reclaims anyway."""
        keep = {p.name for s in self.segments for p in s.paths()}
        cutoff = time.time() - 3600
        for p in self.dir.glob("seg-*"):
            if p.name in keep:
                continue
            try:
                if p.stat().st_mtime < cutoff:
                    p.unlink(missing_ok=True)
            except OSError:
                pass
        # crash leftovers of unique-named atomic JSON writes
        # (fsio.atomic_write_json mkstemp temps) — age-gated like the
        # segments: a fresh one may be a concurrent owner's in-flight
        # commit
        for p in self.dir.glob("*.tmp"):
            try:
                if p.stat().st_mtime < cutoff:
                    p.unlink(missing_ok=True)
            except OSError:
                pass
        # IVF layout sidecars whose covered segments were compacted away
        # (or the mode was turned off — their vector blobs are a full
        # extra copy of the bucket) leak disk the same way
        from sema_tpu.index import ivf_cache
        ivf_cache.sweep_stale(self.dir,
                              {s.name for s in self.segments},
                              keep_any=self.ivf)

    def _save_manifest(self) -> None:
        _atomic_write_json(self._manifest_path, {
            "version": MANIFEST_VERSION,
            "model": self.model, "dim": self.dim,
            "store_dtype": self.store_dtype,
            "segments": [
                {"name": s.name, "rows": s.rows,
                 "deleted": sorted(s.deleted)}
                for s in self.segments],
        })

    def save_file_hashes(self) -> None:
        _atomic_write_json(self._hashes_path, self.file_hashes)

    # -- file hash manifest (≙ lance_indexer.rs file_index table) -------------

    def get_file_hash(self, file_path) -> Optional[str]:
        return self.file_hashes.get(str(file_path))

    def update_file_hash(self, file_path, file_hash: str) -> None:
        self.file_hashes[str(file_path)] = file_hash

    def remove_file_hash(self, file_path) -> None:
        self.file_hashes.pop(str(file_path), None)

    # -- mutation --------------------------------------------------------------

    @property
    def total_rows(self) -> int:
        return sum(s.rows for s in self.segments)

    @property
    def live_rows(self) -> int:
        return sum(s.rows - len(s.deleted) for s in self.segments)

    def device_copy_live(self) -> bool:
        """True when a device copy of the store is resident (i.e. it has
        served a search) and single-device — the regime where handing
        :meth:`add_chunks` device-resident embeddings skips the
        host→device re-upload of the appended rows (the IndexManager uses
        this to pick the encoder's output placement). Requires a
        NON-EMPTY bucket list: a search on an empty store leaves
        ``_buckets == []``, and treating that as live would route the
        very first full-corpus build through the HBM-resident
        return_device path."""
        with self._lock:
            return bool(self._buckets) and self.mesh is None

    def add_chunks(self, chunks: Sequence[Chunk],
                   embeddings) -> None:
        """Append one segment holding ``chunks`` (ordered) + their vectors.

        ``embeddings`` is a host ``(n, dim)`` array, a device-resident
        ``jax.Array``, or an ``Encoder.EncodedBatch``-like pair carrying
        both placements (serve-time re-index fast path): the device rows
        are kept for the next bucket build — the arena-tail extension
        then consumes them directly instead of re-uploading from the
        fresh memmap — while the disk segment writes from the host copy
        (the pair's, already fetched with overlapped per-batch DMA; a
        bare device array pays one fetch here). Durability is unchanged:
        the manifest commits only after the segment files are on disk.
        The store takes OWNERSHIP of device rows passed here (an int8
        store's quantization donates the buffer to XLA) — callers must
        not reuse them afterwards."""
        if len(chunks) == 0:
            return
        dev_rows = None
        if hasattr(embeddings, "host") and hasattr(embeddings, "device"):
            dev_rows = jnp.asarray(embeddings.device)
            if dev_rows.shape != (len(chunks), self.dim):
                # a mismatched device copy would dynamic_update_slice
                # past its arena slot silently — hard error, and not an
                # assert: that corruption must not return under python -O
                raise ValueError(
                    f"device rows {dev_rows.shape} != "
                    f"({len(chunks)}, {self.dim})")
            if dev_rows.dtype != np.dtype(self.np_dtype):
                dev_rows = dev_rows.astype(self.np_dtype)
            embeddings = embeddings.host
        elif not isinstance(embeddings, np.ndarray):
            dev = jnp.asarray(embeddings)
            if dev.dtype != np.dtype(self.np_dtype):
                dev = dev.astype(self.np_dtype)   # cast on device
            try:
                dev.copy_to_host_async()
            except Exception:  # noqa: BLE001 — committed/sharded arrays
                pass
            dev_rows = dev
            embeddings = np.asarray(dev)          # completes in-flight DMA
        if embeddings.shape != (len(chunks), self.dim):
            # ValueError, not assert: a wrong-shaped array committed to
            # disk desyncs the memmap of every later load, and the guard
            # must not vanish under python -O
            raise ValueError(f"embeddings {embeddings.shape} != "
                             f"({len(chunks)}, {self.dim})")
        meta = [{
            "id": c.id, "file_path": str(c.file_path),
            "start_line": c.start_line, "end_line": c.end_line,
            "content": c.content,
        } for c in chunks]
        with self._lock:
            # name derives from segment count — must be claimed under the
            # lock or concurrent writers could overwrite each other's files
            name = f"seg-{len(self.segments):06d}-{self.total_rows:09d}"
            self.segments.append(_Segment.write(
                self.dir, name, self.dim, self.np_dtype, embeddings, meta))
            if dev_rows is not None and self._buckets \
                    and self.mesh is None:
                # only stash while a NON-EMPTY device copy is live: a
                # pure index build (no searches yet, or searched-while-
                # empty leaving _buckets == []) uploads lazily from the
                # memmaps at first search, and stashing would pin the
                # whole corpus in HBM for nothing
                self._pending_dev[name] = dev_rows
            self._starts = None
            self._save_manifest()
            self._invalidate_device(tail_only=True)

    def remove_file_chunks(self, file_path) -> int:
        """Tombstone every row belonging to ``file_path``
        (≙ lance_indexer.rs:234-250 delete)."""
        target = str(file_path)
        removed = 0
        with self._lock:
            for seg in self.segments:
                # the per-segment file→rows sidecar makes this O(rows of
                # the file), never a content read
                for i in seg.file_rows().get(target, ()):
                    if i not in seg.deleted:
                        seg.deleted.add(i)
                        removed += 1
            if removed:
                self._save_manifest()
                self._valid_dirty = True   # masks re-upload lazily
        return removed

    def _maybe_compact(self) -> None:
        total = self.total_rows
        dead = total - self.live_rows
        if total == 0 or dead / total <= _COMPACT_DEAD_FRACTION:
            return
        old_segments = list(self.segments)
        old_files = [p for s in old_segments for p in s.paths()]
        # write under a fresh name absent from the old manifest, then
        # commit the manifest, then unlink the dead files
        name = "seg-000000-000000000"
        if any(s.name == name for s in old_segments):
            name = "seg-compact"
        new_seg = _Segment(self.dir, name, 0, self.dim, self.np_dtype)
        live = 0
        offsets = [0]
        file_rows: Dict[str, List[int]] = {}
        # stream segment-by-segment: peak host memory is one segment's
        # live rows (a fancy-indexed copy out of the memmap), not the store
        with open(new_seg.vec_path, "wb") as vf, \
                open(new_seg.meta_path, "wb") as mf:
            for seg in old_segments:
                keep = [i for i in range(seg.rows) if i not in seg.deleted]
                if not keep:
                    continue
                np.ascontiguousarray(seg.vectors[keep]).tofile(vf)
                keep_set = set(keep)
                for i, row in seg.iter_meta():
                    if i not in keep_set:
                        continue
                    line = (json.dumps(row) + "\n").encode()
                    mf.write(line)
                    offsets.append(offsets[-1] + len(line))
                    file_rows.setdefault(
                        row["file_path"], []).append(live)
                    live += 1
        if live:
            tmp = new_seg.idx_path.with_suffix(".tmp")
            np.asarray(offsets, dtype=np.uint64).tofile(tmp)
            os.replace(tmp, new_seg.idx_path)
            _atomic_write_json(new_seg.files_path, file_rows)
            # durability barrier before the manifest commit references
            # the compacted files (power-loss ordering, see _Segment.write)
            _fsync_file(new_seg.vec_path)
            _fsync_file(new_seg.meta_path)
            _fsync_file(new_seg.idx_path)
            _fsync_dir(self.dir)
            new_seg.rows = live
            self.segments = [new_seg]
        else:
            for p in new_seg.paths():
                p.unlink(missing_ok=True)
            self.segments = []
        self._starts = None
        self._save_manifest()
        keep_paths = set(self.segments[0].paths()) if self.segments else set()
        for seg in old_segments:
            seg.close()
        for p in old_files:
            if p.exists() and p not in keep_paths:
                p.unlink()
        self._pending_dev.clear()   # compaction renamed every row
        self._invalidate_device()

    # -- device placement -------------------------------------------------------
    #
    # The device copy of the store is a list of BUCKETS (an LSM-style
    # structure). A bucket covers a contiguous run of segments. Streaming
    # appends first try to land IN PLACE in the unsealed tail bucket's
    # spare padded capacity (a device-side dynamic_update_slice at a
    # traced offset — O(batch) upload, no new bucket, so every query pays
    # ONE scan dispatch for the whole tail; unsealed single-device
    # buckets are allocated with 2× headroom and the pow2 ladder doubles
    # capacity per overflow, amortizing host re-uploads to O(log rows)).
    # Overflowing appends become their own small bucket; when more than
    # ``MAX_TAIL_BUCKETS`` unsealed buckets accumulate, the tail
    # consolidates into one bucket (one amortized upload); a bucket whose
    # row count crosses ``SEAL_ROWS`` is SEALED and never consolidated
    # again. Tombstones only re-upload the affected buckets' boolean
    # validity masks (1 bit of HBM traffic per row, not the vectors). This
    # is the answer to SURVEY.md §7's "incremental mutation of a
    # device-resident sharded matrix" hard part.
    #
    # Bucket row counts are padded to a shard-aligned power-of-two-ish size
    # so the number of distinct compiled scan shapes stays logarithmic in
    # the store size; the per-bucket candidate merge is on host, so extra
    # tail buckets cost one tiny scan dispatch each, bounded by
    # MAX_TAIL_BUCKETS.

    # HBM spill (stores larger than one chip's HBM): once the device
    # buckets' projected bytes cross the budget (env
    # SEMA_TPU_HBM_BUDGET_MB, else 85% of the device's reported
    # bytes_limit, else unlimited), further SEALED buckets stay
    # HOST-resident — no device arrays; search streams them through the
    # same compiled scan in fixed-shape slices (at most SPILL_INFLIGHT
    # staging buffers in HBM at once) and their candidates join the
    # ordinary per-bucket host merge. A RESOURCE_EXHAUSTED during a
    # sealed bucket's upload degrades to the same host bucket instead of
    # crashing. This is the single-chip capacity escape hatch — the
    # reference's disk-based store (LanceDB, lance_indexer.rs) has no
    # hard corpus ceiling and neither should this one; the scan becomes
    # host→device upload-bound (documented in docs/PERF.md), and scaling
    # QPS past one chip's HBM is what the mesh path is for. Single-device
    # only: with a mesh the store already shards across chips.
    SEAL_ROWS = 262_144
    MAX_TAIL_BUCKETS = 8
    SPILL_SLICE_ROWS = 262_144
    SPILL_INFLIGHT = 2
    # IVF mode (self.ivf): sealed buckets are k-means-clustered and laid
    # out cluster-major; probes scan only the selected clusters' tiles.
    # ~IVF_CLUSTER_ROWS rows per centroid; the pruned kernel's tile is
    # narrower than the dense scan's 2048 so a probed cluster costs
    # little over-read at its range boundaries. A dispatch may touch at
    # most 1/IVF_BUDGET_DIV of the bucket's tiles (the kernel grid is
    # static at that budget) — past it, the exact scan is cheaper anyway.
    IVF_TILE = 512
    IVF_CLUSTER_ROWS = 512
    IVF_BUDGET_DIV = 4
    # Spilled-bucket probes stage their tiles host→device per dispatch, so
    # boundary over-read is paid in UPLOAD bytes, not scan time. Two levers
    # cut it (docs/PERF.md "Spilled-IVF probes"): the blob is laid out with
    # every cluster starting on a tile boundary (a probed tile holds ONLY
    # probed-cluster rows), and the tile is finer than the device path's —
    # 128 rows is Mosaic's lane floor. min() with IVF_TILE so test
    # geometries that shrink IVF_TILE shrink the spill tile with it.
    IVF_SPILL_TILE = 128
    # Measured mean-recall@10 frontier for the nprobe knob (docs/PERF.md
    # "IVF" rung: TPU v5e-1, 1M×384 bf16, 2048 clusters, the bench's
    # deliberately hard clustered synthetic — real embedding corpora
    # cluster better, so these are floor estimates for the MEAN).
    # (min_mean_recall, nprobe), ascending. Above the last entry the ANN
    # plateau is exhausted and the only honest answer is the exact scan.
    IVF_RECALL_FRONTIER: Tuple[Tuple[float, int], ...] = (
        (0.934, 8), (0.938, 16), (0.941, 32), (0.950, 64))

    @classmethod
    def nprobe_for_recall(cls, target: float) -> Optional[int]:
        """Smallest measured nprobe whose mean recall@10 meets ``target``,
        or ``None`` when the target exceeds the ANN plateau (route exact).

        The contract this encodes (docs/API.md "IVF recall contract"):
        the mapping is for MEAN recall on an adversarial corpus; IVF's
        per-query tail is long (measured p5 0.20 / min 0.0 at nprobe 32,
        docs/PERF.md "IVF tail recall") and no nprobe guarantees a
        per-query floor — only the exact scan does. Targets at or above
        0.97 therefore return None."""
        if target >= 0.97:
            return None
        for mean_recall, nprobe in cls.IVF_RECALL_FRONTIER:
            if mean_recall >= target:
                return nprobe
        return None

    def _invalidate_device(self, tail_only: bool = False) -> None:
        if tail_only and self._buckets:
            # keep every bucket that still maps to the current segment
            # list; device_buckets() appends buckets for the uncovered
            # trailing segments and consolidates if fragmented
            pass
        else:
            self._buckets = None
        # compiled scan fns are keyed by shape and stay valid across
        # rebuilds; no need to clear self._topk_fns

    def _shards(self) -> int:
        if self.mesh is None:
            return 1
        n = self.mesh.shape[self.index_axis]
        if self.slice_axis is not None:
            n *= self.mesh.shape[self.slice_axis]
        return n

    def _row_axes(self):
        """The PartitionSpec entry for the store's row dimension:
        ``index`` alone, or ``(slice, index)`` on a multislice mesh —
        slice-major row blocks, matching the two-level merge's
        shard-id arithmetic (multislice._two_level)."""
        if self.slice_axis is not None:
            return (self.slice_axis, self.index_axis)
        return self.index_axis

    def _align(self) -> int:
        # shards × 128: group-aligned for hierarchical selection per shard,
        # tile-aligned for the MXU. With an explicit pallas backend request
        # the per-shard row count is padded to the fused kernel's tile
        # (2048) so even small stores exercise it; large stores reach
        # 2048-per-shard through the power-of-two ladder anyway.
        unit = 2048 if os.environ.get(
            "SEMA_TPU_SCAN_BACKEND") == "pallas" else 128
        return self._shards() * unit

    def _pad_rows(self, n: int) -> int:
        align = self._align()
        n_pad = max(((n + align - 1) // align) * align, align)
        # round up to the next power of two of `align` units to bound the
        # set of compiled shapes
        units = (n_pad + align - 1) // align
        pow2 = 1
        while pow2 < units:
            pow2 *= 2
        return pow2 * align

    def _put(self, x, spec):
        from jax.sharding import NamedSharding
        if self.mesh is None:
            return jnp.asarray(x)
        return jax.device_put(x, NamedSharding(self.mesh, spec))

    def _hbm_budget_bytes(self) -> Optional[int]:
        """Device-bucket byte budget, or None for unlimited.

        Priority: SEMA_TPU_HBM_BUDGET_MB (operator override; 0/empty
        disables), else the ``[index] hbm_budget_mb`` config knob, else
        85% of the device's PJRT ``bytes_limit`` when the backend
        reports one (the axon tunnel backend returns None — there the
        knobs or the RESOURCE_EXHAUSTED fallback are the only gates)."""
        env = os.environ.get("SEMA_TPU_HBM_BUDGET_MB")
        if env:
            try:
                mb = float(env)
            except ValueError:
                # a typo ("2GB") must not silently mean "unlimited" —
                # warn and fall through to the config knob / auto budget
                import sys as _sys
                print(f"Warning: ignoring malformed "
                      f"SEMA_TPU_HBM_BUDGET_MB={env!r} (want MB as a "
                      f"number)", file=_sys.stderr)
                mb = None
            if mb is not None:
                return int(mb * (1 << 20)) if mb > 0 else None
        if self.hbm_budget_mb and self.hbm_budget_mb > 0:
            return int(self.hbm_budget_mb * (1 << 20))
        try:
            ms = jax.local_devices()[0].memory_stats()
            limit = ms.get("bytes_limit") if ms else None
        except Exception:
            limit = None
        return int(limit * 0.85) if limit else None

    def _bucket_dev_bytes(self, n_pad: int, transient: bool = False) -> int:
        """Resident device bytes of a bucket; with ``transient`` the
        BUILD-TIME peak instead — an int8 bucket stages the full bf16
        host rows on device before quantizing (n_pad·dim·2), ~2× its
        steady int8+scales footprint, so budget ADMISSION must charge
        the transient while accumulation charges the steady state."""
        if self.store_dtype == "int8":
            steady = n_pad * (self.dim + 4)   # int8 rows + f32 scales
            return max(steady, n_pad * self.dim * 2) if transient \
                else steady
        return n_pad * self.dim * np.dtype(self.np_dtype).itemsize

    def _ivf_eligible(self, n_pad: int) -> bool:
        """Whether a sealed bucket of this padded size would cluster
        (tile-aligned, ≥2 tiles per shard; on a mesh every shard's row
        block clusters independently — see _build_bucket)."""
        sr = n_pad // self._shards()
        return (self.ivf and sr % self.IVF_TILE == 0
                and sr >= 2 * self.IVF_TILE)

    # -- persisted IVF layouts (index/ivf_cache.py) ---------------------------

    def _ivf_key(self, seg_range, n_pad: int, spill: bool = False):
        """Sidecar content key. ``spill`` layouts key on the SPILL tile
        (their blob geometry — tile-aligned cluster starts — depends on
        it), which also firewalls them from the device path: a device
        bucket whose padded rows happen to equal a spill layout's must
        not load the aligned blob perm (different length + sentinel
        entries) — the ``spill`` flag is key material. The sidecar
        version bump (ivf_cache._VERSION=2) retires every pre-alignment
        file either way."""
        from sema_tpu.index import ivf_cache
        segs = [(s.name, s.rows)
                for s in self.segments[seg_range[0]:seg_range[1]]]
        tile = self._spill_tile() if spill else self.IVF_TILE
        return ivf_cache.layout_key(
            segs, n_pad, self.dim, self.store_dtype, self._shards(),
            tile, self.IVF_CLUSTER_ROWS, spill=spill), segs

    def _ivf_layout_load(self, seg_range, n_pad: int,
                         need_vectors: bool = False,
                         spill: bool = False):
        from sema_tpu.index import ivf_cache
        key, _ = self._ivf_key(seg_range, n_pad, spill=spill)
        return ivf_cache.load_layout(self.dir, key,
                                     need_vectors=need_vectors)

    def _ivf_layout_save(self, seg_range, n_pad: int, meta: dict,
                         vectors=None, scales=None,
                         spill: bool = False) -> None:
        """Persist one bucket's layout; best-effort (a cache write must
        never fail a build) and owner-only (a read-only second process
        must not race the owner's sweep with fresh files)."""
        if not self._owner:
            return
        from sema_tpu.index import ivf_cache
        key, segs = self._ivf_key(seg_range, n_pad, spill=spill)
        try:
            ivf_cache.save_layout(self.dir, key, segs, meta["perm"],
                                  meta["centroids"], meta["starts"],
                                  vectors=vectors, scales=scales)
        except OSError as e:
            import sys
            print(f"Warning: IVF sidecar write failed ({e}); layout will "
                  f"be recomputed next open", file=sys.stderr)

    def _build_host_bucket(self, seg_range, row_offset: int) -> dict:
        """A bucket with NO device arrays: vectors stay in the segment
        memmaps and are streamed at scan time (_scan_host_bucket).
        Always sealed — it never arena-extends or consolidates.

        In IVF mode the bucket additionally carries ``ivf_spill``: a
        persisted cluster-major blob + layout (_ivf_spill_layout) that
        lets small-batch probes upload ONLY the probed tiles instead of
        streaming every byte of an over-HBM store through the scan
        (_ivf_spill_dispatch)."""
        rows = sum(s.rows
                   for s in self.segments[seg_range[0]:seg_range[1]])
        b = {"host_resident": True, "store": None, "valid": None,
             "all_valid": False, "n_pad": rows, "rows": rows,
             "seg_range": tuple(seg_range), "row_offset": row_offset,
             "sealed": True}
        if (self.ivf and self.mesh is None
                and rows >= 2 * self.IVF_TILE):
            b["ivf_spill"] = self._ivf_spill_layout(seg_range, rows)
        return b

    def _spill_tile(self) -> int:
        return min(self.IVF_SPILL_TILE, self.IVF_TILE)

    def _ivf_spill_layout(self, seg_range, rows: int):
        """Layout + cluster-major on-disk blob for one spilled bucket.

        Loads the persisted sidecar when present; otherwise (owner only)
        reads the bucket's rows once, k-means-clusters them on device
        (transient — freed immediately; an OOM on a budget-tight chip
        just skips IVF for this bucket, the streamed exact scan still
        works), and persists layout + permuted rows so every future open
        probes straight from disk. Returns None when IVF can't be set up
        — callers fall back to the full streamed scan.

        The blob is TILE-ALIGNED: every real cluster starts on a
        _spill_tile boundary (gaps carry the sentinel row id ``rows`` —
        dead by the existing ``rowmap < rows`` validity — and zero
        vectors), and the k-means overflow cluster (zero padding rows,
        id ``c``) is dropped entirely. A probed tile therefore never
        stages a neighbor cluster's rows: staged bytes per probe are
        ~sum(ceil(size/tile)) tiles instead of each cluster dragging up
        to a whole extra boundary tile at each end. Disk cost: ~half a
        tile of padding per cluster (~12% at the default 512-row
        clusters / 128-row tiles).

        int8 stores persist a QUANTIZED blob (int8 rows + per-row f32
        scales, symmetric like the device buckets): half the disk and
        half the staged probe upload of the bf16 originals, with the
        existing full-precision rescore (rescore_k candidates re-ranked
        from the segment memmaps) keeping final scores exact — the same
        precision contract as the store's own device buckets. Clustering
        still runs on the bf16 originals (the layout deserves full
        precision); quantization happens on the finished blob."""
        t = self._spill_tile()
        lp = ((rows + self.IVF_TILE - 1) // self.IVF_TILE) * self.IVF_TILE
        int8_blob = self.store_dtype == "int8"
        cached = self._ivf_layout_load(seg_range, lp, need_vectors=True,
                                       spill=True)
        if cached is not None and int8_blob and "scales" not in cached:
            cached = None   # pre-int8-blob sidecar (never written by
            # this version — the _VERSION bump retires them — but a
            # mixed-version dir must rebuild, not stage bf16 as int8)
        if cached is None:
            if not self._owner:
                return None
            host = np.zeros((lp, self.dim), dtype=self.np_dtype)
            off = 0
            for seg in self.segments[seg_range[0]:seg_range[1]]:
                host[off:off + seg.rows] = seg.vectors
                off += seg.rows
            from sema_tpu.ops.ivf import cluster_layout, kmeans_cluster
            c = max(16, lp // self.IVF_CLUSTER_ROWS)
            try:
                assign, cent = kmeans_cluster(jnp.asarray(host), c)
                assign = np.asarray(assign)
                cent = np.asarray(cent)
            except Exception as e:
                msg = str(e).lower()
                if not ("resource_exhausted" in msg
                        or "out of memory" in msg):
                    raise
                return None
            perm, starts = cluster_layout(assign, c + 1)
            sizes = (starts[1:c + 1] - starts[:c]).astype(np.int64)
            asizes = (sizes + t - 1) // t * t
            astarts = np.zeros(c + 2, dtype=np.int64)
            np.cumsum(asizes, out=astarts[1:c + 1])
            astarts[c + 1] = astarts[c]      # overflow cluster: empty
            total = int(astarts[c])
            perm_a = np.full(total, rows, dtype=np.int32)  # sentinel
            blob = np.zeros((total, self.dim), dtype=self.np_dtype)
            for i in range(c):
                sz = int(sizes[i])
                if not sz:
                    continue
                src = perm[starts[i]:starts[i] + sz]
                dst = int(astarts[i])
                perm_a[dst:dst + sz] = src
                blob[dst:dst + sz] = host[src]
            meta = {"perm": perm_a, "centroids": cent, "starts": astarts}
            scales = None
            if int8_blob:
                from sema_tpu.ops.quant import quantize_rows
                blob, scales = quantize_rows(blob)
            self._ivf_layout_save(seg_range, lp, meta, vectors=blob,
                                  scales=scales, spill=True)
            cached = self._ivf_layout_load(seg_range, lp,
                                           need_vectors=True, spill=True)
            if cached is None:   # write failed (disk full etc.)
                return None
            if int8_blob and "scales" not in cached:
                return None
        return {"perm": cached["perm"], "centroids": cached["centroids"],
                "starts": cached["starts"], "vectors": cached["vectors"],
                "scales": cached.get("scales"),
                "n_pad": int(cached["perm"].shape[0])}

    def _bucket_valid_host(self, seg_range, n_pad: int) -> np.ndarray:
        valid = np.zeros((n_pad,), dtype=bool)
        off = 0
        for seg in self.segments[seg_range[0]:seg_range[1]]:
            v = np.ones((seg.rows,), dtype=bool)
            if seg.deleted:
                v[sorted(seg.deleted)] = False
            valid[off:off + seg.rows] = v
            off += seg.rows
        return valid

    def _build_bucket(self, seg_range, row_offset: int, sealed: bool,
                      min_capacity_rows: int = 0) -> dict:
        from jax.sharding import PartitionSpec as P

        rows = sum(s.rows for s in self.segments[seg_range[0]:seg_range[1]])
        n_pad = self._pad_rows(max(rows, min_capacity_rows))
        host = np.zeros((n_pad, self.dim), dtype=self.np_dtype)
        off = 0
        for seg in self.segments[seg_range[0]:seg_range[1]]:
            host[off:off + seg.rows] = seg.vectors
            off += seg.rows
        valid = self._bucket_valid_host(seg_range, n_pad)

        axis = self._row_axes()
        ivf_meta = None
        ivf_here = sealed and self._ivf_eligible(n_pad)
        if ivf_here:
            # the layout is a pure function of the rows — reuse a
            # persisted sidecar (index/ivf_cache.py) instead of re-running
            # device k-means on every open/rebuild of an unchanged bucket
            cached = self._ivf_layout_load(seg_range, n_pad)
            if cached is not None:
                host = host[cached["perm"]]
                valid = valid[cached["perm"]]
                ivf_meta = {"perm": cached["perm"],
                            "centroids": cached["centroids"],
                            "starts": cached["starts"]}
                ivf_here = False   # skip the compute paths below
        if ivf_here and self._shards() > 1:
            # mesh: cluster every shard's row block INDEPENDENTLY so the
            # cluster-major permutation stays block-local — shard
            # boundaries are preserved (no cross-chip gather to apply it)
            # and each chip's probe prunes within its own shard. The
            # per-shard centroid/offset tables ((shards, C, d) /
            # (shards, C+2)) drive per-shard host probes; dispatch goes
            # through parallel/sharded_topk.py:make_sharded_pruned_topk.
            # Permute on HOST before the upload (block-local jnp.take
            # over a sharded array would still lower to a gather
            # collective) — clustering itself runs on device per block.
            from sema_tpu.ops.ivf import cluster_layout, kmeans_cluster
            shards = self._shards()
            sr = n_pad // shards
            c = max(16, sr // self.IVF_CLUSTER_ROWS)
            perm = np.empty(n_pad, dtype=np.int32)
            cents = np.empty((shards, c, self.dim), dtype=np.float32)
            starts = np.empty((shards, c + 2), dtype=np.int64)
            for s in range(shards):
                a, ct = kmeans_cluster(jnp.asarray(host[s*sr:(s+1)*sr]), c)
                p, st = cluster_layout(np.asarray(a), c + 1)
                perm[s*sr:(s+1)*sr] = p + s * sr
                cents[s] = np.asarray(ct)
                starts[s] = st
            host = host[perm]
            valid = valid[perm]
            ivf_meta = {"perm": perm, "centroids": cents,
                        "starts": starts}
            self._ivf_layout_save(seg_range, n_pad, ivf_meta)
        dev = self._put(host, P(axis, None))
        if ivf_here and self._shards() == 1:
            # cluster on device (bf16 rows even for int8 stores — the
            # layout decision deserves full precision and quantization
            # happens after the permutation so per-row scales ride along
            # automatically), then reorder cluster-major. The kernel's
            # hits come back as PERMUTED positions; search_batch_finish
            # maps them through ``perm`` before the global row offset.
            from sema_tpu.ops.ivf import cluster_layout, kmeans_cluster
            c = max(16, n_pad // self.IVF_CLUSTER_ROWS)
            assign, cent = kmeans_cluster(dev, c)
            # c + 1: padding rows live in the overflow cluster past every
            # real one (never probed, never scanned)
            perm, starts = cluster_layout(np.asarray(assign), c + 1)
            dev = jnp.take(dev, jnp.asarray(perm), axis=0)
            valid = valid[perm]
            ivf_meta = {"perm": perm,
                        "centroids": np.asarray(cent),
                        "starts": starts}
            self._ivf_layout_save(seg_range, n_pad, ivf_meta)
        if self.store_dtype == "int8":
            # upload the bf16 rows and quantize on device (see
            # _quantize_rows_device) — no host-side numpy pass
            qvals, scales = _quantize_rows_device(dev)
            store = (qvals, scales)
            self._store_specs = (P(axis, None), P(axis))
        else:
            store = dev
            self._store_specs = P(axis, None)
        return {
            "store": store,
            "ivf": ivf_meta,
            "valid": self._put(valid, P(axis)),
            # every row live AND no padding: eligible for the mask-free
            # scan kernel (one fewer full VPU pass per tile)
            "all_valid": bool(valid.all()),
            "n_pad": n_pad, "rows": rows,
            "seg_range": tuple(seg_range), "row_offset": row_offset,
            "sealed": sealed,
        }

    def _extend_bucket_on_device(self, bucket: dict, seg_start: int,
                                 seg_end: int, rows_add: int) -> dict:
        """Append segments [seg_start, seg_end) into ``bucket``'s spare
        padded capacity via a device-side dynamic_update_slice (the write
        offset is a traced scalar, so one compiled update per
        (capacity, append-rows) shape pair serves every position).

        Returns a NEW bucket dict; the input bucket and its arrays are
        left untouched so in-flight searches holding the old snapshot
        keep valid device buffers.

        Segments whose rows are still device-resident (``_pending_dev``,
        stashed by :meth:`add_chunks` during serve-time re-index) feed the
        append directly — no memmap read, no host→device upload of the new
        rows. The validity mask is always host-built (it must reflect any
        tombstones that landed since the append)."""
        segs = self.segments[seg_start:seg_end]
        pend = [self._pending_dev.get(s.name) for s in segs]
        valid = self._bucket_valid_host((seg_start, seg_end), rows_add)
        if all(p is not None for p in pend):
            vals_dev = (pend[0] if len(pend) == 1
                        else jnp.concatenate(pend, axis=0))
        else:
            vals = np.zeros((rows_add, self.dim), dtype=self.np_dtype)
            off = 0
            for seg in segs:
                vals[off:off + seg.rows] = seg.vectors
                off += seg.rows
            vals_dev = jnp.asarray(vals)
        for seg in segs:
            self._pending_dev.pop(seg.name, None)
        row0 = jnp.int32(bucket["rows"])
        if self.store_dtype == "int8":
            qvals, scales = _quantize_rows_device(
                vals_dev if vals_dev.dtype == jnp.bfloat16
                else vals_dev.astype(jnp.bfloat16))
            qd, sd = bucket["store"]
            store = (_device_append2(qd, qvals, row0),
                     _device_append1(sd, scales, row0))
        else:
            store = _device_append2(bucket["store"], vals_dev, row0)
        new_valid = _device_append1(bucket["valid"], jnp.asarray(valid),
                                    row0)
        rows = bucket["rows"] + rows_add
        return {**bucket, "store": store, "valid": new_valid,
                "all_valid": False,   # the arena keeps padded capacity
                "rows": rows,
                "seg_range": (bucket["seg_range"][0], seg_end),
                "sealed": rows >= self.SEAL_ROWS}

    def _build_device(self) -> None:
        """Extend/refresh the bucket list.

        Existing buckets are reused untouched (their segments are
        immutable; full invalidation on load/compaction guarantees they
        cover a contiguous segment prefix). Uncovered trailing segments
        get NEW buckets — one per append in the streaming case, split at
        SEAL_ROWS for bulk builds — and a tail fragmented past
        MAX_TAIL_BUCKETS unsealed buckets consolidates into one."""
        buckets = list(self._buckets or [])
        reused = {id(b) for b in buckets}
        budget = self._hbm_budget_bytes() if self.mesh is None else None
        dev_bytes = sum(self._bucket_dev_bytes(b["n_pad"])
                        for b in buckets if not b.get("host_resident"))
        covered = buckets[-1]["seg_range"][1] if buckets else 0
        row_offset = (buckets[-1]["row_offset"] + buckets[-1]["rows"]
                      if buckets else 0)
        n_segs = len(self.segments)
        seg_start = covered
        # arena extension: when the last bucket is unsealed and has spare
        # padded capacity, append the new segments into it ON DEVICE
        # (dynamic_update_slice at a traced offset — no host re-upload of
        # existing rows, no new bucket). The tail therefore stays ONE
        # bucket across streamed appends, so every query pays one scan
        # dispatch for the whole tail instead of one per append (a
        # dispatch is ~27 ms on tunneled hosts — this dominated serving
        # p50 under streaming re-index). The pow2 padding ladder
        # (_pad_rows) doubles capacity on each overflow rebuild, so
        # host re-uploads amortize to O(log rows). Single-device only:
        # with a mesh, row offsets need not align to shard boundaries.
        if (buckets and not buckets[-1]["sealed"] and self.mesh is None
                and seg_start < n_segs):
            last = buckets[-1]
            free = last["n_pad"] - last["rows"]
            rows_add = 0
            take_end = seg_start
            while (take_end < n_segs
                   and rows_add + self.segments[take_end].rows <= free
                   and last["rows"] + rows_add < self.SEAL_ROWS):
                rows_add += self.segments[take_end].rows
                take_end += 1
            if take_end > seg_start:
                rows_new = last["rows"] + rows_add
                seals = rows_new >= self.SEAL_ROWS
                extended = None
                if seals and self._ivf_eligible(self._pad_rows(rows_new)):
                    # an extension that SEALS an IVF-mode bucket must
                    # not leave it unclustered forever (buckets are
                    # reused untouched once sealed — without this, a
                    # streaming-append store would never prune until a
                    # reopen rebuilt its buckets). Sealing is known
                    # BEFORE extending, so build the clustered
                    # replacement directly instead of paying the device
                    # append and throwing it away. On OOM fall through
                    # to the ordinary (unclustered) extension —
                    # clustering is an optimization, never worth
                    # failing a build over.
                    try:
                        extended = self._build_bucket(
                            (last["seg_range"][0], take_end),
                            last["row_offset"], sealed=True)
                    except Exception as e:
                        msg = str(e).lower()
                        if not ("resource_exhausted" in msg
                                or "out of memory" in msg):
                            raise
                if extended is None:
                    extended = self._extend_bucket_on_device(
                        last, seg_start, take_end, rows_add)
                buckets[-1] = extended          # fresh dict: in-flight
                reused.discard(id(last))        # searches keep the old one
                reused.add(id(extended))
                seg_start = take_end
                row_offset += rows_add
        while seg_start < n_segs:
            rows = 0
            seg_end = seg_start
            while seg_end < n_segs and rows < self.SEAL_ROWS:
                rows += self.segments[seg_end].rows
                seg_end += 1
            sealed = rows >= self.SEAL_ROWS
            if sealed:
                # a sealing-size bulk append BYPASSES any earlier
                # unsealed buckets: only the last bucket is ever
                # arena-extended, so an unsealed bucket behind a sealed
                # one could neither grow nor (suffix-anchored)
                # consolidate — each bulk/small cycle would strand one
                # more fragment, and per-query dispatches would grow
                # without bound (review finding, r3). Freeze them: they
                # become ordinary small sealed buckets, and the disk-
                # level segment compaction merges their segments on the
                # next load.
                for b in buckets:
                    if not b["sealed"]:
                        b["sealed"] = True
            # unsealed single-device tail buckets get 2× headroom so the
            # next streamed appends land in-place (arena extension above);
            # with the pow2 ladder this doubles capacity per overflow
            # rebuild → host re-uploads amortize to O(log rows)
            headroom = (2 * rows if not sealed and self.mesh is None
                        else 0)
            n_pad_new = self._pad_rows(max(rows, headroom))
            # sealed buckets past the budget stay host-resident (HBM
            # spill, see the class comment); the small unsealed tail
            # always goes to device — the arena append path needs it.
            # Admission charges the BUILD-TIME transient (int8 stages
            # bf16 before quantizing); accumulation charges steady state
            if (sealed and budget is not None
                    and dev_bytes + self._bucket_dev_bytes(
                        n_pad_new, transient=True) > budget):
                buckets.append(self._build_host_bucket(
                    (seg_start, seg_end), row_offset))
            else:
                try:
                    buckets.append(self._build_bucket(
                        (seg_start, seg_end), row_offset, sealed=sealed,
                        min_capacity_rows=headroom))
                    dev_bytes += self._bucket_dev_bytes(n_pad_new)
                except Exception as e:   # RESOURCE_EXHAUSTED → spill
                    msg = str(e).lower()
                    oom = ("resource_exhausted" in msg
                           or "out of memory" in msg)
                    if not (oom and self.mesh is None):
                        raise
                    buckets.append(self._build_host_bucket(
                        (seg_start, seg_end), row_offset))
            row_offset += rows
            seg_start = seg_end
        # consolidate a fragmented unsealed tail. Anchor at the maximal
        # all-unsealed SUFFIX (scan from the end), not the first unsealed
        # bucket: a bulk append behind a small unsealed tail produces
        # unsealed-then-sealed ordering, and anchoring early would
        # re-upload sealed buckets the design promises never to touch
        tail_from = len(buckets)
        while tail_from > 0 and not buckets[tail_from - 1]["sealed"]:
            tail_from -= 1
        if len(buckets) - tail_from > self.MAX_TAIL_BUCKETS:
            first = buckets[tail_from]
            rows = sum(b["rows"] for b in buckets[tail_from:])
            sealed = rows >= self.SEAL_ROWS
            seg_merge = (first["seg_range"][0],
                         buckets[-1]["seg_range"][1])
            headroom = (2 * rows if not sealed and self.mesh is None
                        else 0)
            # the consolidated bucket obeys the SAME spill policy as the
            # bulk loop (review finding: an over-budget store could
            # still OOM here, mid-serve): a sealing-size merge past the
            # budget goes host-resident, and a RESOURCE_EXHAUSTED during
            # the merged upload degrades instead of failing the search
            merged = None
            if sealed and budget is not None:
                others = sum(self._bucket_dev_bytes(b["n_pad"])
                             for b in buckets[:tail_from]
                             if not b.get("host_resident"))
                projected = self._bucket_dev_bytes(
                    self._pad_rows(max(rows, headroom)), transient=True)
                if others + projected > budget:
                    merged = self._build_host_bucket(
                        seg_merge, first["row_offset"])
            if merged is None:
                try:
                    merged = self._build_bucket(
                        seg_merge, first["row_offset"], sealed=sealed,
                        min_capacity_rows=headroom)
                except Exception as e:   # RESOURCE_EXHAUSTED → spill
                    msg = str(e).lower()
                    oom = ("resource_exhausted" in msg
                           or "out of memory" in msg)
                    if not (oom and self.mesh is None):
                        raise
                    merged = self._build_host_bucket(
                        seg_merge, first["row_offset"])
            buckets = buckets[:tail_from] + [merged]
        if self._valid_dirty:
            # tombstones changed: re-upload only the boolean masks of the
            # buckets that predate this rebuild
            from jax.sharding import PartitionSpec as P
            for b in buckets:
                # host-resident buckets have no device mask: their
                # validity is rebuilt per slice at scan time, so fresh
                # tombstones are picked up with no re-upload
                if id(b) in reused and not b.get("host_resident"):
                    host_valid = self._bucket_valid_host(
                        b["seg_range"], b["n_pad"])
                    b["all_valid"] = bool(host_valid.all())
                    ivf = b.get("ivf")
                    if ivf is not None:
                        # the bucket's rows are cluster-major: the mask
                        # must follow the same permutation
                        host_valid = host_valid[ivf["perm"]]
                    b["valid"] = self._put(host_valid,
                                           P(self._row_axes()))
        self._buckets = buckets
        self._valid_dirty = False
        # every segment is covered now: any pending device rows that a
        # host-path build consumed (fresh/consolidated buckets read the
        # memmaps) are dead weight — drop them so HBM residency stays
        # bounded at one append batch
        self._pending_dev.clear()

    def device_buckets(self):
        with self._lock:
            # rebuild when buckets are missing, stale, or don't cover every
            # segment — after _invalidate_device(tail_only=True) the sealed
            # prefix survives but the trailing segments have no bucket yet
            covered = bool(self._buckets) and (
                self._buckets[-1]["seg_range"][1] == len(self.segments))
            if (self.segments and not covered) or self._valid_dirty \
                    or self._buckets is None:
                self._build_device()
            return list(self._buckets)  # snapshot for lock-free searching

    def device_residency(self) -> dict:
        """Observability: where the store currently lives (device vs
        spilled-to-host buckets). NON-FORCING and NON-BLOCKING — peeks
        the existing bucket list without building one, and if a mutator
        holds the store lock (a cold multi-GB _build_device can hold it
        for minutes on tunneled hosts) reports ``busy`` instead of
        hanging the caller's health probe (review finding: a blocking
        acquire here turned /healthz into a liveness-check killer)."""
        if not self._lock.acquire(blocking=False):
            return {"buckets": None, "host_buckets": None,
                    "spilled_rows": None, "device_bytes": None,
                    "busy": True}
        try:
            buckets = list(self._buckets or [])
        finally:
            self._lock.release()
        host = [b for b in buckets if b.get("host_resident")]
        dev = [b for b in buckets if not b.get("host_resident")]
        return {
            "buckets": len(buckets),
            "host_buckets": len(host),
            "spilled_rows": sum(b["rows"] for b in host),
            "device_bytes": sum(self._bucket_dev_bytes(b["n_pad"])
                                for b in dev),
            "busy": False,
        }

    def device_arrays(self):
        """Single-bucket view (kept for tests/tools); the serving path is
        :meth:`device_buckets`."""
        buckets = self.device_buckets()
        assert len(buckets) == 1, "store spans multiple device buckets"
        return buckets[0]["store"], buckets[0]["valid"]

    # -- row id → chunk ---------------------------------------------------------

    def _seg_starts(self) -> np.ndarray:
        """Cumulative row offsets, (S+1,), for O(log S) row→segment.

        Returns the LOCAL array, and rebuilds under the lock: serving
        threads call this while a mutator appends (which both extends
        ``segments`` and nulls the cache) — returning ``self._starts``
        unlocked could yield None mid-invalidation, and enumerating a
        list being appended could outrun the pre-sized array."""
        starts = self._starts
        if starts is None:
            with self._lock:
                segs = list(self.segments)
                starts = np.zeros(len(segs) + 1, dtype=np.int64)
                for i, s in enumerate(segs):
                    starts[i + 1] = starts[i] + s.rows
                self._starts = starts
        return starts

    def _locate(self, row: int) -> Tuple[_Segment, int]:
        starts = self._seg_starts()
        if not (0 <= row < starts[-1]):
            raise IndexError(row)
        si = int(np.searchsorted(starts, row, side="right")) - 1
        return self.segments[si], row - int(starts[si])

    def chunk_at(self, row: int) -> Chunk:
        row = int(row)
        hit = self._chunk_cache.get(row)
        if hit is not None:
            return hit
        seg, local = self._locate(row)
        r = seg.meta_row(local)
        chunk = Chunk(id=r["id"], file_path=Path(r["file_path"]),
                      start_line=r["start_line"],
                      end_line=r["end_line"], content=r["content"])
        if len(self._chunk_cache) >= self._chunk_cache_max:
            self._chunk_cache.clear()   # amortized O(1) bound
        self._chunk_cache[row] = chunk
        return chunk

    def rows_at(self, rows: np.ndarray) -> np.ndarray:
        """Gather original (full-precision) vectors for global row ids —
        the host side of the int8 rescore pass. One memmap row read each;
        nothing else pages in."""
        out = np.zeros((len(rows), self.dim), dtype=np.float32)
        for i, row in enumerate(rows):
            seg, local = self._locate(int(row))
            out[i] = np.asarray(seg.vectors[local], dtype=np.float32)
        return out

    # -- search -----------------------------------------------------------------

    def _scan_fn(self, n_pad: int, k_eff: int, all_valid: bool = False,
                 dtype_override: Optional[str] = None):
        """Compiled (store, queries, valid) -> (scores, ids), cached per
        (rows, k, dtype, maskedness). Single-device uses the fused Pallas
        scan; multi-device wraps the local scan in the shard_map
        all-gather merge. ``all_valid`` selects the mask-free kernel
        variant (single-device bf16 only) for buckets with every row
        live. ``dtype_override`` scans with a different element type
        than the store's nominal one — the HBM-spill path streams an
        int8 store's bf16 DISK originals, so its slices select with
        full-precision scores and skip the per-slice quantization pass
        (the upload is bf16-width either way; candidates still go
        through the exact rescore)."""
        sdt = dtype_override or self.store_dtype
        all_valid = all_valid and self.mesh is None and sdt != "int8"
        key = (n_pad, k_eff, sdt, all_valid)
        fn = self._topk_fns.get(key)
        if fn is not None:
            return fn

        from functools import partial
        # Backend choice (honest-fetch measurements, docs/PERF.md): the
        # Pallas fused scan (no (Q, N) score round-trip to HBM;
        # threshold-screened in-place two-stage merge) wins every batch
        # size since the merge rewrite — same-process A/B at 1M×384:
        # Q=1 5.3 vs hier 14.7 ms, Q=256 7.9 ms/batch — and stays
        # eligible whenever each device's shard is tile-aligned —
        # single-device AND as the per-shard local_fn under the
        # shard_map merge. SEMA_TPU_SCAN_BACKEND=hier|pallas pins one
        # backend (pallas off-TPU runs the kernel in interpret mode —
        # tests only); hier is also the >K_PAD-k fallback.
        backend = os.environ.get("SEMA_TPU_SCAN_BACKEND", "auto")
        shard_rows = n_pad // self._shards()
        on_tpu = jax.default_backend() == "tpu"
        pallas_ok = (
            backend != "hier" and (on_tpu or backend == "pallas")
            and shard_rows % 2048 == 0 and k_eff <= 128)

        if sdt == "int8":
            from sema_tpu.ops.quant import int8_topk_scores

            def hier_fn(store, queries, valid, k):
                return int8_topk_scores(store[0], store[1], queries,
                                        valid, k)
            # int8 scans run at k=rescore_k (≥100): the old full-width
            # merge lost to the XLA path there, but the in-place
            # two-stage merge wins (24.7 vs 35.1 ms/64q at 524k×1024
            # k=100, same-process honest fetch, id sets equal)
            if pallas_ok:
                from sema_tpu.ops.pallas_topk import pallas_topk_int8

                def pallas_fn(store, queries, valid, k):
                    return pallas_topk_int8(store[0], store[1], queries,
                                            valid, k, tile_n=2048,
                                            interpret=not on_tpu)
            else:
                pallas_fn = None
        else:
            from sema_tpu.ops.hier_topk import batched_topk_scores_hier
            hier_fn = batched_topk_scores_hier
            if pallas_ok:
                from sema_tpu.ops.pallas_topk import pallas_topk_scores
                pallas_fn = partial(pallas_topk_scores, tile_n=2048,
                                    interpret=not on_tpu,
                                    masked=not all_valid)
            else:
                pallas_fn = None

        def compile_one(local_fn):
            if self.mesh is not None and self.slice_axis is not None:
                from sema_tpu.parallel.multislice import \
                    make_multislice_topk
                inner = make_multislice_topk(
                    self.mesh, n_pad, k_eff, slice_axis=self.slice_axis,
                    index_axis=self.index_axis,
                    local_fn=local_fn, store_specs=self._store_specs)
            elif self.mesh is not None:
                from sema_tpu.parallel.sharded_topk import make_sharded_topk
                inner = make_sharded_topk(
                    self.mesh, n_pad, k_eff, axis=self.index_axis,
                    local_fn=local_fn, store_specs=self._store_specs)
            else:
                inner = partial(local_fn, k=k_eff)

            # pack (scores, ids) into ONE (Q, 2k) array inside the jit:
            # each bucket result then costs a single device→host fetch
            # instead of two. On tunneled hosts a fetch is ~27 ms of pump
            # RTT — with several LSM buckets this halved the serving
            # batch p50 (round-3 profiling, PERF.md).
            #
            # The pack lives in the INTEGER domain (scores bitcast
            # f32→i32, ids left as i32), NOT ids bitcast to f32: an i32
            # id below 2^23 reinterprets as an f32 DENORMAL, and when XLA
            # fuses the bitcast into the selection fusion the TPU VPU
            # flushes those to zero — every id under 8.4M silently became
            # 0 on the XLA path (scores were right, every hit mapped to
            # row 0; caught by an end-to-end verify on a 6-row store,
            # round 3). Integer ops have no denormals, so the i32-domain
            # pack is a pure bit-preserving copy; scores unpack on host
            # with .view(np.float32).
            def packed(store, queries, valid):
                s, i = inner(store, queries, valid)
                return jnp.concatenate(
                    [jax.lax.bitcast_convert_type(s, jnp.int32), i],
                    axis=1)
            return jax.jit(packed)

        if backend == "pallas" and pallas_fn is not None:
            fn = compile_one(pallas_fn)
        elif pallas_fn is None or backend == "hier":
            fn = compile_one(hier_fn)
        else:
            # auto: pallas at every batch size. The in-place two-stage
            # merge made the kernel win the single-query regime too
            # (same-process A/B at 1M×384: 5.3 vs hier 14.7 ms Q=1,
            # 7.9 ms/batch-256 — docs/PERF.md); hier remains the oracle,
            # the CPU path, and the >K_PAD-k fallback.
            fn = compile_one(pallas_fn)
        self._topk_fns[key] = fn
        return fn

    def _ivf_scan_fn(self, n_pad: int, k_eff: int, t: int,
                     dtype_override: Optional[str] = None,
                     tile_n: Optional[int] = None):
        """Compiled pruned scan (store, queries, valid, tile_ids, n_live)
        → packed (Q, 2k) i32, cached per (rows, k, dtype, budget, tile).
        Same single-fetch packing contract as _scan_fn. On a mesh the
        pruned kernel runs per shard under the shard_map all-gather merge
        (tiles/n_live arrive as per-shard tables sharded with the
        store); single-device calls the kernel directly.
        ``dtype_override`` mirrors _scan_fn's: the spilled-IVF path
        stages an int8 store's bf16 DISK originals. ``tile_n`` overrides
        the kernel tile (the spilled path's finer _spill_tile)."""
        sdt = dtype_override or self.store_dtype
        tile = tile_n or self.IVF_TILE
        key = ("ivf", n_pad, k_eff, sdt, t, tile)
        fn = self._topk_fns.get(key)
        if fn is not None:
            return fn
        on_tpu = jax.default_backend() == "tpu"
        if sdt == "int8":
            from sema_tpu.ops.pallas_topk import pallas_topk_int8_pruned

            def local(store, q, valid, tiles, nl):
                return pallas_topk_int8_pruned(
                    store[0], store[1], q, valid, tiles, nl, k_eff,
                    tile_n=tile, interpret=not on_tpu)
        else:
            from sema_tpu.ops.pallas_topk import pallas_topk_pruned

            def local(store, q, valid, tiles, nl):
                return pallas_topk_pruned(
                    store, q, valid, tiles, nl, k_eff,
                    tile_n=tile, interpret=not on_tpu)

        if self.mesh is not None and self.slice_axis is not None:
            from sema_tpu.parallel.multislice import \
                make_multislice_pruned_topk
            inner = make_multislice_pruned_topk(
                self.mesh, n_pad, k_eff, slice_axis=self.slice_axis,
                index_axis=self.index_axis,
                local_fn=lambda st, q, v, ti, nl, k: local(st, q, v,
                                                           ti, nl),
                store_specs=self._store_specs)
        elif self.mesh is not None:
            from sema_tpu.parallel.sharded_topk import \
                make_sharded_pruned_topk
            inner = make_sharded_pruned_topk(
                self.mesh, n_pad, k_eff, axis=self.index_axis,
                local_fn=lambda st, q, v, ti, nl, k: local(st, q, v,
                                                           ti, nl),
                store_specs=self._store_specs)
        else:
            inner = local

        def packed(store, q, valid, tiles, nl):
            s, i = inner(store, q, valid, tiles, nl)
            # integer-domain pack — see _scan_fn for why NOT ids→f32
            return jnp.concatenate(
                [jax.lax.bitcast_convert_type(s, jnp.int32), i], axis=1)

        fn = jax.jit(packed)
        self._topk_fns[key] = fn
        return fn

    def _ivf_dispatch(self, b: dict, q, q_live_host: np.ndarray,
                      k_scan: int):
        """Try the pruned (ANN) scan for one IVF-clustered bucket.

        Returns a pending entry, or None when the probe's tile union
        exceeds the static budget (large/diverse query batches — the
        exact scan is the better program there) or the backend can't run
        the Pallas kernel. ``q_live_host`` is the LIVE query rows
        already on host (fetched ONCE by the caller — a per-bucket
        np.asarray of a device-resident query would add one blocking
        round-trip per IVF bucket); phantom zero-padded serving rows
        would union garbage clusters.
        """
        from sema_tpu.ops.ivf import select_tiles
        if k_scan > 128:           # K_PAD ceiling of the fused kernels
            return None
        on_tpu = jax.default_backend() == "tpu"
        if not (on_tpu
                or os.environ.get("SEMA_TPU_SCAN_BACKEND") == "pallas"):
            return None
        ivf = b["ivf"]
        if ivf["centroids"].ndim == 3:
            # mesh bucket: one probe per shard against its own centroid
            # table; every shard shares the static tile budget (the
            # sharded kernel's grid). A single over-budget shard fails
            # the whole dispatch to the exact scan — mixed exact/pruned
            # shards would need a second program shape per combination.
            from jax.sharding import PartitionSpec as P
            shards, c = ivf["centroids"].shape[:2]
            sr = b["n_pad"] // shards
            budget = max(2, (sr // self.IVF_TILE) // self.IVF_BUDGET_DIV)
            tiles = np.zeros((shards, budget), dtype=np.int32)
            n_live = np.ones((shards, 1), dtype=np.int32)
            for s in range(shards):
                if ivf["starts"][s][c] == 0:
                    # all-padding shard (bulk pads land in a trailing
                    # block): a 1-live-tile dummy probe of its first
                    # (all-invalid) tile keeps the program shape uniform
                    # and contributes only -inf candidates
                    continue
                sel = select_tiles(ivf["centroids"][s], ivf["starts"][s],
                                   q_live_host, self.ivf_nprobe,
                                   self.IVF_TILE, budget)
                if sel is None:
                    return None
                tiles[s], n_live[s, 0] = sel
            fn = self._ivf_scan_fn(b["n_pad"], k_scan, budget)
            packed = fn(b["store"], q, b["valid"],
                        self._put(tiles, P(self._row_axes(), None)),
                        self._put(n_live, P(self._row_axes(), None)))
            return [b["row_offset"], packed, k_scan, ivf["perm"]]
        n_tiles = b["n_pad"] // self.IVF_TILE
        budget = max(2, n_tiles // self.IVF_BUDGET_DIV)
        sel = select_tiles(ivf["centroids"], ivf["starts"],
                           q_live_host,
                           self.ivf_nprobe, self.IVF_TILE, budget)
        if sel is None:
            return None
        tiles, n_live_tiles = sel
        fn = self._ivf_scan_fn(b["n_pad"], k_scan, budget)
        packed = fn(b["store"], q, b["valid"], jnp.asarray(tiles),
                    jnp.asarray([n_live_tiles], dtype=jnp.int32))
        return [b["row_offset"], packed, k_scan, ivf["perm"]]

    def _dead_bitmap(self, seg_range, rows: int) -> Optional[np.ndarray]:
        """(rows,) bool of tombstoned bucket-relative rows, or None when
        nothing is deleted (the overwhelmingly common case — callers skip
        the mask work entirely)."""
        deleted = self._deleted_snapshot(seg_range)
        if all(d is None for d in deleted):
            return None
        dead = np.zeros((rows,), dtype=bool)
        off = 0
        for seg, d in zip(self.segments[seg_range[0]:seg_range[1]],
                          deleted):
            if d is not None:
                dead[off + d] = True
            off += seg.rows
        return dead

    # probes of at least this many live tiles stage in TWO halves so
    # the second half's disk gather overlaps the first half's async
    # host→device upload (see _ivf_spill_dispatch)
    IVF_SPLIT_MIN_TILES = 16

    def _spill_union_view(self, spill_bs: list) -> dict:
        """Concatenated probe view over spilled buckets' IVF layouts.

        The union centroid matrix plus a cluster→row-span table in a
        VIRTUAL blob space where bucket ``bi``'s (tile-aligned) blob
        occupies rows ``[voffs[bi], voffs[bi+1])``. ``select_tiles``
        runs on this view unchanged — a global tile id maps back to
        (bucket, local tile) through the voffs ranges, which stay
        tile-aligned because every blob's total is a tile multiple.

        Cached by bucket content identity ((seg_range, row_offset) per
        bucket): bucket dicts are immutable once built, and a rebuild
        that re-covers the same segments reuses the same persisted
        layout, so cross-rebuild reuse is sound."""
        key = tuple((b["seg_range"], b["row_offset"]) for b in spill_bs)
        view = self._spill_union.get(key)
        if view is not None:
            return view
        t = self._spill_tile()
        cents, starts, offs = [], [], [0]
        v = 0
        for b in spill_bs:
            iv = b["ivf_spill"]
            c = len(iv["centroids"])
            cents.append(np.asarray(iv["centroids"], np.float32))
            starts.append(np.asarray(iv["starts"][:c], np.int64) + v)
            v += int(iv["n_pad"])     # aligned blob total (== starts[c])
            offs.append(v)
        starts.append(np.asarray([v], dtype=np.int64))
        view = {"centroids": np.concatenate(cents, axis=0),
                "starts": np.concatenate(starts),
                "voffs": np.asarray(offs, dtype=np.int64),
                "n_tiles": v // t}
        if len(self._spill_union) > 8:    # bucket lists churn slowly;
            self._spill_union.clear()     # bound the stale views
        self._spill_union[key] = view
        return view

    def _ivf_spill_dispatch(self, spill_bs: list, q,
                            q_live_host: np.ndarray,
                            k_scan: int, window: list):
        """Pruned probe over the UNION of spilled buckets: select each
        query's top-nprobe clusters across every spilled bucket's
        centroids at once (_spill_union_view), gather only the probed
        tiles from the tile-aligned cluster-major disk blobs (one
        coalesced read per probed cluster), upload ONE probe-sized
        staging buffer (``_stage_tiles`` rounding), and scan it with
        the pruned kernel (identity tile ids; pad steps repeat the last
        live tile so Mosaic elides their DMA).

        This is what makes an over-HBM store SERVABLE for interactive
        queries: the exact streamed scan moves the whole spilled tier
        host→device per batch, the probe moves ~1/IVF_BUDGET_DIV of it
        at most and typically a few percent. The union matters as much
        as the pruning: per-bucket probes pay nprobe clusters PER
        BUCKET per query — on a live build that spilled 17 SEAL_ROWS
        buckets, a 16-query batch probed most of every bucket and
        served at ~33 s/batch (4M config-5 rehearsal, r4); the union
        probe picks nprobe clusters TOTAL per query, skips unprobed
        buckets entirely, and serves the same store at the
        consolidated-single-bucket speed (~2 s for the same batch).

        Probes of ≥ IVF_SPLIT_MIN_TILES live tiles stage in two halves
        dispatched back-to-back: PJRT uploads are async, so the second
        half's memmap gather runs while the first half streams
        host→device. The halves split the SAME ``_stage_tiles(n_live)``
        buffer (b_eff//2 + remainder), so total staged bytes — and the
        accounting in tools/spill_ivf_bench.py — are identical to an
        unsplit probe. Each half is its own pending entry; the merge
        path treats them like any other bucket candidates.

        Returns a non-empty list of pending entries (joined to the
        shared staging ``window`` — same HBM bound as streamed slices),
        or None → caller retries per bucket, then falls back to the
        full streamed scan."""
        from sema_tpu.ops.ivf import select_tiles
        if k_scan > 128:           # K_PAD ceiling of the fused kernels
            return None
        on_tpu = jax.default_backend() == "tpu"
        if not (on_tpu
                or os.environ.get("SEMA_TPU_SCAN_BACKEND") == "pallas"):
            return None
        t = self._spill_tile()
        view = self._spill_union_view(spill_bs)
        budget = max(2, view["n_tiles"] // self.IVF_BUDGET_DIV)
        sel = select_tiles(view["centroids"], view["starts"],
                           q_live_host, self.ivf_nprobe, t, budget)
        if sel is None:
            return None
        tiles, n_live = sel
        live_tiles = tiles[:n_live]
        b_eff = _stage_tiles(n_live, budget)
        if (n_live >= self.IVF_SPLIT_MIN_TILES
                and os.environ.get("SEMA_TPU_IVF_SPLIT", "1") != "0"):
            # (n_live ≥ IVF_SPLIT_MIN_TILES already implies b_eff ≥ 16
            # via b_eff ≥ n_live — no extra size guard needed.)
            # Halves stay on the _stage_tiles grid (sum == b_eff) so
            # the split reuses the unsplit path's compiled sizes; tiles
            # apportion to fit: n1 ≤ b1 by construction and
            # n_live - n1 ≤ b_eff - b1 follows from b_eff ≥ n_live.
            b1, b2 = _split_stage_halves(b_eff)
            n1 = min(n_live // 2, b1)
            specs = ((live_tiles[:n1], b1),
                     (live_tiles[n1:], b2))
        else:
            specs = ((live_tiles, b_eff),)
        return [self._ivf_spill_stage(spill_bs, view, lt, be, q, k_scan,
                                      window)
                for lt, be in specs]

    def _ivf_spill_stage(self, spill_bs: list, view: dict,
                         live_tiles: np.ndarray, b_eff: int, q,
                         k_scan: int, window: list):
        """Gather one probe tile-subset (possibly spanning several
        spilled buckets' blobs) into a single staging buffer, upload,
        dispatch the pruned kernel (async), and return the pending
        entry (see _ivf_spill_dispatch).

        Tile ids are in the union view's virtual blob space. Staged
        order == ``live_tiles`` order, so bucket ``bi``'s staged tiles
        are exactly the contiguous run of ``live_tiles`` inside its
        ``voffs`` range. The entry's rowmap carries GLOBAL row ids
        (bucket-local row + row_offset), so the merge applies no
        per-entry offset (entry offset 0)."""
        t = self._spill_tile()
        n_live = len(live_tiles)
        # int8 stores carry a QUANTIZED blob (int8 rows + per-row f32
        # scales): half the staged upload, selection on the int8 pruned
        # kernel, and the ordinary rescore_k full-precision re-rank
        # downstream — same contract as the store's device buckets.
        # (The caller groups buckets by blob kind, so presence on the
        # first bucket speaks for the whole list.)
        scales_present = (spill_bs[0]["ivf_spill"].get("scales")
                          is not None)
        staged = np.zeros((b_eff * t, self.dim),
                          dtype=np.int8 if scales_present
                          else self.np_dtype)
        staged_scales = (np.zeros((b_eff * t,), dtype=np.float32)
                         if scales_present else None)
        rowmap = np.zeros((b_eff * t,), dtype=np.int32)
        valid = np.zeros((b_eff * t,), dtype=bool)
        voffs = view["voffs"]
        for bi, b in enumerate(spill_bs):
            iv = b["ivf_spill"]
            t_lo = int(voffs[bi]) // t
            t_hi = int(voffs[bi + 1]) // t
            lo_i = int(np.searchsorted(live_tiles, t_lo, "left"))
            hi_i = int(np.searchsorted(live_tiles, t_hi, "left"))
            if hi_i == lo_i:
                continue           # no probed tiles in this bucket
            loc = live_tiles[lo_i:hi_i] - t_lo
            # tile ids are sorted-unique and clusters are contiguous
            # tile runs in the aligned blob, so coalesce consecutive ids
            # into one memmap read per probed cluster, not one per tile
            cut = np.flatnonzero(np.diff(loc) != 1) + 1
            j = lo_i
            for run in np.split(loc, cut):
                a, n = int(run[0]), len(run)
                staged[j * t:(j + n) * t] = \
                    iv["vectors"][a * t:(a + n) * t]
                if staged_scales is not None:
                    staged_scales[j * t:(j + n) * t] = \
                        iv["scales"][a * t:(a + n) * t]
                j += n
            # staged position → original row (for the merge), and
            # validity: alignment-gap slots (sentinel perm entries
            # >= rows) + tombstones. Also reject NEGATIVE ids: the
            # sidecar is unchecksummed (a torn write is caught by atomic
            # rename + size check, but bit rot isn't) and a corrupt
            # negative perm entry would pass `< rows`, survive the scan,
            # and fetch a wrong chunk downstream.
            pos = (loc[:, None].astype(np.int64) * t
                   + np.arange(t)).ravel()
            rm = iv["perm"][pos]
            rows = b["rows"]
            v = (rm >= 0) & (rm < rows)
            dead = self._dead_bitmap(b["seg_range"], rows)
            if dead is not None:
                v &= ~dead[np.clip(rm, 0, rows - 1)]
            # clip BEFORE the global offset: even a (-inf-masked)
            # sentinel slot then maps inside this bucket's own range
            # and can never alias a neighbor bucket's rows
            s0, s1 = lo_i * t, hi_i * t
            rowmap[s0:s1] = np.clip(rm, 0, rows - 1) + b["row_offset"]
            valid[s0:s1] = v
        # identity tile ids over the staging buffer; pad steps repeat the
        # last live tile (DMA elided), their scores are masked by n_live
        tiles_ident = np.minimum(np.arange(b_eff, dtype=np.int32),
                                 n_live - 1)
        if staged_scales is not None:
            fn = self._ivf_scan_fn(b_eff * t, k_scan, b_eff, tile_n=t)
            store_op = (jnp.asarray(staged), jnp.asarray(staged_scales))
        else:
            # bf16/f32 stores (and a legacy unquantized blob of an int8
            # store) stage the disk originals at full selection precision
            override = "bfloat16" if self.store_dtype == "int8" else None
            fn = self._ivf_scan_fn(b_eff * t, k_scan, b_eff,
                                   dtype_override=override, tile_n=t)
            store_op = jnp.asarray(staged)
        packed = fn(store_op, q, jnp.asarray(valid),
                    jnp.asarray(tiles_ident),
                    jnp.asarray([n_live], dtype=jnp.int32))
        entry = [0, packed, k_scan, rowmap]
        window.append(entry)
        if len(window) >= self.SPILL_INFLIGHT:
            oldest = window.pop(0)
            oldest[1] = np.asarray(oldest[1])   # fetch → frees HBM
        return entry

    def _deleted_snapshot(self, seg_range) -> list:
        """Per-segment tombstone arrays, copied under the store lock:
        ``remove_file_chunks`` mutates ``seg.deleted`` (a set) from
        mutator threads while spilled scans read it lock-free — iterating
        the live set would race ("set changed size during iteration")."""
        with self._lock:
            return [np.fromiter(s.deleted, dtype=np.int64)
                    if s.deleted else None
                    for s in self.segments[seg_range[0]:seg_range[1]]]

    def _fill_rows_range(self, seg_range, lo: int, hi: int,
                         host: np.ndarray, valid: np.ndarray,
                         deleted: list) -> None:
        """Copy bucket-relative rows [lo, hi) from the segment memmaps
        into ``host[0:hi-lo]`` and set their liveness in ``valid``
        (slots past hi-lo stay zero/dead — slice padding). ``deleted``
        is the _deleted_snapshot for the same seg_range."""
        off = 0
        for seg, dead in zip(self.segments[seg_range[0]:seg_range[1]],
                             deleted):
            s0, s1 = off, off + seg.rows
            a, b = max(lo, s0), min(hi, s1)
            if a < b:
                dst = a - lo
                src0, src1 = a - s0, b - s0
                host[dst:dst + (b - a)] = seg.vectors[src0:src1]
                v = np.ones(b - a, dtype=bool)
                if dead is not None:
                    d = dead[(dead >= src0) & (dead < src1)]
                    v[d - src0] = False
                valid[dst:dst + (b - a)] = v
            off = s1
            if off >= hi:
                break

    def _spill_executor(self):
        """Lazy single-thread prefetcher for spilled slice fills;
        shared by concurrent searches (serialized fills also keep the
        memmap page-ins disk-friendly). Shut down by close()."""
        with self._lock:
            if self._spill_ex is None:
                from concurrent.futures import ThreadPoolExecutor
                self._spill_ex = ThreadPoolExecutor(
                    max_workers=1, thread_name_prefix="sema-spill")
            return self._spill_ex

    def _scan_host_bucket(self, b: dict, q, k_class: int,
                          window: list) -> list:
        """Stream a host-resident bucket (HBM spill) through the scan.

        Fixed-shape slices of SPILL_SLICE_ROWS (padded once, so ONE
        compiled executable serves every slice of every spilled bucket)
        are staged host→device and dispatched back-to-back; at most
        SPILL_INFLIGHT staged slices live in HBM — older results are
        force-fetched to host (mutating their pending entry in place),
        which is also what paces the staging uploads against the device.
        ``window`` is SHARED across every spilled bucket of one search
        (bulk builds split buckets at SEAL_ROWS ≈ one slice each, so a
        per-bucket window would never fill and a deeply spilled store
        would hold every staged slice in HBM at once). Returns pending
        entries in the same (row_offset, packed, k_scan, perm) shape as device
        buckets, so the merge path cannot tell the difference. int8
        stores stream their bf16 disk originals (see _scan_fn
        dtype_override)."""
        rows = b["rows"]
        slice_rows = self._pad_rows(min(self.SPILL_SLICE_ROWS, rows))
        k_scan = min(k_class, slice_rows)
        override = "bfloat16" if self.store_dtype == "int8" else None
        fn = self._scan_fn(slice_rows, k_scan, dtype_override=override)
        deleted = self._deleted_snapshot(b["seg_range"])

        def make_host(lo):
            hi = min(lo + slice_rows, rows)
            host = np.zeros((slice_rows, self.dim), dtype=self.np_dtype)
            valid = np.zeros((slice_rows,), dtype=bool)
            self._fill_rows_range(b["seg_range"], lo, hi, host, valid,
                                  deleted)
            return host, valid

        # the next slice's host fill (a 100+ ms memmap copy at full
        # slice size) prefetches on a background thread while the
        # current slice uploads + scans — numpy copies release the GIL,
        # so on local-PCIe hardware (upload ≪ fill) the fill is the
        # streamed scan's real bottleneck and this hides it; on this
        # tunneled box the upload dominates either way. Host transient:
        # the overlap keeps up to TWO slice buffers alive (current +
        # prefetched, ~400 MB at the default slice) — fresh buffers per
        # slice, NOT a reused ping-pong pair, because jnp.asarray's
        # host→device copy may still be reading the previous buffer
        # asynchronously when the next fill would overwrite it
        ex = self._spill_executor()
        nxt = ex.submit(make_host, 0)
        out = []
        for lo in range(0, rows, slice_rows):
            host, valid = nxt.result()
            if lo + slice_rows < rows:
                nxt = ex.submit(make_host, lo + slice_rows)
            packed = fn(jnp.asarray(host), q, jnp.asarray(valid))
            entry = [b["row_offset"] + lo, packed, k_scan, None]
            out.append(entry)
            window.append(entry)
            if len(window) >= self.SPILL_INFLIGHT:
                oldest = window.pop(0)
                oldest[1] = np.asarray(oldest[1])   # fetch → frees HBM
        return out

    def search_batch_async(self, query_vecs: np.ndarray, k: int,
                           live: Optional[int] = None,
                           exact: bool = False):
        """Dispatch a batched scan WITHOUT waiting for the device: every
        bucket's executable is enqueued (PJRT dispatch is async) and an
        opaque pending handle is returned. ``search_batch_finish``
        fetches + merges. The split lets a serving dispatcher overlap the
        next batch's dispatch with this batch's device time + tunnel
        round-trip (QueryBatcher's pipeline).

        ``live`` marks how many leading rows are REAL queries: a serving
        batch is zero-padded to its compiled shape, and without the mark
        the host merge (and the int8 full-precision rescore — up to
        rescore_k preads per row) would process up to max_batch-1
        phantom all-zero queries per underfilled batch. The device scan
        itself always runs the padded shape (one executable).

        ``exact=True`` is the per-query recall-contract routing (docs/
        API.md): IVF pruning is skipped for THIS dispatch — device IVF
        buckets take the exact scan of the (permuted) bucket and spilled
        IVF buckets stream whole — so recall@k is 1.0 by construction at
        the exact scan's cost. No rebuild, no store-level mode flip."""
        live = len(query_vecs) if live is None else live
        exact = exact or self._ivf_route_exact
        buckets = self.device_buckets()
        quantized = self.store_dtype == "int8"
        if not buckets:  # empty store: nothing to scan
            return (live, k, quantized, [])
        q = jnp.asarray(query_vecs, dtype=jnp.float32)

        # round the scanned k up to the class ladder (16, 64, 128, 1024) so
        # callers with different k share one compiled executable (compiles
        # are expensive; extra candidates are a few KB). 64 covers the
        # TUI's limit-50, 128 covers the default rescore_k=100 and is the
        # Pallas kernel's K_PAD ceiling; >128 falls to the XLA path.
        k_want = max(k, self.rescore_k) if quantized else k
        k_class = next((c for c in (16, 64, 128, 1024) if c >= k_want),
                       k_want)

        pending = []
        spill_window = []   # staged-slice bound shared across buckets
        q_live_host = None  # lazy one-time fetch for IVF probes
        # HBM-spill: IVF-clustered spilled buckets probe as ONE logical
        # index (union centroid selection, one staged upload + kernel —
        # see _ivf_spill_dispatch for why per-bucket probes collapse on
        # multi-bucket spills); buckets the union can't serve retry
        # individually, then stream whole. All spill paths block for the
        # staged portion (bounded staging HBM beats async purity for an
        # over-capacity store).
        spill_served: set = set()
        spill_ivf = [] if exact else [
            b for b in buckets
            if b.get("host_resident") and b.get("ivf_spill") is not None]
        if spill_ivf:
            q_live_host = np.asarray(query_vecs[:live], np.float32)
            # legacy mixed dirs: an int8 store can carry an unquantized
            # (pre-v2) blob next to quantized ones — the staging buffer
            # is one dtype, so dispatch one union per blob kind
            by_kind: Dict[bool, list] = {}
            for b in spill_ivf:
                kind = b["ivf_spill"].get("scales") is not None
                by_kind.setdefault(kind, []).append(b)
            for group in by_kind.values():
                entries = self._ivf_spill_dispatch(
                    group, q, q_live_host, k_class, spill_window)
                if entries is None and len(group) > 1:
                    # union probe over budget (huge query batch):
                    # per-bucket probes may still fit their own budgets
                    for b in group:
                        e = self._ivf_spill_dispatch(
                            [b], q, q_live_host, k_class, spill_window)
                        if e is not None:
                            pending.extend(e)
                            spill_served.add(id(b))
                elif entries is not None:
                    pending.extend(entries)
                    spill_served.update(id(b) for b in group)
        for b in buckets:
            if b.get("host_resident"):
                if id(b) in spill_served:
                    continue
                pending.extend(self._scan_host_bucket(b, q, k_class,
                                                      spill_window))
                continue
            k_scan = min(k_class, b["n_pad"])
            if b.get("ivf") is not None and not exact:
                if q_live_host is None:
                    q_live_host = np.asarray(query_vecs[:live],
                                             np.float32)
                entry = self._ivf_dispatch(b, q, q_live_host, k_scan)
                if entry is not None:
                    pending.append(entry)
                    continue
                # over-budget probe or ineligible backend: exact scan of
                # the (permuted) bucket — ids still map through perm
            fn = self._scan_fn(b["n_pad"], k_scan,
                               all_valid=b.get("all_valid", False))
            perm = (b["ivf"]["perm"] if b.get("ivf") is not None
                    else None)
            pending.append((b["row_offset"],
                            fn(b["store"], q, b["valid"]), k_scan, perm))
        return (live, k, quantized, pending)

    def search_batch_finish(self, handle, query_vecs: np.ndarray
                            ) -> Tuple[np.ndarray, np.ndarray]:
        """Fetch + merge a pending batched scan (see search_batch_async).

        Each bucket's result is ONE packed (Q, 2k) array — a single
        device→host fetch (scores + bitcast ids, unpacked here); the
        per-bucket candidate sets merge on host. A device-side merge was
        tried and measured SLOWER on remote/tunneled devices: it adds one
        dispatch round-trip (~27 ms tunneled) and a fresh XLA compile per
        bucket-count while the host merge costs one ~1 ms fetch per
        bucket plus a sub-ms argsort. int8 mode scans for ``rescore_k``
        candidates and re-ranks them at full precision from the host
        originals (BASELINE config 4)."""
        live, k, quantized, pending = handle
        if not pending:
            return (np.full((live, k), -np.inf, dtype=np.float32),
                    np.zeros((live, k), dtype=np.int32))
        all_scores = []
        all_idx = []
        for row_off, packed, k_scan, perm in pending:  # dispatched; sync
            # (Q, 2k) i32 — see _scan_fn; spilled slices arrive already
            # fetched as numpy (np.asarray is then a no-op)
            buf = np.asarray(packed)
            # phantom padded rows (>= live) are dropped before the merge
            # and, in int8 mode, before the per-row rescore preads
            all_scores.append(buf[:live, :k_scan].view(np.float32))
            idx = buf[:live, k_scan:]
            if perm is not None:
                # IVF bucket: kernel positions are cluster-major — map
                # back to segment row order before the global offset
                idx = perm[idx]
            all_idx.append(idx + row_off)
        scores = np.concatenate(all_scores, axis=1)
        idx = np.concatenate(all_idx, axis=1)
        return self._merge_candidates(scores, idx, query_vecs[:live], k,
                                      quantized, n_parts=len(pending))

    def search_batch(self, query_vecs: np.ndarray, k: int,
                     exact: bool = False
                     ) -> Tuple[np.ndarray, np.ndarray]:
        """Batched scan: (Q, dim) queries → (scores (Q,k'), ids (Q,k'))."""
        return self.search_batch_finish(
            self.search_batch_async(query_vecs, k, exact=exact),
            query_vecs)

    def _merge_candidates(self, scores, idx, query_vecs, k: int,
                          quantized: bool, n_parts: int):
        k_keep = min(max(k, self.rescore_k) if quantized else k,
                     scores.shape[1])
        if n_parts > 1 or scores.shape[1] > k_keep:
            order = np.argsort(-scores, axis=1, kind="stable")
            order = order[:, :k_keep]
            scores = np.take_along_axis(scores, order, axis=1)
            idx = np.take_along_axis(idx, order, axis=1)

        if quantized:
            from sema_tpu.ops.quant import rescore_exact
            out_s = np.full((len(query_vecs), k), -np.inf, dtype=np.float32)
            out_i = np.zeros((len(query_vecs), k), dtype=np.int32)
            for qi in range(len(query_vecs)):
                keep = np.isfinite(scores[qi])
                ids = idx[qi][keep]
                if len(ids) == 0:
                    continue
                full = self.rows_at(ids)
                s, ii = rescore_exact(full, np.asarray(query_vecs[qi]),
                                      ids, k)
                out_s[qi, :len(s)] = s
                out_i[qi, :len(s)] = ii
            return out_s, out_i
        return scores, idx

    def substring_scan(self, query: str, limit: int
                       ) -> List[Tuple[Chunk, float]]:
        """Degraded-mode fallback: host substring scan over chunk content
        (≙ the reference's ``LIKE '%q%'`` fallback when query embedding
        fails, lance_indexer.rs:143-148). Case-sensitive like SQL LIKE with
        binary collation; scores are the constant 1.0 the reference returns
        for semantic hits (storage/mod.rs:123)."""
        out: List[Tuple[Chunk, float]] = []
        with self._lock:
            segs = list(self.segments)
        for seg in segs:
            for i, row in seg.iter_meta():
                if i in seg.deleted:
                    continue
                if query in row["content"]:
                    out.append((Chunk(
                        id=row["id"], file_path=Path(row["file_path"]),
                        start_line=row["start_line"],
                        end_line=row["end_line"],
                        content=row["content"]), 1.0))
                    if len(out) >= limit:
                        return out
        return out

    def search(self, query_vec: np.ndarray, k: int,
               exact: bool = False) -> List[Tuple[Chunk, float]]:
        """Top-k scan (single query). Scores are true cosine
        similarities — the reference discards them (storage/mod.rs:123
        returns constant 1.0); keeping them is a strict improvement that
        makes result ordering meaningful.

        ``exact=True``: recall-contract routing — bypass IVF pruning for
        this query (recall@k 1.0 by construction). A no-op on non-IVF
        stores, where every scan is already exact."""
        if self.live_rows == 0:
            return []
        k_eff = min(k, self.live_rows)
        # jnp.asarray keeps an already-device-resident query (the serve
        # path's encode_query_device output) on device — no host hop
        scores, idx = self.search_batch(
            jnp.asarray(query_vec, dtype=jnp.float32)[None, :], k_eff,
            exact=exact)
        out: List[Tuple[Chunk, float]] = []
        for s, i in zip(scores[0], idx[0]):
            if not np.isfinite(s):
                continue  # masked/padded rows ranked past the live ones
            out.append((self.chunk_at(int(i)), float(s)))
            if len(out) >= k:
                break
        return out

    def close(self) -> None:
        self.save_file_hashes()
        self._save_manifest()
        self._pending_dev.clear()
        if self._spill_ex is not None:
            # wait=True: an in-flight prefetch still reads the segment
            # memmaps being closed below
            self._spill_ex.shutdown(wait=True)
            self._spill_ex = None
        for seg in self.segments:
            seg.close()
        if self._lock_fd is not None:   # releases the flock
            os.close(self._lock_fd)
            self._lock_fd = None
            self._owner = False

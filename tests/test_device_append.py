"""Device-resident append fast path (serve-time re-index).

``VectorStore.add_chunks`` accepts a device-resident ``jax.Array``: the
disk segment writes from an async host copy, and the device rows are kept
(``_pending_dev``) so the next arena-tail extension consumes them directly
instead of re-uploading from the fresh memmap — removing the
fetch→re-upload double crossing from the streaming re-index path
(round-3 NOTES item; the build-side half is ``Encoder.encode_texts
(return_device=True)``).
"""

from pathlib import Path

import numpy as np
import pytest

import jax.numpy as jnp

from sema_tpu.index.manager import IndexManager
from sema_tpu.index.vector_store import VectorStore
from sema_tpu.models import Encoder, get_spec
from sema_tpu.models.loader import random_params
from sema_tpu.tokenizer import HashTokenizer
from sema_tpu.types import Chunk


def chunks_and_vecs(n, d=32, path="f.txt", seed=0, start=0):
    rng = np.random.default_rng(seed)
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    cs = [Chunk(id=f"{path}:{start + i}", file_path=Path(path),
                start_line=i + 1, end_line=i + 2,
                content=f"content {start + i}")
          for i in range(n)]
    return cs, vecs


def make_store(tmp_path, d=32, **kw):
    return VectorStore(tmp_path, dim=d, model="test-tiny", **kw)


def test_device_append_served_store(tmp_path):
    """Append a jax.Array while the device copy is live; rows are found,
    pendings are consumed, and the disk copy round-trips."""
    store = make_store(tmp_path / "a")
    cs1, v1 = chunks_and_vecs(60, path="a.txt", seed=1)
    store.add_chunks(cs1, v1)
    store.search(v1[0], k=1)                    # device copy goes live
    assert store.device_copy_live()

    cs2, v2 = chunks_and_vecs(40, path="b.txt", seed=2)
    store.add_chunks(cs2, jnp.asarray(v2))
    assert len(store._pending_dev) == 1         # stashed until next build
    res = store.search(v2[10], k=1)
    assert res[0][0].id == "b.txt:10"
    assert res[0][1] == pytest.approx(1.0, abs=1e-2)
    assert not store._pending_dev               # consumed by the build

    # the disk segment persisted the same rows (bf16-rounded)
    store.close()
    store2 = make_store(tmp_path / "a")
    got = np.asarray(store2.segments[-1].vectors, dtype=np.float32)
    np.testing.assert_allclose(
        got, v2.astype(store2.np_dtype).astype(np.float32))


def test_device_rows_used_without_touching_disk(tmp_path):
    """Proof the arena extension consumes the DEVICE rows: unlink the
    appended segment's .vec file before the first search — a host-path
    rebuild would need the memmap and fail, the device path never opens
    it."""
    store = make_store(tmp_path / "a")
    cs1, v1 = chunks_and_vecs(60, path="a.txt", seed=1)
    store.add_chunks(cs1, v1)
    store.search(v1[0], k=1)

    cs2, v2 = chunks_and_vecs(40, path="b.txt", seed=2)
    store.add_chunks(cs2, jnp.asarray(v2))
    store.segments[-1].vec_path.unlink()
    res = store.search(v2[7], k=1)
    assert res[0][0].id == "b.txt:7"


def test_device_and_host_append_identical_results(tmp_path):
    dev_store = make_store(tmp_path / "dev")
    host_store = make_store(tmp_path / "host")
    cs1, v1 = chunks_and_vecs(50, path="a.txt", seed=3)
    cs2, v2 = chunks_and_vecs(30, path="b.txt", seed=4)
    for s in (dev_store, host_store):
        s.add_chunks(cs1, v1)
        s.search(v1[0], k=1)
    dev_store.add_chunks(cs2, jnp.asarray(v2))
    host_store.add_chunks(cs2, v2)
    qs, _ = chunks_and_vecs(8, seed=5)
    for q in _[:8]:
        a = dev_store.search(q, k=5)
        b = host_store.search(q, k=5)
        assert [(c.id, pytest.approx(s, abs=1e-6)) for c, s in a] \
            == [(c.id, s) for c, s in b]


def test_tombstone_lands_between_append_and_build(tmp_path):
    """The validity mask is host-built even on the device path: rows
    tombstoned after the append but before the bucket build must not
    surface."""
    store = make_store(tmp_path / "a")
    cs1, v1 = chunks_and_vecs(60, path="a.txt", seed=1)
    store.add_chunks(cs1, v1)
    store.search(v1[0], k=1)
    cs2, v2 = chunks_and_vecs(20, path="b.txt", seed=2)
    store.add_chunks(cs2, jnp.asarray(v2))
    removed = store.remove_file_chunks(Path("b.txt"))
    assert removed == 20
    res = store.search(v2[3], k=3)
    assert all(c.file_path != Path("b.txt") for c, _ in res)


def test_int8_store_device_append(tmp_path):
    dev_store = make_store(tmp_path / "dev", store_dtype="int8")
    host_store = make_store(tmp_path / "host", store_dtype="int8")
    cs1, v1 = chunks_and_vecs(64, path="a.txt", seed=6)
    cs2, v2 = chunks_and_vecs(32, path="b.txt", seed=7)
    for s in (dev_store, host_store):
        s.add_chunks(cs1, v1)
        s.search(v1[0], k=1)
    dev_store.add_chunks(cs2, jnp.asarray(v2))
    host_store.add_chunks(cs2, v2)
    for q in v2[:4]:
        a = dev_store.search(np.array(q), k=5)
        b = host_store.search(np.array(q), k=5)
        assert [c.id for c, _ in a] == [c.id for c, _ in b]
        np.testing.assert_allclose([s for _, s in a], [s for _, s in b],
                                   atol=1e-6)


def test_no_stash_without_live_device_copy(tmp_path):
    """Pure builds (no search yet) must not pin device rows in HBM —
    the lazy memmap upload at first search already covers them."""
    store = make_store(tmp_path / "a")
    cs, vecs = chunks_and_vecs(40)
    store.add_chunks(cs, jnp.asarray(vecs))
    assert not store._pending_dev
    res = store.search(vecs[11], k=1)
    assert res[0][0].id == "f.txt:11"


@pytest.fixture(scope="module")
def encoder():
    spec = get_spec("test-tiny")
    return Encoder(spec, random_params(spec), HashTokenizer(spec.vocab_size),
                   batch_size=8)


def _texts(n):
    return [("word " * (1 + (i * 7) % 30)).strip() + f" {i}"
            for i in range(n)]


def test_encode_texts_return_device_matches_host(encoder):
    texts = _texts(37)
    host = encoder.encode_texts(texts)
    pair = encoder.encode_texts(texts, return_device=True)
    np.testing.assert_allclose(pair.host, host, atol=1e-6, rtol=1e-6)
    # both placements carry the SAME rows in the same order
    np.testing.assert_array_equal(np.asarray(pair.device), pair.host)


def test_encode_texts_return_device_out_dtype(encoder):
    import ml_dtypes
    texts = _texts(12)
    pair = encoder.encode_texts(texts, return_device=True,
                                out_dtype=ml_dtypes.bfloat16)
    assert pair.device.dtype == jnp.bfloat16
    assert pair.host.dtype == ml_dtypes.bfloat16
    np.testing.assert_array_equal(np.asarray(pair.device), pair.host)
    host = encoder.encode_texts(texts)
    np.testing.assert_allclose(
        pair.host.astype(np.float32), host, atol=1e-2)


def test_encode_texts_return_device_across_drains(encoder, monkeypatch):
    # a hold budget below one batch forces a drain per batch; the device
    # assembly must still cover every row in order
    monkeypatch.setenv("SEMA_TPU_EMBED_HOLD_MB", "0.000001")
    texts = _texts(57)
    pair = encoder.encode_texts(texts, return_device=True)
    monkeypatch.setenv("SEMA_TPU_EMBED_HOLD_MB", "4096")
    ref = encoder.encode_texts(texts)
    np.testing.assert_allclose(pair.host, ref, atol=1e-6, rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(pair.device), pair.host)


def test_add_chunks_encoded_pair(tmp_path, encoder):
    """add_chunks consumes the (host, device) pair: disk from host,
    arena from device."""
    store = make_store(tmp_path / "a", d=encoder.spec.dim)
    cs1, _ = chunks_and_vecs(20, d=encoder.spec.dim, path="a.txt")
    v1 = encoder.encode_texts(_texts(20))
    store.add_chunks(cs1, v1)
    store.search(v1[0], k=1)
    pair = encoder.encode_texts(
        ["second wave " + t for t in _texts(20)], return_device=True)
    cs2, _ = chunks_and_vecs(20, d=encoder.spec.dim, path="b.txt")
    store.add_chunks(cs2, pair)
    assert len(store._pending_dev) == 1
    res = store.search(pair.host[5], k=1)
    assert res[0][0].id == "b.txt:5"
    assert not store._pending_dev


def test_manager_serve_time_reindex_uses_device_path(tmp_path, encoder):
    """End-to-end: after a first search the manager passes device-resident
    embeddings to add_chunks (observed via the encode_texts kwargs)."""
    calls = []
    orig = encoder.encode_texts

    class Spy:
        # the manager probes the signature: expose the real parameters
        spec = encoder.spec

        def encode_texts(self, texts, progress=None,
                         out_dtype=np.float32, return_device=False):
            calls.append({"out_dtype": out_dtype,
                          **({"return_device": True} if return_device
                             else {})})
            return orig(texts, progress=progress, out_dtype=out_dtype,
                        return_device=return_device)

        def encode_query(self, text):
            return encoder.encode_query(text)

    src = tmp_path / "src"
    src.mkdir()
    f = src / "doc.txt"
    f.write_text("alpha beta gamma\n" * 5)
    mgr = IndexManager(tmp_path / "data", Spy())
    mgr.process_and_index_files([f])
    assert calls and "return_device" not in calls[-1]   # cold build: host

    hits = mgr.search("alpha beta", limit=5)            # device copy live
    assert hits

    f.write_text("delta epsilon zeta\n" * 5)
    mgr.process_and_index_files([f])
    assert calls[-1].get("return_device") is True       # serve-time path
    hits = mgr.search("delta epsilon", limit=5)
    assert hits and hits[0][0].content.startswith("delta")
    mgr.close()

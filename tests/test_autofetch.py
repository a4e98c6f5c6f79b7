"""First-run weight auto-fetch (≙ reference embeddings.rs:93-103: the
hub download happens automatically and is cached). Offline-first: every
failure degrades to the random-init fallback, never an error."""

import numpy as np
import pytest

from sema_tpu.models.loader import (_EMB_LEAVES, _LAYER_LEAVES,
                                    load_params, random_params)
from sema_tpu.models.registry import get_spec


def _hf_tensors_from_params(params, spec):
    """Inverse of from_hf_tensors for building a fake hub snapshot.
    (safetensors serializes raw buffers — transposed VIEWS must be
    materialized or they round-trip untransposed.)"""
    t = {}
    for ours, hf in _EMB_LEAVES:
        t[hf] = np.asarray(params["embeddings"][ours])
    for i in range(spec.num_layers):
        for ours, suffix, transpose in _LAYER_LEAVES:
            w = np.asarray(params["layers"][ours][i])
            t[f"encoder.layer.{i}.{suffix}"] = w.T if transpose else w
        qkv_w = np.asarray(params["layers"]["qkv_w"][i])
        qkv_b = np.asarray(params["layers"]["qkv_b"][i])
        h = qkv_w.shape[0]
        for j, p in enumerate(("query", "key", "value")):
            t[f"encoder.layer.{i}.attention.self.{p}.weight"] = \
                qkv_w[:, j * h:(j + 1) * h].T
            t[f"encoder.layer.{i}.attention.self.{p}.bias"] = \
                qkv_b[j * h:(j + 1) * h]
    return {k: np.ascontiguousarray(v) for k, v in t.items()}


@pytest.fixture()
def tiny_spec():
    spec = get_spec("test-tiny")
    if not spec.hf_repo:
        spec = spec.__class__(**{**spec.__dict__,
                                 "hf_repo": "fake/test-tiny"})
    return spec


def test_autofetch_downloads_then_loads(tmp_path, monkeypatch, tiny_spec):
    """Empty cache + working 'hub' → weights download and load with
    source='hf-download', no manual step (first-run parity)."""
    from safetensors.numpy import save_file
    import huggingface_hub

    monkeypatch.setenv("HF_HOME", str(tmp_path / "hf"))
    monkeypatch.delenv("SEMA_TPU_NO_AUTOFETCH", raising=False)
    truth = random_params(tiny_spec, seed=7)
    calls = {}

    def fake_snapshot_download(repo_id, allow_patterns=None, **kw):
        calls["repo"] = repo_id
        snap = tmp_path / "snap"
        snap.mkdir(exist_ok=True)
        save_file(_hf_tensors_from_params(truth, tiny_spec),
                  str(snap / "model.safetensors"))
        return str(snap)

    monkeypatch.setattr(huggingface_hub, "snapshot_download",
                        fake_snapshot_download)
    params, source = load_params(tiny_spec)
    assert source == "hf-download"
    assert calls["repo"] == tiny_spec.hf_repo
    got = np.asarray(params["layers"]["qkv_w"])
    want = np.asarray(truth["layers"]["qkv_w"])
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_autofetch_failure_degrades_to_random(tmp_path, monkeypatch,
                                              tiny_spec, capsys):
    import huggingface_hub

    monkeypatch.setenv("HF_HOME", str(tmp_path / "hf"))
    monkeypatch.delenv("SEMA_TPU_NO_AUTOFETCH", raising=False)

    def boom(*a, **kw):
        raise OSError("no network")

    monkeypatch.setattr(huggingface_hub, "snapshot_download", boom)
    params, source = load_params(tiny_spec)
    assert source == "random"
    assert "auto-fetch" in capsys.readouterr().err


def test_autofetch_respects_offline_env(tmp_path, monkeypatch, tiny_spec):
    import huggingface_hub

    monkeypatch.setenv("HF_HOME", str(tmp_path / "hf"))
    for var in ("SEMA_TPU_NO_AUTOFETCH", "HF_HUB_OFFLINE"):
        monkeypatch.setenv(var, "1")

        def never(*a, **kw):  # pragma: no cover - must not run
            raise AssertionError("snapshot_download called while offline")

        monkeypatch.setattr(huggingface_hub, "snapshot_download", never)
        params, source = load_params(tiny_spec)
        assert source == "random"
        monkeypatch.delenv(var)


def test_cache_hit_skips_autofetch(tmp_path, monkeypatch, tiny_spec):
    """A populated cache never touches the network (offline-first)."""
    from safetensors.numpy import save_file
    import huggingface_hub

    monkeypatch.setenv("HF_HOME", str(tmp_path / "hf"))
    repo_dir = (tmp_path / "hf" / "hub"
                / ("models--" + tiny_spec.hf_repo.replace("/", "--"))
                / "snapshots" / "abc123")
    repo_dir.mkdir(parents=True)
    truth = random_params(tiny_spec, seed=9)
    save_file(_hf_tensors_from_params(truth, tiny_spec),
              str(repo_dir / "model.safetensors"))

    def never(*a, **kw):  # pragma: no cover
        raise AssertionError("network touched despite cache hit")

    monkeypatch.setattr(huggingface_hub, "snapshot_download", never)
    params, source = load_params(tiny_spec)
    assert source == "hf-cache"

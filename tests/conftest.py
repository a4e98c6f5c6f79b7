"""Test harness setup.

Device tests run on the CPU platform with 8 virtual devices so the
multi-chip sharding paths (mesh layouts, shard_map top-k merge) are
exercised without TPU hardware — the TPU answer to "test multi-node
without a cluster" (SURVEY.md §4).

Must run before the first ``import jax`` anywhere in the test session.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import pytest  # noqa: E402


@pytest.fixture()
def tmp_home(tmp_path, monkeypatch):
    """Isolate config/data dirs from the real user environment."""
    monkeypatch.setenv("SEMA_TPU_HOME", str(tmp_path / "home"))
    monkeypatch.setenv("SEMA_TPU_DATA", str(tmp_path / "data"))
    return tmp_path

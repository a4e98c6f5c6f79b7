"""Test harness setup.

Device tests run on the CPU platform with 8 virtual devices so the
multi-chip sharding paths (mesh layouts, shard_map top-k merge) are
exercised without TPU hardware — the TPU answer to "test multi-node
without a cluster" (SURVEY.md §4).

Must run before the first ``import jax`` anywhere in the test session.
"""

import os

# Force CPU even when the host environment pins JAX_PLATFORMS to a real
# accelerator — unit tests need 8 virtual devices and bit-stable f32.
# The env var alone is not enough on hosts whose TPU plugin overrides it,
# so also pin the config flag before any backend initializes.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture()
def tmp_home(tmp_path, monkeypatch):
    """Isolate config/data dirs from the real user environment."""
    monkeypatch.setenv("SEMA_TPU_HOME", str(tmp_path / "home"))
    monkeypatch.setenv("SEMA_TPU_DATA", str(tmp_path / "data"))
    return tmp_path

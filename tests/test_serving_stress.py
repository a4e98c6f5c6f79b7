"""Concurrent serving under streaming re-index (BASELINE config 5,
scaled down for CI): many client threads drive QueryBatcher while a
mutator appends and tombstones segments in the same store. Asserts zero
errors, zero wrong-winner responses, and a sane latency distribution —
the full-scale run is tools/load_test.py."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))

from load_test import run  # noqa: E402


def test_concurrent_serving_with_streaming_reindex(tmp_path):
    result = run(rows=4096, dim=64, clients=32, max_batch=32,
                 duration=3.0, mutate=True, k=5,
                 data_dir=str(tmp_path), mut_batch=512)
    assert result["errors"] == 0
    assert result["mismatches"] == 0
    assert result["queries"] > 0
    assert result["mutated_batches"] >= 1
    assert result["p99_ms"] is not None


def test_concurrent_serving_static_store(tmp_path):
    result = run(rows=2048, dim=64, clients=16, max_batch=16,
                 duration=1.5, mutate=False, k=5,
                 data_dir=str(tmp_path))
    assert result["errors"] == 0
    assert result["mismatches"] == 0
    assert result["queries"] > 0

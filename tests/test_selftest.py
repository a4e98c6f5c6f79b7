"""Device numeric self-test (sema_tpu/selftest.py) — the doctor's
on-backend planted-winner and encoder-parity gates. On CPU these must
all pass (the point of the module is running the SAME probes on real
hardware, where CPU-green suites have missed fusion bugs)."""

from dataclasses import replace

from sema_tpu.config import ModelConfig
from sema_tpu.selftest import run_device_selftest


def test_selftest_all_green_on_cpu():
    cfg = ModelConfig(name="test-tiny", max_length=32, batch_size=8)
    checks = run_device_selftest(cfg, dim=64)
    assert [n for n, _, _ in checks] == [
        "scan-ids", "scan-ids-pallas", "scan-int8", "scan-mesh",
        "scan-spill", "scan-ivf", "scan-spill-ivf", "encoder-parity"]
    for name, ok, detail in checks:
        assert ok, f"{name}: {detail}"


def test_selftest_scan_only():
    checks = run_device_selftest(None, dim=32, with_encoder=False)
    assert len(checks) == 7
    assert all(ok for _, ok, _ in checks)


def test_selftest_int8_encoder_parity():
    cfg = ModelConfig(name="test-tiny", max_length=32, batch_size=8,
                      quant="int8")
    checks = run_device_selftest(cfg, dim=64)
    parity = dict((n, (ok, d)) for n, ok, d in checks)["encoder-parity"]
    assert parity[0], parity[1]

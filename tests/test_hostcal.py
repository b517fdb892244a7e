"""Host-parallelism calibration (hostcal.py) unit tests — no Spark needed."""

import os

from olr_cdc_oracle_with_dbz_spark import hostcal


def test_effective_cpus_bounds():
    n = hostcal.effective_cpus()
    adv = os.cpu_count() or 8
    if adv <= 8:
        assert n == 0  # small hosts keep the default
    else:
        assert 8 <= n <= adv


def test_apply_calibration_respects_explicit_pin(monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_CPUS", "7")
    assert hostcal.apply_calibration() == 0
    assert os.environ["SPARK_GRAFT_CPUS"] == "7"


def test_apply_calibration_sets_env(monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_CPUS", raising=False)
    monkeypatch.setattr(hostcal, "effective_cpus", lambda: 12)
    assert hostcal.apply_calibration() == 12
    assert os.environ["SPARK_GRAFT_CPUS"] == "12"

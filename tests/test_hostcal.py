"""Host-parallelism calibration (hostcal.py) unit tests — no Spark needed.

The real 6M-iteration spin probe is stubbed to a tiny loop so the unit
suite doesn't burn several seconds of multi-core CPU per run; the genuine
probe executes in bench.py where the measurement actually matters.
"""

import os

from olr_cdc_oracle_with_dbz_spark import hostcal


def test_effective_cpus_bounds(monkeypatch):
    monkeypatch.setattr(hostcal, "_spin", lambda _: sum(range(1000)))
    n = hostcal.effective_cpus()
    adv = os.cpu_count() or 8
    if adv <= 8:
        assert n == 0  # small hosts keep the default
        assert hostcal.LAST.get("skipped") == "small_host"
    else:
        # 0 is the documented "calibration skipped" result (e.g. a
        # transient Pool failure) — legal on any host
        assert n == 0 or 8 <= n <= adv
        if n:
            assert hostcal.LAST["local_n"] == n
            assert hostcal.LAST["advertised"] == adv


def test_apply_calibration_respects_explicit_pin(monkeypatch):
    """The pin always governs local[N]; the probe still runs so the
    committed bench record carries delivered_equiv next to the pin
    (VERDICT r16 #7 — the headline line must explain its own weather)."""
    monkeypatch.setenv("SPARK_GRAFT_CPUS", "7")

    def fake_measure():
        hostcal.LAST = {"advertised": 32, "delivered_equiv": 18.8, "local_n": 24}
        return 24

    monkeypatch.setattr(hostcal, "effective_cpus", fake_measure)
    assert hostcal.apply_calibration() == 0
    assert os.environ["SPARK_GRAFT_CPUS"] == "7"  # pin untouched
    assert hostcal.LAST == {
        "advertised": 32,
        "delivered_equiv": 18.8,
        "local_n": 24,
        "pinned": 7,
    }


def test_apply_calibration_sets_env(monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_CPUS", raising=False)
    monkeypatch.setattr(hostcal, "effective_cpus", lambda: 12)
    assert hostcal.apply_calibration() == 12
    assert os.environ["SPARK_GRAFT_CPUS"] == "12"

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    from olr_cdc_oracle_with_dbz_spark.session import get_spark

    s = get_spark("olr-cdc-spark-tests")
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(autouse=True)
def _zero_vacuum_grace(monkeypatch):
    """Tests commit in sub-second bursts, so the production vacuum grace
    (a record younger than ``vacuum_grace_sec`` is never vacated — the
    fence against a vacuum racing a fresh writer's create→post-check
    window) would make every retention assertion vacuous: nothing in a
    test's lifetime is ever old enough to vacuum. Zero the DEFAULT here;
    the grace behavior itself is covered by dedicated tests that pass an
    explicit ``vacuum_grace_sec``. Single-threaded tests cannot hit the
    race the grace exists to close."""
    from olr_cdc_oracle_with_dbz_spark.streaming.materialize import (
        ParquetUpsertTable,
    )

    monkeypatch.setattr(ParquetUpsertTable, "DEFAULT_VACUUM_GRACE_SEC", 0.0)
    yield


@pytest.fixture(autouse=True)
def _sink_fs_override(request):
    """OLR_TEST_FS=hadoop reroutes every seam client constructed with the
    DEFAULT fs through HadoopFS — so the literal, unmodified sink suite
    (crash-replay, spool property test, pipelines) runs through the cluster
    filesystem seam. Patches BOTH the materialize module's import-time
    binding and the fs module's own name (SchemaRegistry and
    JdbcIncrementalSource resolve ``fs.LocalFS`` lazily at construct time —
    ADVICE r12). Default (unset): LocalFS, byte-identical to before."""
    if os.environ.get("OLR_TEST_FS") != "hadoop":
        yield
        return
    from olr_cdc_oracle_with_dbz_spark import fs as fs_mod
    from olr_cdc_oracle_with_dbz_spark.streaming import materialize as mat

    spark = request.getfixturevalue("spark")
    orig = fs_mod.LocalFS
    shim = lambda: fs_mod.HadoopFS(spark)  # noqa: E731
    fs_mod.LocalFS = shim
    mat.LocalFS = shim
    try:
        yield
    finally:
        fs_mod.LocalFS = orig
        mat.LocalFS = orig


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_ORACLE


@pytest.fixture(scope="session")
def duck(sf_dir):
    from olr_cdc_oracle_with_dbz_spark.plans.parity import duckdb_connect

    con = duckdb_connect(sf_dir)
    yield con
    con.close()

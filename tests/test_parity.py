"""Differential correctness: every registered query vs the DuckDB oracle.

Mirrors the driver's t2 gate (row count + column names + values) at sf0.01.
Parametrized over the registry so a newly registered query is automatically
under test.
"""

from __future__ import annotations

import pytest

from olr_cdc_oracle_with_dbz_spark.plans.parity import check_query
from olr_cdc_oracle_with_dbz_spark.registry import load_all


def _names():
    return sorted(load_all().keys())


@pytest.mark.parametrize("name", _names())
def test_query_matches_oracle(spark, sf_dir, duck, name):
    ok, msg = check_query(spark, name, sf_dir, con=duck)
    assert ok, f"{name}: {msg}"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert set(e.oracle_sql()) <= set(e.queries())

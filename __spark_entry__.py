"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All queries live in the package registry
(olr_cdc_oracle_with_dbz_spark/registry.py) — this module is a thin view, so
``queries()`` and ``oracle_sql()`` can never drift apart.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def _registry():
    from olr_cdc_oracle_with_dbz_spark.registry import load_all

    return load_all()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    _pin_confs(spark)
    spec = _registry()["q22_hash_agg_tpch_q1"]
    return spec.spark_fn(spark, "/root/testdata/sf0.001")


def _pin_confs(spark: SparkSession) -> None:
    """Correctness-critical runtime confs (the driver owns the session)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Only oracle-backed specs are exposed to the driver: every APPROX
    operator has a paired bounded-quality query (recall/ε gates — the
    raw approx outputs stay registered for bench + pytest), so an
    oracle-less entry here would only produce an uncheckable err row.
    """

    def bind(spec):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _pin_confs(spark)
            return spec.spark_fn(spark, sf_dir)

        run.__doc__ = spec.doc
        return run

    return {
        name: bind(spec)
        for name, spec in _registry().items()
        if spec.oracle is not None
    }


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every hash-checked query."""
    return {
        name: spec.oracle
        for name, spec in _registry().items()
        if spec.oracle is not None
    }

"""Scan / source / sink operators (SURVEY §2B Q1–Q4).

The reference's scan layer is its source-side table filter + projection
control (/root/reference/scripts/OpenLogReplicator.json:14-39): read only the
tables you asked for, emit only the fields you asked for. In Spark that is
the parquet datasource with column pruning and predicate pushdown — these
queries exist to pin that behavior (Q2's physical plan must show ReadSchema
with exactly two columns).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from olr_cdc_oracle_with_dbz_spark.catalog import Catalog, key_bounds
from olr_cdc_oracle_with_dbz_spark.plans.canonical import ordered, ordered_static
from olr_cdc_oracle_with_dbz_spark.registry import register

_SCRATCH = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), ".scratch")


def scratch_dir(name: str) -> str:
    d = os.path.join(_SCRATCH, name)
    os.makedirs(_SCRATCH, exist_ok=True)
    return d


@register(
    "q01_scan_full",
    oracle="SELECT * FROM region ORDER BY r_regionkey",
)
def q01_scan_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-projection parquet scan."""
    return Catalog(spark, sf_dir).region.transform(ordered, "r_regionkey")


@register(
    "q02_scan_pruned",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
    ORDER BY l_orderkey, l_linenumber
    """,
)
def q02_scan_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-pruned scan — ReadSchema must contain only these columns."""
    return (
        Catalog(spark, sf_dir)
        .lineitem.select("l_orderkey", "l_linenumber", "l_quantity")
        .transform(ordered_static, key_bounds(sf_dir, "lineitem"), "l_orderkey", "l_linenumber")
    )


@register(
    "q03_csv_roundtrip",
    oracle="SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey",
)
def q03_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV write + explicit-schema read-back (spooldir-source analogue, R13).

    The reference ships a CSV directory-watch source connector
    (/root/reference/Dockerfile:65-66); batch form here, streaming form in
    streaming/ingest.py.
    """
    cat = Catalog(spark, sf_dir)
    out = scratch_dir("q03_nation_csv")
    cat.nation.write.mode("overwrite").option("header", True).csv(out)
    schema = "n_nationkey int, n_name string, n_regionkey int"
    return (
        spark.read.schema(schema)
        .option("header", True)
        .csv(out)
        .transform(ordered, "n_nationkey")
    )


@register(
    "q03b_json_roundtrip",
    oracle="SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey",
)
def q03b_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines write + explicit-schema read-back (wire-debug format).

    Same contract as q03 over the engine's other text format; explicit
    schema always — inferSchema is banned on any repeated-read path.
    """
    cat = Catalog(spark, sf_dir)
    out = scratch_dir("q03b_nation_json")
    cat.nation.select("n_nationkey", "n_name", "n_regionkey").write.mode(
        "overwrite"
    ).json(out)
    schema = "n_nationkey int, n_name string, n_regionkey int"
    return spark.read.schema(schema).json(out).transform(ordered, "n_nationkey")


@register(
    "q04_parquet_roundtrip",
    oracle="SELECT s_suppkey, s_name, s_nationkey, s_acctbal FROM supplier ORDER BY s_suppkey",
)
def q04_parquet_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet write + read-back (the engine's at-rest format)."""
    cat = Catalog(spark, sf_dir)
    out = scratch_dir("q04_supplier_parquet")
    cat.supplier.write.mode("overwrite").parquet(out)
    return spark.read.parquet(out).transform(ordered, "s_suppkey")

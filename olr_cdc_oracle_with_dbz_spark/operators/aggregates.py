"""Aggregation operators (SURVEY §2B Q22–Q30).

All aggregation is declarative ``groupBy().agg()`` — Catalyst plans
partial (map-side) + final aggregation automatically, which is the scalable
shape: at 100 TB the partial agg collapses each scan partition to one row per
group before the shuffle, so shuffle volume is O(groups), not O(rows).

Float determinism: every checked sum/avg runs through exact decimal
accumulation (plans/canonical.py) so results are order-independent and
bit-identical to the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from olr_cdc_oracle_with_dbz_spark.catalog import Catalog
from olr_cdc_oracle_with_dbz_spark.plans.canonical import (
    DEC,
    avg6,
    dsum,
    sql_avg6,
    sql_sum6,
    sum6,
)
from olr_cdc_oracle_with_dbz_spark.registry import register


@register(
    "q22_hash_agg_tpch_q1",
    oracle=f"""
    SELECT
      l_returnflag,
      l_linestatus,
      {sql_sum6('l_quantity')} AS sum_qty,
      {sql_sum6('l_extendedprice')} AS sum_base_price,
      {sql_sum6('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
      {sql_sum6('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
      {sql_avg6('l_quantity')} AS avg_qty,
      {sql_avg6('l_extendedprice')} AS avg_price,
      {sql_avg6('l_discount')} AS avg_disc,
      COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q22_hash_agg_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: TPC-H-Q1-style pricing summary (hash aggregate).

    This is the relational surface the reference delegates to its Postgres
    sink (/root/reference/README.md:829-850) — the whole point of the CDC
    pipeline is making the table queryable like this downstream.
    """
    li = Catalog(spark, sf_dir).lineitem
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            sum6("l_quantity").alias("sum_qty"),
            sum6("l_extendedprice").alias("sum_base_price"),
            sum6(disc).alias("sum_disc_price"),
            sum6(charge).alias("sum_charge"),
            avg6("l_quantity").alias("avg_qty"),
            avg6("l_extendedprice").alias("avg_price"),
            avg6("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )

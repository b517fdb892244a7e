"""Salting utilities must be result-identical to their plain forms."""

from __future__ import annotations

from pyspark.sql import functions as F

from olr_cdc_oracle_with_dbz_spark.operators.skew import salted_count_sum, salted_join


def _skewed(spark):
    # 50k rows, ~90% on key 7 — the hot-key shape
    return spark.range(50_000).select(
        F.when(F.col("id") % 10 < 9, F.lit(7)).otherwise(F.col("id") % 100).alias("k"),
        F.col("id").alias("row_id"),
        (F.col("id") % 13).cast("double").alias("v"),
    )


def test_salted_aggregate_equals_plain(spark):
    df = _skewed(spark)
    plain = {
        r["k"]: (r["n"], r["total"])
        for r in df.groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("total"))
        .collect()
    }
    salted = {
        r["k"]: (r["n"], r["total"])
        for r in salted_count_sum(df, "k", "v", "row_id").collect()
    }
    assert salted == plain
    assert plain[7][0] > 40_000  # the skew is real


def test_salted_join_equals_plain(spark):
    probe = _skewed(spark)
    build = spark.range(100).select(
        F.col("id").alias("k"), F.concat(F.lit("dim"), F.col("id")).alias("name")
    )
    plain = sorted(
        (r["row_id"], r["name"])
        for r in probe.join(build, "k").select("row_id", "name").collect()
    )
    salted = sorted(
        (r["row_id"], r["name"])
        for r in salted_join(probe, build, "k", "row_id").select("row_id", "name").collect()
    )
    assert salted == plain
    assert len(plain) == 50_000  # every probe row matched exactly once


def test_salted_left_join_keeps_unmatched_probe_rows(spark):
    probe = _skewed(spark)  # keys include 7 and values up to 99
    build = spark.range(50).select(  # only keys 0-49 present
        F.col("id").alias("k"), F.concat(F.lit("dim"), F.col("id")).alias("name")
    )
    plain = sorted(
        (r["row_id"], r["name"])
        for r in probe.join(build, "k", "left").select("row_id", "name").collect()
    )
    salted = sorted(
        (r["row_id"], r["name"])
        for r in salted_join(probe, build, "k", "row_id", how="left")
        .select("row_id", "name")
        .collect()
    )
    assert salted == plain
    assert any(name is None for _, name in plain)  # unmatched rows exist

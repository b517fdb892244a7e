"""Partitioned + bucketed layout: plan-shape and result-identity tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from olr_cdc_oracle_with_dbz_spark.catalog import Catalog
from olr_cdc_oracle_with_dbz_spark.operators.storage import (
    bucketed_fact_join,
    write_bucketed,
    write_partitioned,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_partitioned_write_prunes_partitions(spark, sf_dir, tmp_path):
    ev = Catalog(spark, sf_dir).events.withColumn("day", F.to_date("ts"))
    day = str(ev.agg(F.max("day")).collect()[0][0])  # a day that exists
    out = str(tmp_path / "events_by_day")
    write_partitioned(ev, out, ["day"], sort_col="event_id")

    back = spark.read.parquet(out)
    one_day = back.filter(F.col("day") == day)
    plan = one_day._jdf.queryExecution().toString()
    assert "PartitionFilters" in plan and day in plan
    # pruning must not change results
    expect = ev.filter(F.col("day") == day).count()
    assert one_day.count() == expect > 0


def test_bucketed_join_has_no_exchange(spark, sf_dir, tmp_path):
    c = Catalog(spark, sf_dir)
    li = c.lineitem.select("l_orderkey", "l_quantity")
    o = c.orders.select("o_orderkey", "o_totalprice")
    write_bucketed(li, "t_li_bucketed", "l_orderkey", buckets=8, path=str(tmp_path / "li"))
    write_bucketed(o, "t_o_bucketed", "o_orderkey", buckets=8, path=str(tmp_path / "o"))

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = bucketed_fact_join(
            spark, "t_li_bucketed", "t_o_bucketed", "l_orderkey", "o_orderkey"
        )
        j.collect()
        plan = _plan(j)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # co-located buckets: shuffle-free
        # identical result to the plain (shuffled) join
        plain = li.join(o, li.l_orderkey == o.o_orderkey).count()
        assert j.count() == plain
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS t_li_bucketed")
        spark.sql("DROP TABLE IF EXISTS t_o_bucketed")

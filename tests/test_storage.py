"""Partitioned + bucketed layout: plan-shape and result-identity tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from olr_cdc_oracle_with_dbz_spark.catalog import Catalog
from olr_cdc_oracle_with_dbz_spark.operators.storage import (
    bucketed_fact_join,
    write_bucketed,
    write_partitioned,
)


import pytest

from olr_cdc_oracle_with_dbz_spark.registry import load_all


@pytest.fixture(scope="module")
def reg():
    return load_all()


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


def test_zorder_prunes_on_both_dimensions(spark, sf_dir, tmp_path):
    """Z-ordered layout: narrow predicates on EITHER column skip most
    row groups (vs a single-column sort, which only prunes its own key)."""
    import pyarrow.parquet as pq
    import glob

    from olr_cdc_oracle_with_dbz_spark.operators.storage import write_zordered

    li = Catalog(spark, sf_dir).lineitem.select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    out = str(tmp_path / "li_z")
    write_zordered(li, out, ["l_orderkey", "l_partkey"], files=4, bits=8)

    back = spark.read.parquet(out)
    assert back.count() == li.count()

    def groups_hit(col, lo, hi):
        hit = total = 0
        for f in glob.glob(f"{out}/part-*.parquet"):
            md = pq.ParquetFile(f).metadata
            idx = next(
                i for i in range(md.row_group(0).num_columns)
                if md.row_group(0).column(i).path_in_schema == col
            )
            for g in range(md.num_row_groups):
                st = md.row_group(g).column(idx).statistics
                total += 1
                if not (st.max < lo or st.min > hi):
                    hit += 1
        return hit, total

    ok = li.agg(F.min("l_orderkey"), F.max("l_orderkey")).collect()[0]
    pk = li.agg(F.min("l_partkey"), F.max("l_partkey")).collect()[0]
    # a 5%-wide slice on each dimension
    for col, (lo_all, hi_all) in (("l_orderkey", ok), ("l_partkey", pk)):
        width = (hi_all - lo_all) // 20
        hit, total = groups_hit(col, lo_all, lo_all + width)
        assert total >= 4
        assert hit < total, f"{col}: no pruning ({hit}/{total})"


def test_q13b_cobucketed_join_plans_exchange_free(spark, sf_dir, reg):
    """The q13 bucketed twin's sort-merge join must read co-located
    buckets with NO exchange on either join side — the only exchange in
    the plan is the presentation sort's static-bucket repartition. An
    Exchange hashpartitioning on an order key means the bucket layout
    stopped being recognized (bucket count drift or a lost sortBy)."""
    plan = _plan(reg["q13b_join_cobucketed"].spark_fn(spark, sf_dir))
    assert "SortMergeJoin" in plan
    assert plan.count("Exchange") == 1, plan.count("Exchange")
    assert "Exchange hashpartitioning(_srp" in plan
    assert "Exchange hashpartitioning(l_orderkey" not in plan
    assert "Exchange hashpartitioning(o_orderkey" not in plan


def test_q20b_cobucketed_multiway_plan(spark, sf_dir, reg):
    """q20b: the fact hop must be the exchange-free bucketed sort-merge
    join and all four dimension sides must broadcast — the 100 TB plan
    shape (facts never shuffle per-query, dims ride the fact
    partitioning)."""
    plan = _plan(reg["q20b_multiway_cobucketed"].spark_fn(spark, sf_dir))
    assert "SortMergeJoin" in plan
    assert plan.count("BroadcastHashJoin") == 4, plan.count("BroadcastHashJoin")
    assert "Exchange hashpartitioning(l_orderkey" not in plan
    assert "Exchange hashpartitioning(o_orderkey" not in plan
    # the only non-broadcast exchange is the 5-row final agg/presentation
    non_b = plan.count("Exchange hashpartitioning") + plan.count(
        "Exchange SinglePartition"
    )
    assert non_b <= 2, plan


def test_q34_bucketed_window_no_input_exchange(spark, sf_dir, reg):
    """q34 r9 form: the window reads the co-bucketed lineitem, so its
    18M-row input is NEVER exchanged (bucket files satisfy the window's
    required distribution) and WindowGroupLimit prunes each group before
    the window; the only exchange is the presentation sort over the
    pruned top-k output."""
    plan = _plan(reg["q34_topk_per_group"].spark_fn(spark, sf_dir))
    assert "WindowGroupLimit" in plan
    assert plan.count("Exchange") == 1, plan.count("Exchange")
    # the one exchange is ordered_static's slot-tag repartition, and it
    # sits ABOVE the window (output side), not below it
    assert plan.index("Exchange") < plan.index("Window ")


def test_q23_orderkey_leg_exchange_free(spark, sf_dir, reg):
    """q23 r10 two-pass split: the dominant (returnflag, orderkey) dedup
    must run over the co-bucketed lineitem with NO exchange below it —
    HashPartitioning(l_orderkey) satisfies the clustering — so the only
    hash exchanges in the plan are the tiny group-by-returnflag legs and
    the Expand distinct-pairs shuffle. An exchange on (returnflag,
    orderkey) means the bucket layout stopped being recognized."""
    import re

    plan = _plan(reg["q23_count_distinct"].spark_fn(spark, sf_dir))
    assert "Bucketed: true" in plan  # the orderkey leg reads bucket files
    assert "Expand" in plan  # the supp/part 2-distinct leg
    assert not re.search(
        r"Exchange hashpartitioning\(l_returnflag#\d+, l_orderkey", plan
    ), "orderkey dedup gained an exchange"

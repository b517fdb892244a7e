"""Batch-checkable equivalents of the streaming windows (SURVEY §2B S2–S4).

Spark's ``window``/``session_window`` functions evaluate identically in
batch and streaming (streaming adds watermark-driven state eviction, tested
in tests/test_streaming.py); hash-checking the batch form against a DuckDB
gaps-and-islands formulation pins the window semantics themselves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from olr_cdc_oracle_with_dbz_spark.catalog import Catalog, key_bounds
from olr_cdc_oracle_with_dbz_spark.plans.canonical import ordered, sql_sum6, sum6, ordered_static
from olr_cdc_oracle_with_dbz_spark.registry import register


@register(
    "s2_tumbling_window",
    oracle=f"""
    SELECT time_bucket(INTERVAL '10 minutes', CAST(ts AS TIMESTAMP)) AS win_start,
           COUNT(*) AS n_events,
           {sql_sum6('value')} AS sum_value
    FROM events GROUP BY 1 ORDER BY win_start
    """,
    tags=("streaming",),
)
def s2_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 10-minute event-time window aggregation."""
    ev = Catalog(spark, sf_dir).events
    return (
        ev.groupBy(F.window("ts", "10 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"), sum6("value").alias("sum_value"))
        .select(F.col("w.start").alias("win_start"), "n_events", "sum_value")
        .transform(ordered, "win_start")
    )


@register(
    "s3_sliding_window",
    oracle=f"""
    WITH assigned AS (
      SELECT time_bucket(INTERVAL '5 minutes', CAST(ts AS TIMESTAMP)) AS anchor,
             CAST(ts AS TIMESTAMP) AS tsx, value
      FROM events
    ), expanded AS (
      SELECT anchor AS win_start, tsx, value FROM assigned
      UNION ALL
      SELECT anchor - INTERVAL '5 minutes' AS win_start, tsx, value FROM assigned
    )
    SELECT win_start, COUNT(*) AS n_events, {sql_sum6('value')} AS sum_value
    FROM expanded
    GROUP BY win_start ORDER BY win_start
    """,
    tags=("streaming",),
)
def s3_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window (10 min size, 5 min slide): each event in 2 windows.

    Oracle expansion: an event at t belongs to window starts
    {floor5(t), floor5(t) − 5min} — exactly Spark's assignment.
    """
    ev = Catalog(spark, sf_dir).events
    return (
        ev.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"), sum6("value").alias("sum_value"))
        .select(F.col("w.start").alias("win_start"), "n_events", "sum_value")
        .transform(ordered, "win_start")
    )


@register(
    "s4_session_window",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS tsx,
             lag(CAST(ts AS TIMESTAMP)) OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id) AS prev_ts
      FROM events
    ), marked AS (
      SELECT user_id, event_id, tsx,
             CASE WHEN prev_ts IS NULL OR tsx - prev_ts > INTERVAL '30 minutes' THEN 1 ELSE 0 END AS is_new
      FROM ordered
    ), numbered AS (
      -- the running sum MUST use the same total order as the lag above:
      -- with duplicate timestamps (10 identical-ts replicas per event at
      -- the synthetic sf1) an ORDER BY tsx ROWS frame breaks ties
      -- arbitrarily, and when the is_new row lands mid-tie the earlier tie
      -- rows attach to the PREVIOUS session (11-event sessions out of a
      -- 10-row tie group, 2 fewer groups corpus-wide). Spark's
      -- session_window has no such order dependence.
      SELECT user_id, tsx,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY tsx, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
      FROM marked
    )
    SELECT user_id,
           MIN(tsx) AS session_start,
           MAX(tsx) + INTERVAL '30 minutes' AS session_end,
           COUNT(*) AS n_events
    FROM numbered
    GROUP BY user_id, sess
    ORDER BY user_id, session_start
    """,
    tags=("streaming",),
)
def s4_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session window (30-minute gap) per user.

    Spark ``session_window`` end = last event + gap; the oracle reproduces
    that with gaps-and-islands (event-to-event gap measurement).
    """
    ev = Catalog(spark, sf_dir).events
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
        .transform(ordered_static, key_bounds(sf_dir, "events", "user_id"), "user_id", "session_start")
    )

"""Join operators (SURVEY §2B Q13–Q21).

Scale design notes:

* Fact⋈fact joins (Q13, Q20) are declared with plain ``join`` so Catalyst
  picks sort-merge/shuffled-hash and AQE can split skewed partitions at
  runtime; both sides shuffle on the join key once and the key partitioning
  is reused downstream.
* Dimension joins (Q14, Q20) wrap the small side in ``F.broadcast`` — at
  100 TB nation/region/supplier stay KB–MB sized, so the fact side never
  shuffles for them.
* The range self-join (Q18) pre-partitions both sides on the equi-key
  (``user_id``) so the theta condition only evaluates within a key group —
  the plan is a shuffled equi-join with a residual range filter, never a
  cartesian product.
* As-of (Q21) avoids a join entirely: window `row_number` over the
  time-filtered side — one shuffle on the partition key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from olr_cdc_oracle_with_dbz_spark.catalog import Catalog, key_bounds
from olr_cdc_oracle_with_dbz_spark.plans.canonical import sql_sum6, sum6, ordered, ordered_static
from olr_cdc_oracle_with_dbz_spark.registry import register


@register(
    "q13_inner_join",
    oracle="""
    SELECT l.l_orderkey, l.l_linenumber, o.o_custkey, o.o_orderstatus,
           l.l_quantity
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ORDER BY l.l_orderkey, l.l_linenumber
    """,
)
def q13_inner_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi-join of the two fact tables (shuffle join, AQE-managed)."""
    cat = Catalog(spark, sf_dir)
    return (
        cat.lineitem.join(cat.orders, F.col("l_orderkey") == F.col("o_orderkey"), "inner")
        .select("l_orderkey", "l_linenumber", "o_custkey", "o_orderstatus", "l_quantity")
        .transform(ordered_static, key_bounds(sf_dir, "lineitem"), "l_orderkey", "l_linenumber")
    )


@register(
    "q13b_join_cobucketed",
    oracle="""
    SELECT l.l_orderkey, l.l_linenumber, o.o_custkey, o.o_orderstatus,
           l.l_quantity
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ORDER BY l.l_orderkey, l.l_linenumber
    """,
)
def q13b_join_cobucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q13 on the co-bucketed at-rest layout (operators/storage.py): both
    fact tables bucketed on the order key, so the join plans with NO
    exchange on either side — the bucket files ARE the co-partitioning.
    Same oracle as q13; the plan difference is pinned in
    tests/test_storage.py. The layout write is ingest-time cost paid once
    per table (SCALE.md §1); at 100 TB this is the fact-fact join shape
    that survives — the per-query double fact shuffle does not."""
    from olr_cdc_oracle_with_dbz_spark.operators.storage import (
        ensure_cobucketed_facts,
    )

    li, o = ensure_cobucketed_facts(spark, sf_dir)
    # merge hint: at bench scale the optimizer would broadcast orders and
    # hide the layout; two 100 TB fact tables can never broadcast, and the
    # point IS the exchange-free sort-merge over co-located buckets
    return (
        li.hint("merge").join(o, F.col("l_orderkey") == F.col("o_orderkey"), "inner")
        .select("l_orderkey", "l_linenumber", "o_custkey", "o_orderstatus", "l_quantity")
        .transform(ordered_static, key_bounds(sf_dir, "lineitem"), "l_orderkey", "l_linenumber")
    )


@register(
    "q14_broadcast_join",
    oracle="""
    SELECT n.n_nationkey, n.n_name, r.r_name
    FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
    ORDER BY n.n_nationkey
    """,
)
def q14_broadcast_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast join — explicit hint; plan must show BroadcastHashJoin."""
    cat = Catalog(spark, sf_dir)
    return (
        cat.nation.join(
            F.broadcast(cat.region), F.col("n_regionkey") == F.col("r_regionkey")
        )
        .select("n_nationkey", "n_name", "r_name")
        .transform(ordered, "n_nationkey")
    )


@register(
    "q15_outer_joins",
    oracle="""
    SELECT c.c_custkey,
           coalesce(o.o_orderkey, -1) AS o_key,
           coalesce(o.o_orderstatus, '(no order)') AS status
    FROM customer c LEFT JOIN orders o
      ON c.c_custkey = o.o_custkey AND o.o_orderpriority = '1-URGENT'
    ORDER BY c_custkey, o_key
    """,
)
def q15_outer_joins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join incl. customers with no (urgent) orders.

    Null join outputs are coalesced to sentinels so the checked output has
    no nullable-int columns (engine-portable), while the outer semantics
    are still exercised (sentinel rows exist only for unmatched keys).
    """
    cat = Catalog(spark, sf_dir)
    o = cat.orders
    cond = (F.col("c_custkey") == F.col("o_custkey")) & (
        F.col("o_orderpriority") == "1-URGENT"
    )
    return (
        cat.customer.join(o, cond, "left")
        .select(
            "c_custkey",
            F.coalesce(F.col("o_orderkey"), F.lit(-1)).alias("o_key"),
            F.coalesce(F.col("o_orderstatus"), F.lit("(no order)")).alias("status"),
        )
        .transform(ordered_static, key_bounds(sf_dir, "customer"), "c_custkey", "o_key")
    )


@register(
    "q15b_full_outer",
    oracle="""
    WITH big AS (SELECT o_custkey, count(*) AS n FROM orders
                 GROUP BY o_custkey HAVING count(*) > 12),
         rich AS (SELECT c_custkey FROM customer WHERE c_acctbal > 9000)
    SELECT coalesce(b.o_custkey, -1) AS bk, coalesce(r.c_custkey, -1) AS rk
    FROM big b FULL OUTER JOIN rich r ON b.o_custkey = r.c_custkey
    ORDER BY bk, rk
    """,
)
def q15b_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join between two derived sets with partial overlap."""
    cat = Catalog(spark, sf_dir)
    big = (
        cat.orders.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 12)
        .select("o_custkey")
    )
    rich = cat.customer.filter(F.col("c_acctbal") > 9000).select("c_custkey")
    return (
        big.join(rich, big.o_custkey == rich.c_custkey, "outer")
        .select(
            F.coalesce(F.col("o_custkey"), F.lit(-1)).alias("bk"),
            F.coalesce(F.col("c_custkey"), F.lit(-1)).alias("rk"),
        )
        .transform(ordered, "bk", "rk")
    )


@register(
    "q16_semi_join",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
    ORDER BY c_custkey
    """,
)
def q16_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left semi join: customers having ≥1 large order."""
    cat = Catalog(spark, sf_dir)
    big = cat.orders.filter(F.col("o_totalprice") > 400000)
    return (
        cat.customer.join(big, F.col("c_custkey") == F.col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
        .transform(ordered_static, key_bounds(sf_dir, "customer"), "c_custkey")
    )


@register(
    "q17_anti_join",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    ORDER BY c_custkey
    """,
)
def q17_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left anti join: customers with no orders at all.

    The build side is pre-projected to DISTINCT join keys: an anti join
    only consults key existence, so |orders| rows collapse map-side to
    |distinct custkeys| BEFORE any join movement (r9 sf3: 1.36 → 0.47 s).
    The planner then sees a build side small enough to broadcast and does
    (no hint — at a scale where even the distinct key set outgrows
    broadcast, the same plan degrades to shuffling only the key set,
    never the raw fact). NULL semantics unchanged: distinct keeps a NULL
    key row, and an anti join never matches on NULL either way.
    """
    cat = Catalog(spark, sf_dir)
    keys = cat.orders.select("o_custkey").distinct()
    return (
        cat.customer.join(keys, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .transform(ordered_static, key_bounds(sf_dir, "customer"), "c_custkey")
    )


@register(
    "q18_range_join",
    oracle="""
    SELECT e1.user_id, e1.event_id,
           count(e2.event_id) AS follows_1h
    FROM events e1
    JOIN events e2
      ON e1.user_id = e2.user_id
     AND CAST(e2.ts AS TIMESTAMP) > CAST(e1.ts AS TIMESTAMP)
     AND CAST(e2.ts AS TIMESTAMP) <= CAST(e1.ts AS TIMESTAMP) + INTERVAL 1 HOUR
    WHERE e1.event_type = 'purchase'
    GROUP BY e1.user_id, e1.event_id
    ORDER BY e1.user_id, e1.event_id
    """,
)
def q18_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta/range self-join: events within 1h after each purchase.

    BANDED range join: the range span (1h) is bounded, so each side gets
    an hour-bucket key and the join runs as a pure equi-join on
    (user_id, bucket) — the probe side expands to its 2 candidate buckets
    (an interval (t, t+1h] overlaps at most hour-buckets ⌊t/1h⌋ and
    ⌊t/1h⌋+1) — with the exact range as a residual filter. Candidate
    pairs are bounded by per-(user, hour) density instead of per-user
    TOTAL history, which is what survives scale: a key with a year of
    events enumerates same-hour neighbors only, never all O(n²)/user
    pairs. (Plain equi-join-on-user + residual measured 3.0 s at the
    synthetic sf1, where 10× per-user density made the per-user
    enumeration quadratic; the banded form bounds it.)
    """
    ev = Catalog(spark, sf_dir).events
    # epoch-hour bucket; ts may read as TIMESTAMP_NTZ (Spark 4.1+) or be
    # pre-converted by the Catalog — session tz is pinned UTC either way
    bucket = F.floor(F.col("ts").cast("timestamp").cast("double") / 3600)
    e1 = (
        ev.filter(F.col("event_type") == "purchase")
        .withColumn("_b0", bucket)
        .withColumn("_b", F.explode(F.array(F.col("_b0"), F.col("_b0") + 1)))
        .alias("e1")
    )
    e2 = ev.withColumn("_b", bucket).alias("e2")
    cond = (
        (F.col("e1.user_id") == F.col("e2.user_id"))
        & (F.col("e1._b") == F.col("e2._b"))
        & (F.col("e2.ts") > F.col("e1.ts"))
        & (F.col("e2.ts") <= F.col("e1.ts") + F.expr("INTERVAL 1 HOUR"))
    )
    return (
        e1.join(e2, cond)
        .groupBy(F.col("e1.user_id").alias("user_id"), F.col("e1.event_id").alias("event_id"))
        .agg(F.count(F.col("e2.event_id")).alias("follows_1h"))
        .transform(ordered_static, key_bounds(sf_dir, "events", "user_id"), "user_id", "event_id")
    )


@register(
    "q19_cross_join",
    oracle="""
    SELECT r.r_name, n.n_name FROM region r CROSS JOIN nation n
    ORDER BY r.r_name, n.n_name
    """,
)
def q19_cross_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded cross join (dims only — never fact×fact)."""
    cat = Catalog(spark, sf_dir)
    return (
        cat.region.crossJoin(cat.nation)
        .select("r_name", "n_name")
        .transform(ordered, "r_name", "n_name")
    )


@register(
    "q20_multiway_join",
    oracle=f"""
    SELECT n.n_name,
           {sql_sum6('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
    FROM customer c
    JOIN orders o    ON c.c_custkey = o.o_custkey
    JOIN lineitem l  ON l.l_orderkey = o.o_orderkey
    JOIN supplier s  ON l.l_suppkey = s.s_suppkey
    JOIN nation n    ON s.s_nationkey = n.n_nationkey
    JOIN region r    ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA' AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    GROUP BY n.n_name
    ORDER BY n.n_name
    """,
)
def q20_multiway_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q5-style 6-way join: the fact chain shuffles once (l ⋈ o on
    orderkey); every other side is left UNHINTED so the size-based planner
    picks broadcast-vs-shuffle from table statistics. A hard ``broadcast()``
    here is wrong in BOTH directions: at sf0.1 it was missing on customer
    (a 1 MB table rode a second full-fact shuffle), and at 100 TB it would
    FORCE a billion-row supplier broadcast with no fallback — exactly the
    decision autoBroadcastJoinThreshold/AQE exist to make per-scale."""
    cat = Catalog(spark, sf_dir)
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        cat.lineitem.join(
            cat.orders.filter(
                F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp")
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(cat.customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(cat.supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(cat.nation, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(
            cat.region.filter(F.col("r_name") == "ASIA"),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .groupBy("n_name")
        .agg(sum6(rev).alias("revenue"))
        .transform(ordered, "n_name")
    )


@register(
    "q20b_multiway_cobucketed",
    oracle=f"""
    SELECT n.n_name,
           {sql_sum6('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
    FROM customer c
    JOIN orders o    ON c.c_custkey = o.o_custkey
    JOIN lineitem l  ON l.l_orderkey = o.o_orderkey
    JOIN supplier s  ON l.l_suppkey = s.s_suppkey
    JOIN nation n    ON s.s_nationkey = n.n_nationkey
    JOIN region r    ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA' AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    GROUP BY n.n_name
    ORDER BY n.n_name
    """,
)
def q20b_multiway_cobucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q20 on the lakehouse layout (VERDICT r8 item 2, q13b precedent):
    the l⋈o fact hop reads the co-bucketed tables (zero fact shuffle —
    the bucket files ARE the co-partitioning), and the four dimension
    sides broadcast explicitly. The hints encode the 100 TB plan: facts
    never shuffle per-query, dims ride the fact partitioning (customer
    is a dimension of ORDERS here — at a scale where it outgrows
    broadcast it joins bucket-aligned on custkey like the facts do).

    r9 sf3 decomposition (healthy window, median of 3): current q20 4.8 s
    → this form 1.2–1.5 s; of that, the bare bucketed lineitem scan +
    exact decimal(38,12) revenue sum is 0.57–0.70 s (the irreducible
    floor — count-only scan 0.21 s, double sum 0.29 s, exact decimal
    0.57 s; an int64-cents rewrite measured SLOWER at 0.64 s and differs
    in the last ulp), the merge join adds ~0.3 s, dim broadcasts ~0.2 s.
    The residual ~8× vs DuckDB (0.16 s) is flat scan+decimal-agg
    constant factor, not plan shape — SCALE.md §7.
    """
    from olr_cdc_oracle_with_dbz_spark.operators.storage import (
        ensure_cobucketed_facts,
    )

    cat = Catalog(spark, sf_dir)
    li_b, o_b = ensure_cobucketed_facts(spark, sf_dir)
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li_b.hint("merge")
        .join(
            o_b.filter(
                F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp")
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(cat.customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(cat.supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(cat.nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(
            F.broadcast(cat.region.filter(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .groupBy("n_name")
        .agg(sum6(rev).alias("revenue"))
        .transform(ordered, "n_name")
    )


@register(
    "q21_asof_join",
    oracle="""
    SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, event_type
    FROM (
      SELECT user_id, event_id, ts, event_type,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rn
      FROM events
      WHERE CAST(ts AS TIMESTAMP) <= TIMESTAMP '2024-03-01 00:00:00'
    ) WHERE rn = 1
    ORDER BY user_id
    """,
)
def q21_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of: latest event per user at a cutoff (DuckDB ASOF-JOIN equivalent).

    Spark has no native as-of join; the idiomatic pattern is
    filter + windowed row_number — a single shuffle on the key, no join.
    """
    ev = Catalog(spark, sf_dir).events
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        ev.filter(F.col("ts") <= F.lit("2024-03-01 00:00:00").cast("timestamp"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "ts", "event_type")
        .transform(ordered_static, key_bounds(sf_dir, "events", "user_id"), "user_id")
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str] | None = None,
) -> DataFrame:
    """General as-of join: for each left row, the latest right row with
    ``right_ts <= left_ts`` within the same ``by`` key.

    Union-then-window formulation (the scale shape): tag both sides, sort
    each key's rows by time once, and carry the most recent right-side
    ROW forward with ``last(ignorenulls=True)`` over a single struct. ONE
    shuffle on the key — never a per-row range probe, never a broadcast of
    either side.
    Ties (right_ts == left_ts): the right row is visible to that left row.

    The carry is one struct of the whole right row (not per-column): all
    matched values come from the SAME latest right row, so a genuinely
    NULL value in the latest right row stays NULL instead of being
    back-filled from an older row (per-column ``last(ignorenulls)`` would
    skip it — the classic as-of NULL hazard).
    Citation: SURVEY.md Q21 (DuckDB ASOF JOIN equivalent); used there for
    latest-event-per-user-at-cutoff.
    """
    value_cols = value_cols or [
        c for c in right.columns if c not in (by, right_ts)
    ]
    r_struct_t = F.struct(*[F.col(c) for c in value_cols])
    l_tag = left.select(
        F.col(by),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_is_left"),
        F.lit(None)
        .cast(right.select(r_struct_t.alias("_r")).schema["_r"].dataType)
        .alias("_r"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_l"),
    )
    r_tag = right.select(
        F.col(by),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_is_left"),
        r_struct_t.alias("_r"),
        F.lit(None)
        .cast(l_tag.schema["_l"].dataType)
        .alias("_l"),
    )
    # right rows sort before left rows at equal _ts so an exact-tie right
    # row is already visible when the left row looks back
    w = (
        Window.partitionBy(by)
        .orderBy("_ts", "_is_left")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = l_tag.unionByName(r_tag).select(
        "*",
        F.last("_r", ignorenulls=True).over(w).alias("_c"),
    )
    out = carried.filter(F.col("_is_left") == 1).select(
        *[F.col("_l")[c].alias(c) for c in left.columns],
        *[F.col("_c")[c].alias(c) for c in value_cols],
    )
    return out

"""Set operations (SURVEY §2B Q37–Q39)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from olr_cdc_oracle_with_dbz_spark.catalog import Catalog, key_bounds
from olr_cdc_oracle_with_dbz_spark.plans.canonical import ordered, ordered_static
from olr_cdc_oracle_with_dbz_spark.registry import register


@register(
    "q37_union",
    oracle="""
    SELECT o_orderkey, o_orderstatus, 'split_f' AS src FROM orders WHERE o_orderstatus = 'F'
    UNION ALL
    SELECT o_orderkey, o_orderstatus, 'split_o' AS src FROM orders WHERE o_orderstatus = 'O'
    UNION ALL
    SELECT DISTINCT -1 AS o_orderkey, o_orderstatus, 'distinct' AS src FROM orders
    ORDER BY o_orderkey, o_orderstatus, src
    """,
)
def q37_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL (no shuffle) + UNION-distinct branch."""
    o = Catalog(spark, sf_dir).orders
    f = o.filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_orderstatus", F.lit("split_f").alias("src")
    )
    op = o.filter(F.col("o_orderstatus") == "O").select(
        "o_orderkey", "o_orderstatus", F.lit("split_o").alias("src")
    )
    dist = (
        o.select("o_orderstatus")
        .distinct()
        .select(
            F.lit(-1).cast("long").alias("o_orderkey"),
            "o_orderstatus",
            F.lit("distinct").alias("src"),
        )
    )
    return f.unionAll(op).unionAll(dist).transform(ordered_static, key_bounds(sf_dir, "orders"), "o_orderkey", "o_orderstatus", "src")


@register(
    "q38_intersect",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderpriority = '2-HIGH'
    ORDER BY o_custkey
    """,
)
def q38_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT: customers with both urgent and high-priority orders."""
    o = Catalog(spark, sf_dir).orders
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    high = o.filter(F.col("o_orderpriority") == "2-HIGH").select("o_custkey")
    return urgent.intersect(high).transform(ordered_static, key_bounds(sf_dir, "orders", "o_custkey"), "o_custkey")


@register(
    "q38b_except",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderpriority = '2-HIGH'
    ORDER BY o_custkey
    """,
)
def q38b_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT: urgent-only customers."""
    o = Catalog(spark, sf_dir).orders
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    high = o.filter(F.col("o_orderpriority") == "2-HIGH").select("o_custkey")
    # subtract == EXCEPT DISTINCT (exceptAll would keep multiplicity)
    return urgent.subtract(high).transform(ordered_static, key_bounds(sf_dir, "orders", "o_custkey"), "o_custkey")


@register(
    "q39_distinct",
    oracle="""
    SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q39_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT (partial-agg dedup before shuffle)."""
    li = Catalog(spark, sf_dir).lineitem
    return li.select("l_returnflag", "l_linestatus").distinct().transform(ordered, 
        "l_returnflag", "l_linestatus"
    )

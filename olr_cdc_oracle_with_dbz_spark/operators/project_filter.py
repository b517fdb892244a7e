"""Projection, filter, and predicate operators (SURVEY §2B Q5–Q12).

All pure narrow transformations: no shuffle, fully pipelined inside
whole-stage codegen, and the filters compile to parquet PushedFilters — at
100 TB these queries read only the row groups whose min/max stats pass the
predicate. (The reference's analogue is OLR's source-side table filter and
format-flag projection, /root/reference/scripts/OpenLogReplicator.json:14-39.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from olr_cdc_oracle_with_dbz_spark.catalog import Catalog, key_bounds
from olr_cdc_oracle_with_dbz_spark.plans.canonical import fround, ordered, ordered_static
from olr_cdc_oracle_with_dbz_spark.registry import register


@register(
    "q05_arith_projection",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(l_extendedprice * (1 - l_discount), 6) AS net_price,
           ROUND(l_extendedprice * (1 - l_discount) * (1 + l_tax), 6) AS charged
    FROM lineitem ORDER BY l_orderkey, l_linenumber
    """,
)
def q05_arith_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arithmetic projection (same IEEE double expression both engines)."""
    li = Catalog(spark, sf_dir).lineitem
    net = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        fround(net, 6).alias("net_price"),
        fround(net * (1 + F.col("l_tax")), 6).alias("charged"),
    ).transform(ordered_static, key_bounds(sf_dir, "lineitem"), "l_orderkey", "l_linenumber")


@register(
    "q06_filter_bool",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
    FROM lineitem
    WHERE l_quantity > 30 AND l_returnflag = 'R' AND NOT l_linestatus = 'O'
    ORDER BY l_orderkey, l_linenumber
    """,
)
def q06_filter_bool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Comparison + boolean predicate combination (AND/NOT) — pushed to scan."""
    li = Catalog(spark, sf_dir).lineitem
    return (
        li.filter(
            (F.col("l_quantity") > 30)
            & (F.col("l_returnflag") == "R")
            & ~(F.col("l_linestatus") == "O")
        )
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
        .transform(ordered_static, key_bounds(sf_dir, "lineitem"), "l_orderkey", "l_linenumber")
    )


@register(
    "q07_between_date",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_shipdate
    FROM lineitem
    WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00' AND TIMESTAMP '1996-12-31 23:59:59'
    ORDER BY l_orderkey, l_linenumber
    """,
)
def q07_between_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BETWEEN over a timestamp column (row-group pruning at scale)."""
    li = Catalog(spark, sf_dir).lineitem
    return (
        li.filter(
            F.col("l_shipdate").between(
                F.lit("1996-01-01 00:00:00").cast("timestamp"),
                F.lit("1996-12-31 23:59:59").cast("timestamp"),
            )
        )
        .select("l_orderkey", "l_linenumber", "l_shipdate")
        .transform(ordered_static, key_bounds(sf_dir, "lineitem"), "l_orderkey", "l_linenumber")
    )


@register(
    "q08_in_list",
    oracle="""
    SELECT o_orderkey, o_orderpriority,
           o_orderstatus NOT IN ('P') AS not_pending
    FROM orders
    WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
    ORDER BY o_orderkey
    """,
)
def q08_in_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN / NOT IN list predicates."""
    o = Catalog(spark, sf_dir).orders
    return (
        o.filter(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .select(
            "o_orderkey",
            "o_orderpriority",
            (~F.col("o_orderstatus").isin("P")).alias("not_pending"),
        )
        .transform(ordered_static, key_bounds(sf_dir, "orders"), "o_orderkey")
    )


@register(
    "q09_like_regex",
    oracle="""
    SELECT p_partkey, p_name, p_type,
           regexp_matches(p_name, '^(b|c)') AS starts_bc
    FROM part
    WHERE p_type LIKE '%ROM%' OR p_name LIKE 'blue%'
    ORDER BY p_partkey
    """,
)
def q09_like_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE and regex predicates (Java regex ∩ RE2 feature subset only)."""
    p = Catalog(spark, sf_dir).part
    return (
        p.filter(F.col("p_type").like("%ROM%") | F.col("p_name").like("blue%"))
        .select(
            "p_partkey",
            "p_name",
            "p_type",
            F.col("p_name").rlike("^(b|c)").alias("starts_bc"),
        )
        .transform(ordered_static, key_bounds(sf_dir, "part"), "p_partkey")
    )


@register(
    "q10_null_semantics",
    oracle="""
    SELECT c_custkey,
           coalesce(nullif(c_mktsegment, 'BUILDING'), '(none)') AS seg,
           nullif(c_mktsegment, 'BUILDING') IS NULL AS was_nulled,
           (c_acctbal > 0 AND nullif(c_mktsegment, 'BUILDING') IS NOT NULL) AS flag3vl
    FROM customer ORDER BY c_custkey
    """,
)
def q10_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL handling: nullif/coalesce/isNull + three-valued logic."""
    c = Catalog(spark, sf_dir).customer
    nulled = F.nullif(F.col("c_mktsegment"), F.lit("BUILDING"))
    return c.select(
        "c_custkey",
        F.coalesce(nulled, F.lit("(none)")).alias("seg"),
        nulled.isNull().alias("was_nulled"),
        ((F.col("c_acctbal") > 0) & nulled.isNotNull()).alias("flag3vl"),
    ).transform(ordered_static, key_bounds(sf_dir, "customer"), "c_custkey")


@register(
    "q11_case_when",
    oracle="""
    SELECT p_partkey, p_retailprice,
           CASE WHEN p_retailprice < 905 THEN 'low'
                WHEN p_retailprice < 912 THEN 'mid'
                ELSE 'high' END AS band
    FROM part ORDER BY p_partkey
    """,
)
def q11_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN price banding."""
    p = Catalog(spark, sf_dir).part
    return p.select(
        "p_partkey",
        "p_retailprice",
        F.when(F.col("p_retailprice") < 905, "low")
        .when(F.col("p_retailprice") < 912, "mid")
        .otherwise("high")
        .alias("band"),
    ).transform(ordered_static, key_bounds(sf_dir, "part"), "p_partkey")


@register(
    "q12_cast_matrix",
    oracle="""
    SELECT p_partkey,
           CAST(p_size AS DOUBLE)                          AS size_d,
           CAST(p_size AS VARCHAR)                         AS size_s,
           CAST(CAST(p_partkey AS VARCHAR) AS BIGINT)      AS key_rt,
           CAST(CAST(p_retailprice AS DECIMAL(12,2)) AS DOUBLE) AS price_dbl,
           CAST(CAST(p_retailprice AS DECIMAL(12,2)) AS VARCHAR) AS price_s,
           CAST(CAST(p_size AS VARCHAR) || '.5' AS DOUBLE) AS str_to_d
    FROM part ORDER BY p_partkey
    """,
)
def q12_cast_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Casts across primitive types.

    Deliberately excludes double→int (Spark truncates, ANSI engines round —
    a documented semantic difference; the engine's public surface offers
    floor/ceil/round for explicit intent).

    Decimals are never emitted bare in checked output: the reference's wire
    contract renders decimals as strings (``decimal.handling.mode=string``,
    /root/reference/README.md:823), and cross-engine Decimal objects hash
    differently from float64 — so the decimal path is exercised through its
    DOUBLE and VARCHAR renderings (``price_dbl`` / ``price_s``).
    """
    p = Catalog(spark, sf_dir).part
    dec = F.col("p_retailprice").cast("decimal(12,2)")
    return p.select(
        "p_partkey",
        F.col("p_size").cast("double").alias("size_d"),
        F.col("p_size").cast("string").alias("size_s"),
        F.col("p_partkey").cast("string").cast("bigint").alias("key_rt"),
        dec.cast("double").alias("price_dbl"),
        dec.cast("string").alias("price_s"),
        F.concat(F.col("p_size").cast("string"), F.lit(".5")).cast("double").alias("str_to_d"),
    ).transform(ordered_static, key_bounds(sf_dir, "part"), "p_partkey")

"""UDF / UDAF / UDTF surface (SURVEY §2B U1–U5).

UDFs are the engine's slow path — everything here exists to prove the
extension surface works and stays Arrow-vectorized, not because these
computations need Python (each has a parity oracle showing the built-in
equivalent). Ordering of preference at scale: built-ins ≫ pandas UDF
(Arrow batches) ≫ row-at-a-time Python UDF (U1, kept deliberately tiny).
"""

from __future__ import annotations

import math

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udf

from olr_cdc_oracle_with_dbz_spark.catalog import Catalog
from olr_cdc_oracle_with_dbz_spark.catalog import key_bounds
from olr_cdc_oracle_with_dbz_spark.plans.canonical import fround, ordered, presort_static
from olr_cdc_oracle_with_dbz_spark.registry import register


# NOTE: udf()/pandas_udf() wrappers are built INSIDE the query functions —
# a module-level @udf decorator would run during worker-side unpickling of
# the applyInPandas functions below and fail (no session on the worker).


def _net_price_plain(price: float, discount: float) -> float:
    # same IEEE double expression as the built-in path
    return price * (1.0 - discount)


@register(
    "u1_python_udf",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(l_extendedprice * (1 - l_discount), 6) AS net
    FROM lineitem WHERE l_orderkey < 1000
    ORDER BY l_orderkey, l_linenumber
    """,
    tags=("udf",),
)
def u1_python_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python scalar UDF (parity vs built-in arithmetic)."""
    # useArrow=False pinned: this IS the deliberate row-at-a-time demo, and
    # Spark 4.1 warns "Cannot infer the eval type" on scalar type hints if
    # the Arrow choice is left implicit.
    net_udf = udf(_net_price_plain, "double", useArrow=False)
    li = Catalog(spark, sf_dir).lineitem.filter(F.col("l_orderkey") < 1000)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(net_udf("l_extendedprice", "l_discount"), 6).alias("net"),
        # partitions=1: a sampled range sort would run the Python UDF twice
    ).transform(ordered, "l_orderkey", "l_linenumber", partitions=1)


def _net_price_series(price: pd.Series, discount: pd.Series) -> pd.Series:
    return price * (1.0 - discount)


@register(
    "u2_pandas_udf",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(l_extendedprice * (1 - l_discount), 6) AS net
    FROM lineitem
    ORDER BY l_orderkey, l_linenumber
    """,
    tags=("udf",),
)
def u2_pandas_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized (Arrow) pandas UDF — the sanctioned Python fast path."""
    net_pudf = pandas_udf(_net_price_series, "double")
    li = Catalog(spark, sf_dir).lineitem
    # range-partition BEFORE the pandas UDF: the sampled range sort placed
    # after it re-runs the whole Arrow round-trip. Static bounds (parquet
    # footer min/max of the leading key) replace the boundary-sampling job
    # the sampled presort_ranges scheduled every execution; bucket b lands
    # in partition b, so sortWithinPartitions below still yields the same
    # total order (ties on l_orderkey stay inside one bucket).
    return (
        li.select("l_orderkey", "l_linenumber", "l_extendedprice", "l_discount")
        .transform(presort_static, key_bounds(sf_dir, "lineitem"), "l_orderkey")
        .select(
            "l_orderkey",
            "l_linenumber",
            fround(net_pudf("l_extendedprice", "l_discount"), 6).alias("net"),
        )
        .sortWithinPartitions("l_orderkey", "l_linenumber")
    )


def _normalize_group(pdf: pd.DataFrame) -> pd.DataFrame:
    # deterministic: sort by line number, exact fsum for the mean
    pdf = pdf.sort_values("l_linenumber")
    n = len(pdf)
    mean = math.fsum(pdf["l_quantity"]) / n
    pdf["qty_dev"] = (pdf["l_quantity"] - mean).round(6)
    return pdf[["l_orderkey", "l_linenumber", "qty_dev"]]


@register(
    "u3_apply_in_pandas",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(l_quantity -
                 CAST(SUM(CAST(l_quantity AS DECIMAL(38,12))) OVER (PARTITION BY l_orderkey) AS DOUBLE)
                 / COUNT(*) OVER (PARTITION BY l_orderkey), 6) AS qty_dev
    FROM lineitem WHERE l_orderkey < 500
    ORDER BY l_orderkey, l_linenumber
    """,
    tags=("udf",),
)
def u3_apply_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas: per-group mean-centering.

    ``math.fsum`` keeps the Python-side mean exact so it matches the
    oracle's decimal-sum mean bit-for-bit (group sizes ≤ 7 here, but the
    same trick holds for any size).

    The explicit ``repartition(pool, key)`` pre-shapes the shuffle:
    grouped-map pays per-group Python dispatch, and AQE would coalesce
    this tiny exchange to ONE partition — serializing ~500 group
    dispatches on a 32-core machine. Width = defaultParallelism so every
    core dispatches groups concurrently (r19: the old fixed 8 left 2/3 of
    the pool idle through the Python stage — interleaved medians 0.59 →
    0.49 s at width 24); the groupBy reuses the partitioning (no second
    shuffle).
    """
    li = Catalog(spark, sf_dir).lineitem.filter(F.col("l_orderkey") < 500)
    return (
        li.select("l_orderkey", "l_linenumber", "l_quantity")
        .repartition(spark.sparkContext.defaultParallelism, "l_orderkey")
        .groupBy("l_orderkey")
        .applyInPandas(_normalize_group, "l_orderkey bigint, l_linenumber int, qty_dev double")
        # partitions=1: sampling would dispatch every Python group twice
        .transform(ordered, "l_orderkey", "l_linenumber", partitions=1)
    )


@register(
    "u4_udaf_weighted_avg",
    oracle="""
    SELECT l_returnflag,
           ROUND(CAST(SUM(CAST(l_extendedprice * l_quantity AS DECIMAL(38,12))) AS DOUBLE)
                 / CAST(SUM(CAST(l_quantity AS DECIMAL(38,12))) AS DOUBLE), 6) AS wavg_price
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    tags=("udf",),
)
def u4_udaf_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom UDAF with MAP-SIDE COMBINE: quantity-weighted average price.

    The real distributed-UDAF shape: a ``mapInPandas`` stage computes
    per-batch partial sums (the combiner), the shuffle carries one tiny
    row per (flag, batch), and the JVM merges partials exactly. The naive
    grouped-map form (``groupBy(flag).applyInPandas``) serializes entire
    groups into single Python calls — ~2M rows/group at sf1 with only 3
    keys, unbounded group memory at 100 TB (measured 2.3 s sf1 → ~0.4 s).

    Exactness: price is 2-dp and quantity integral, so price·qty·100 is
    an exact int64 per row; per-batch int64 sums are exact, the JVM merge
    sums them as decimal(38,0) (exact at any scale), and the single
    decimal→double cast per term matches the oracle's
    ``CAST(SUM(DECIMAL) AS DOUBLE)`` bit-for-bit.
    """
    li = Catalog(spark, sf_dir).lineitem

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            w = np.round(
                pdf["l_extendedprice"].to_numpy(np.float64)
                * pdf["l_quantity"].to_numpy(np.float64)
                * 100
            ).astype("int64")
            q = np.round(pdf["l_quantity"].to_numpy(np.float64)).astype("int64")
            g = (
                pd.DataFrame(
                    {"l_returnflag": pdf["l_returnflag"].values, "w_cents": w, "qty": q}
                )
                .groupby("l_returnflag", as_index=False)
                .sum()
            )
            yield g[["l_returnflag", "w_cents", "qty"]]

    partials = li.select("l_returnflag", "l_extendedprice", "l_quantity").mapInPandas(
        partial, "l_returnflag string, w_cents long, qty long"
    )
    sw = F.sum(F.col("w_cents").cast("decimal(38,0)")).cast("decimal(38,2)") / 100
    sq = F.sum(F.col("qty").cast("decimal(38,0)"))
    return (
        partials.groupBy("l_returnflag")
        .agg(
            F.round(sw.cast("double") / sq.cast("double"), 6).alias("wavg_price")
        )
        .transform(ordered, "l_returnflag")
    )


@register(
    "u4b_weighted_avg_builtin",
    oracle="""
    SELECT l_returnflag,
           ROUND(CAST(SUM(CAST(l_extendedprice * l_quantity AS DECIMAL(38,12))) AS DOUBLE)
                 / CAST(SUM(CAST(l_quantity AS DECIMAL(38,12))) AS DOUBLE), 6) AS wavg_price
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    tags=("udf",),
)
def u4b_weighted_avg_builtin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JVM built-in twin of u4 (VERDICT r8 item 8): same weighted average,
    same oracle, pure whole-stage-codegen decimal aggregation — the form a
    production job would use. u4 stays registered as the UDAF *contract*
    row (mapInPandas partial-agg shape); its 68×-at-sf3 timing is the Arrow
    round-trip being demonstrated, not a defect — this twin is the perf
    row.
    """
    li = Catalog(spark, sf_dir).lineitem
    w = F.sum((F.col("l_extendedprice") * F.col("l_quantity")).cast("decimal(38,12)"))
    q = F.sum(F.col("l_quantity").cast("decimal(38,12)"))
    return (
        li.groupBy("l_returnflag")
        .agg(F.round(w.cast("double") / q.cast("double"), 6).alias("wavg_price"))
        .transform(ordered, "l_returnflag")
    )


@register(
    "u5_tokenize_udtf",
    oracle="""
    SELECT doc_id, token, COUNT(*) AS n
    FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token
          FROM documents WHERE doc_id < 10)
    GROUP BY doc_id, token
    ORDER BY doc_id, token
    """,
    tags=("udf",),
)
def u5_tokenize_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UDTF-shaped tokenization via mapInPandas (one row → many rows).

    Spark's lateral-view explode covers the same shape declaratively
    (q43b); this proves the arbitrary-fanout Python path with Arrow
    batching, as a training-data tokenizer would use.
    """
    d = Catalog(spark, sf_dir).documents.filter(F.col("doc_id") < 10)

    def fanout(batches):
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                for tok in str(text).split(" "):
                    rows.append((doc_id, tok))
            out = pd.DataFrame(rows, columns=["doc_id", "token"])
            yield out.groupby(["doc_id", "token"], as_index=False).agg(
                n=("token", "size")
            )

    return (
        d.select("doc_id", "text")
        .repartition("doc_id")
        .mapInPandas(fanout, "doc_id bigint, token string, n bigint")
        .groupBy("doc_id", "token")
        .agg(F.sum("n").alias("n"))
        .transform(ordered, "doc_id", "token")
    )

"""Subqueries and CTEs (SURVEY §2B Q47–Q49) — expressed as Spark SQL text.

Catalyst decorrelates EXISTS/IN subqueries into joins; the scalar subquery
becomes a broadcast of a one-row relation. Temp views are registered per
scale-factor directory by the Catalog.

Determinism note: Q47's threshold uses the *exact decimal* average rewritten
as ``price * n > sum`` so both engines make identical include/exclude
decisions at the boundary (a double-avg threshold could flip rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from olr_cdc_oracle_with_dbz_spark.catalog import Catalog
from olr_cdc_oracle_with_dbz_spark.registry import register

_Q47 = """
SELECT o_orderkey, o_totalprice
FROM orders CROSS JOIN (
  SELECT COUNT(*) AS n, SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS s
  FROM orders
) t
WHERE CAST(o_totalprice AS DECIMAL(18,6)) * t.n > t.s
ORDER BY o_orderkey
"""

_Q48 = """
SELECT o.o_orderpriority, COUNT(*) AS n_orders
FROM orders o
WHERE EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 48
)
GROUP BY o.o_orderpriority
ORDER BY o.o_orderpriority
"""

_Q49 = """
WITH cust_rev AS (
  -- micro-unit long sum (the q22 pattern): exact, order-independent, and
  -- render-type-stable. Round-2 driver red dissected: segment values were
  -- bitwise identical; the hash mismatch was SUM(BIGINT) → HUGEINT in
  -- DuckDB (rendered 2932.0) vs Spark's BIGINT (2932), so every summed
  -- integer output below is pinned to BIGINT on both sides.
  SELECT o_custkey,
         SUM(CAST(ROUND(o_totalprice * 1000000) AS BIGINT)) AS rev_micro,
         COUNT(*) AS n_orders
  FROM orders GROUP BY o_custkey
),
seg AS (
  SELECT c_custkey, c_mktsegment FROM customer
)
SELECT s.c_mktsegment,
       COUNT(*) AS n_cust,
       ROUND(CAST(SUM(r.rev_micro) AS DOUBLE) / 1000000, 6) AS segment_rev,
       CAST(SUM(r.n_orders) AS BIGINT) AS segment_orders
FROM cust_rev r JOIN seg s ON r.o_custkey = s.c_custkey
GROUP BY s.c_mktsegment
ORDER BY s.c_mktsegment
"""

_Q48B = """
SELECT c_custkey, c_name
FROM customer
WHERE c_custkey IN (
  SELECT o_custkey FROM orders
  WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 450000
)
ORDER BY c_custkey
"""


def _sql(spark: SparkSession, sf_dir: str, text: str) -> DataFrame:
    Catalog(spark, sf_dir).register_views()
    return spark.sql(text)


@register("q47_scalar_subquery", oracle=_Q47)
def q47_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders above the (exact) average total price.

    Written as ONE single-row aggregate cross-joined in (a broadcast of
    one row) rather than two scalar subqueries: Catalyst plans separate
    ``(SELECT COUNT(*))`` / ``(SELECT SUM(..))`` subqueries as two full
    scans of orders (r6 plan audit — MergeScalarSubqueries didn't fire),
    so the merged form reads the table twice total instead of three times.
    """
    return _sql(spark, sf_dir, _Q47)


@register("q48_exists_subquery", oracle=_Q48)
def q48_exists_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q4-style correlated EXISTS (decorrelated to semi-join)."""
    return _sql(spark, sf_dir, _Q48)


@register("q48b_in_subquery", oracle=_Q48B)
def q48b_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated IN subquery."""
    return _sql(spark, sf_dir, _Q48B)


@register("q49_cte", oracle=_Q49)
def q49_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-CTE revenue rollup per market segment."""
    return _sql(spark, sf_dir, _Q49)

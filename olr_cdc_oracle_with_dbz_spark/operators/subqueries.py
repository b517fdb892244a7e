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
FROM orders
WHERE CAST(o_totalprice AS DECIMAL(18,6)) * (SELECT COUNT(*) FROM orders)
      > (SELECT SUM(CAST(o_totalprice AS DECIMAL(18,6))) FROM orders)
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
  SELECT o_custkey,
         SUM(CAST(o_totalprice AS DECIMAL(38,12))) AS rev,
         COUNT(*) AS n_orders
  FROM orders GROUP BY o_custkey
),
seg AS (
  SELECT c_custkey, c_mktsegment FROM customer
)
SELECT s.c_mktsegment,
       COUNT(*) AS n_cust,
       -- round in the DECIMAL domain: ROUND(double, 6) of a ~1e10 value
       -- differs by 1 ulp between engines (6-dp decimals of that
       -- magnitude aren't representable as doubles); decimal round is
       -- exact in both, and the final double cast picks the same nearest
       CAST(ROUND(SUM(r.rev), 2) AS DOUBLE) AS segment_rev,
       SUM(r.n_orders) AS segment_orders
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
    """Orders above the (exact) average total price — scalar subquery."""
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

"""Skew mitigation: salting patterns for hot keys (SCALE.md §4).

AQE's skew-join splitting handles most cases at runtime; these are the
explicit forms for the two shapes AQE can't fix:

* **Aggregation on a hot key** — one reducer owns the whole key. Salted
  two-level aggregation splits each key across ``salts`` partial groups,
  then combines partials; correct for any algebraic aggregate expressed
  as (partial, combine) pairs.
* **Join with a hot probe key** — all matching rows of the hot key land
  on one task. Salting replicates the *build* (small) side ``salts``
  times and scatters the probe side across the replicas; the join result
  is identical because every probe row still meets every matching build
  row exactly once.

Salt derivation is deterministic (xxhash64 of a distinguishing column),
so plans stay reproducible — no ``rand()`` in the dataflow.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _salt(distinct_col: Column | str, salts: int) -> Column:
    c = F.col(distinct_col) if isinstance(distinct_col, str) else distinct_col
    return F.pmod(F.xxhash64(c), F.lit(salts)).cast("int")


def salted_count_sum(
    df: DataFrame,
    key: str,
    sum_col: str,
    scatter_col: str,
    salts: int = 16,
) -> DataFrame:
    """groupBy(key).agg(count, sum) with two-level salted aggregation.

    ``scatter_col`` is any column that varies within a key (row id, event
    id); it only determines which partial group a row lands in.
    Output: ``key, n, total`` — identical to the direct aggregate.
    """
    partial = (
        df.withColumn("_salt", _salt(scatter_col, salts))
        .groupBy(key, "_salt")
        .agg(F.count(F.lit(1)).alias("_n"), F.sum(sum_col).alias("_s"))
    )
    return partial.groupBy(key).agg(
        F.sum("_n").alias("n"), F.sum("_s").alias("total")
    )


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    key: str,
    scatter_col: str,
    salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """probe ⋈ build on ``key`` with the build side replicated per salt.

    The probe side's hot keys scatter across ``salts`` tasks; each task
    holds a full replica of the build rows for its keys, so results equal
    the plain join. Build-side blowup is ×salts — use only when the build
    side is dimension-sized (which is exactly the hot-key join shape).
    """
    p = probe.withColumn("_salt", _salt(scatter_col, salts))
    # sequence(int, int) yields array<int>; a cast around explode would
    # wrap the generator in an expression, which Spark rejects
    b = build.withColumn("_salt", F.explode(F.sequence(F.lit(0), F.lit(salts - 1))))
    return p.join(b, [key, "_salt"], how).drop("_salt")

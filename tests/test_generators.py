"""explode_once/posexplode_once: semantics ≡ non-outer explode, array once.

The helpers exist for performance (see functions/generators.py docstring);
these tests pin the SEMANTIC contract: empty and NULL arrays emit no rows
(exactly like plain explode), elements and positions are preserved, and
the plan contains no optimizer-inferred duplicate of the array expression.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from olr_cdc_oracle_with_dbz_spark.functions.generators import (
    explode_once,
    posexplode_once,
)


def _docs(spark):
    return spark.createDataFrame(
        [(1, "a b c"), (2, ""), (3, None), (4, "x y")],
        "id long, txt string",
    )


def test_explode_once_matches_plain_explode(spark):
    df = _docs(spark)
    arr = F.split("txt", " ")
    plain = df.select("id", F.explode(arr).alias("tok"))
    once = explode_once(df, ["id"], arr, "tok")
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, plain.collect()))
    # NULL input array (id=3) emits nothing in both forms
    assert once.filter(F.col("id") == 3).count() == 0


def test_explode_once_empty_array_emits_no_rows(spark):
    df = _docs(spark)
    arr = F.filter(F.split("txt", " "), lambda t: F.length(t) > 90)  # always empty
    assert explode_once(df, ["id"], arr, "tok").count() == 0


def test_posexplode_once_positions(spark):
    df = _docs(spark)
    arr = F.split("txt", " ")
    plain = df.select("id", F.posexplode(arr).alias("pos", "tok"))
    once = posexplode_once(df, ["id"], arr, "pos", "tok")
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, plain.collect()))


def test_explode_once_array_expression_appears_once_in_plan(spark):
    """The raison d'être: the computed-array expression must occur exactly
    once in the physical plan (the non-outer form duplicates it into an
    inferred size(arr)>0 filter below the projection)."""
    df = _docs(spark)
    arr = F.array_distinct(
        F.transform(F.split("txt", " "), lambda t: F.xxhash64(t))
    )
    once = explode_once(df, ["id"], arr, "h")
    plan = once._jdf.queryExecution().executedPlan().toString()
    assert plan.count("array_distinct") == 1

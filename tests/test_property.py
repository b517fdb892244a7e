"""Property-based differential spot checks (SURVEY §5.2 item 5).

Hypothesis generates small random tables (seeded, shrinkable); Spark and
DuckDB run the same relational expression and must agree exactly. This
probes the operator semantics the fixed testdata can't reach: empty
tables, all-NULL columns, duplicate keys everywhere, single-row groups,
unmatched join keys.
"""

from __future__ import annotations

import duckdb
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SETTINGS = settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
    derandomize=True,  # seeded: CI-stable, still shrinks on failure
)

ROW = st.tuples(
    st.integers(min_value=0, max_value=6),  # join/group key (heavy dupes)
    st.one_of(st.none(), st.integers(min_value=-1000, max_value=1000)),
    st.one_of(st.none(), st.sampled_from(["a", "b", "xyz", "", "Ü"])),
)


def _pdf(rows: list[tuple]) -> pd.DataFrame:
    return pd.DataFrame(rows, columns=["k", "v", "s"]).astype(
        {"k": "int64", "v": "Int64", "s": "object"}
    )


def _spark_df(spark, rows):
    return spark.createDataFrame(_pdf(rows), schema="k long, v long, s string")


def _canon(pdf: pd.DataFrame) -> list[tuple]:
    pdf = pdf.astype("object").where(pd.notna(pdf), None)
    return sorted(
        map(tuple, pdf.values.tolist()),
        key=lambda t: tuple((x is None, str(x)) for x in t),
    )


def _compare(spark_df, duck_rel) -> None:
    got = _canon(spark_df.toPandas())
    want = _canon(duck_rel.df())
    assert got == want


@given(rows=st.lists(ROW, max_size=25))
@SETTINGS
def test_groupby_agg_parity(spark, rows):
    from pyspark.sql import functions as F

    df = _spark_df(spark, rows)
    got = df.groupBy("k").agg(
        F.count(F.lit(1)).alias("n"),
        F.count("v").alias("nv"),  # NULL-skipping count
        F.sum("v").alias("sv"),  # exact long sum; NULL iff group all-NULL
        F.countDistinct("s").alias("ns"),
        F.max("s").alias("mx"),
    )
    con = duckdb.connect()
    con.register("t", _pdf(rows))
    _compare(
        got,
        con.sql(
            "SELECT k, COUNT(*) AS n, COUNT(v) AS nv, SUM(v) AS sv, "
            "COUNT(DISTINCT s) AS ns, MAX(s) AS mx FROM t GROUP BY k"
        ),
    )


@given(rows=st.lists(ROW, max_size=20), rows2=st.lists(ROW, max_size=20))
@SETTINGS
def test_join_parity(spark, rows, rows2):
    from pyspark.sql import functions as F

    a = _spark_df(spark, rows)
    b = _spark_df(spark, rows2).select(
        F.col("k"), F.col("v").alias("v2"), F.col("s").alias("s2")
    )
    got = a.join(b, "k", "left").select("k", "v", "s", "v2", "s2")
    con = duckdb.connect()
    con.register("a", _pdf(rows))
    con.register("b", _pdf(rows2))
    _compare(
        got,
        con.sql(
            "SELECT a.k, a.v, a.s, b.v AS v2, b.s AS s2 "
            "FROM a LEFT JOIN b ON a.k = b.k"
        ),
    )


@given(rows=st.lists(ROW, max_size=20), rows2=st.lists(ROW, max_size=20))
@SETTINGS
def test_setop_parity(spark, rows, rows2):
    """EXCEPT ALL + DISTINCT: NULL-aware set semantics must match."""
    a = _spark_df(spark, rows)
    b = _spark_df(spark, rows2)
    got = a.exceptAll(b).distinct()
    con = duckdb.connect()
    con.register("a", _pdf(rows))
    con.register("b", _pdf(rows2))
    _compare(
        got,
        con.sql("SELECT DISTINCT * FROM (SELECT * FROM a EXCEPT ALL SELECT * FROM b)"),
    )


@given(rows=st.lists(ROW, max_size=25))
@SETTINGS
def test_window_rank_parity(spark, rows):
    """row_number over a TOTAL order (ties broken by all columns) must
    agree across engines for arbitrary duplicate-heavy data."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    df = _spark_df(spark, rows)
    w = Window.partitionBy("k").orderBy(
        F.col("v").asc_nulls_first(), F.col("s").asc_nulls_first()
    )
    got = df.withColumn("rn", F.row_number().over(w))
    con = duckdb.connect()
    con.register("t", _pdf(rows))
    _compare(
        got,
        con.sql(
            "SELECT *, CAST(row_number() OVER (PARTITION BY k "
            "ORDER BY v ASC NULLS FIRST, s ASC NULLS FIRST) AS INT) AS rn FROM t"
        ),
    )


@given(rows=st.lists(ROW, max_size=20), rows2=st.lists(ROW, max_size=20))
@SETTINGS
def test_intersect_parity(spark, rows, rows2):
    """INTERSECT (distinct, NULL-aware) must match across engines."""
    a = _spark_df(spark, rows)
    b = _spark_df(spark, rows2)
    got = a.intersect(b)
    con = duckdb.connect()
    con.register("a", _pdf(rows))
    con.register("b", _pdf(rows2))
    _compare(got, con.sql("SELECT * FROM a INTERSECT SELECT * FROM b"))


ASCII = st.one_of(st.none(), st.text(alphabet=" abcXYZ09_-", max_size=12))


@given(vals=st.lists(st.tuples(st.integers(0, 30), ASCII), max_size=25))
@SETTINGS
def test_string_function_parity(spark, vals):
    """substr/length/upper/trim/concat agree on the ASCII subset for
    arbitrary inputs incl. NULL and empty strings."""
    import pandas as pd
    from pyspark.sql import functions as F

    pdf = pd.DataFrame(vals, columns=["i", "s"]).astype({"i": "int64", "s": "object"})
    df = spark.createDataFrame(pdf, schema="i long, s string")
    got = df.select(
        "i",
        F.length("s").alias("ln"),
        F.upper("s").alias("up"),
        F.substring("s", 2, 3).alias("sub"),
        F.trim("s").alias("tr"),
        F.concat_ws("|", "s", "s").alias("cc"),
    )
    con = duckdb.connect()
    con.register("t", pdf)
    _compare(
        got,
        con.sql(
            "SELECT i, CAST(length(s) AS INT) AS ln, upper(s) AS up, "
            "substr(s, 2, 3) AS sub, trim(s) AS tr, "
            "concat_ws('|', s, s) AS cc FROM t"
        ),
    )


# --- round-2 helpers: ordered() ≡ orderBy, explode_once ≡ explode ---------

@given(rows=st.lists(ROW, min_size=0, max_size=30), parts=st.sampled_from([1, 3, 8]))
@SETTINGS
def test_ordered_equals_orderby(spark, rows, parts):
    """ordered(df, cols, partitions=N) must produce the identical global
    row order as orderBy for every N, including NULL keys, ties, and desc
    — the property the round-2 presentation-sort rewrite rests on."""
    from pyspark.sql import functions as F

    from olr_cdc_oracle_with_dbz_spark.plans.canonical import ordered

    df = _spark_df(spark, rows)
    keys = [F.col("s").asc_nulls_first(), F.col("v").desc(), F.col("k")]
    want = [tuple(r) for r in df.orderBy(*keys).collect()]
    got = [tuple(r) for r in ordered(df, *keys, partitions=parts).collect()]
    # rows tied on ALL sort keys are interchangeable between the two
    # forms, so compare (a) the multiset of rows and (b) the sort-key
    # projection sequence, which is fully determined
    assert sorted(got, key=repr) == sorted(want, key=repr)
    assert [(t[2], t[1], t[0]) for t in got] == [(t[2], t[1], t[0]) for t in want]


@given(rows=st.lists(ROW, min_size=0, max_size=30))
@SETTINGS
def test_explode_once_equals_explode_on_random_arrays(spark, rows):
    """explode_once over a computed array (split of a nullable string)
    must emit exactly the rows plain explode emits — empty strings, NULL
    inputs, and duplicate elements included."""
    from pyspark.sql import functions as F

    from olr_cdc_oracle_with_dbz_spark.functions.generators import explode_once

    df = _spark_df(spark, rows)
    arr = F.split(F.upper(F.coalesce("s", F.lit("n u l l"))), " ")
    plain = df.select("k", F.explode(arr).alias("t"))
    once = explode_once(df, ["k"], arr, "t")
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, plain.collect()))


@given(
    vals=st.lists(
        st.one_of(
            # the magnitude band where ROUND(double, k) diverges by engine
            st.floats(min_value=-1e12, max_value=1e12, allow_nan=False,
                      allow_infinity=False, width=64),
            # adversarial: values manufactured AT 6-dp half boundaries
            st.integers(min_value=-10**15, max_value=10**15).map(
                lambda n: (n + 0.5) / 1e6
            ),
        ),
        min_size=1,
        max_size=25,
    )
)
@SETTINGS
def test_render_fixed_engine_parity(spark, vals):
    """canonical.render_fixed must be bit-identical to its SQL fragment in
    DuckDB for ANY double — including values exactly on rounding-boundary
    half points, the class that broke q27 at sf1 (rule 7)."""
    from pyspark.sql import functions as F

    from olr_cdc_oracle_with_dbz_spark.plans.canonical import (
        render_fixed,
        sql_render_fixed,
    )

    pdf = pd.DataFrame({"i": range(len(vals)), "x": vals}).astype(
        {"i": "int64", "x": "float64"}
    )
    sdf = spark.createDataFrame(pdf, schema="i long, x double")
    got = sdf.select(
        "i",
        render_fixed(F.col("x"), 6).alias("r6"),
        render_fixed(F.col("x"), 4).alias("r4"),
    )
    con = duckdb.connect()
    con.register("t", pdf)
    _compare(
        got,
        con.sql(
            f"SELECT i, {sql_render_fixed('x', 6)} AS r6, "
            f"{sql_render_fixed('x', 4)} AS r4 FROM t"
        ),
    )


@given(
    qty=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),  # group key
            st.integers(min_value=1, max_value=10_500_000),  # price cents
            st.integers(min_value=1, max_value=50),  # quantity
        ),
        min_size=2,
        max_size=40,
    )
)
@SETTINGS
def test_integer_moment_stats_parity(spark, qty):
    """The q27 exact-integer-moment formulation (n·sxx−sx² in the integer
    domain, one correctly-rounded cast to double, identical IEEE trees)
    must agree bit-for-bit across engines on arbitrary integer data —
    including single-member groups (guarded by n>1) and constant columns
    (variance 0)."""
    from pyspark.sql import functions as F

    from olr_cdc_oracle_with_dbz_spark.plans.canonical import (
        render_fixed,
        sql_render_fixed,
    )

    pdf = pd.DataFrame(qty, columns=["g", "xc", "y"]).astype("int64")
    # ensure every group has ≥2 rows (the n−1 denominators)
    pdf = pd.concat([pdf, pdf.assign(y=pdf["y"] + 1)], ignore_index=True)
    sdf = spark.createDataFrame(pdf, schema="g long, xc long, y long")
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    m = sdf.groupBy("g").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("xc").alias("sx"),
        F.sum((F.col("xc") * F.col("xc")).cast("decimal(38,0)")).alias("sxx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("xc") * F.col("y")).alias("sxy"),
    )
    n = F.col("n")
    nx = (dec(n) * F.col("sxx") - dec(F.col("sx")) * dec(F.col("sx"))).cast("double")
    nc = (dec(n) * dec(F.col("sxy")) - dec(F.col("sx")) * dec(F.col("sy"))).cast(
        "double"
    )
    den = n.cast("double") * (n - 1).cast("double")
    got = m.select(
        "g",
        render_fixed(nx / den / 10000.0, 4).alias("var_x"),
        render_fixed(nc / den / 100.0, 6).alias("cov_xy"),
    )
    con = duckdb.connect()
    con.register("t", pdf)
    _compare(
        got,
        con.sql(
            f"""
            WITH m AS (
              SELECT g, COUNT(*) AS n, SUM(xc) AS sx, SUM(xc*xc) AS sxx,
                     SUM(y) AS sy, SUM(y*y) AS syy, SUM(xc*y) AS sxy
              FROM t GROUP BY g),
            d AS (
              SELECT g, CAST(n*sxx - sx*sx AS DOUBLE) AS nx,
                     CAST(n*sxy - sx*sy AS DOUBLE) AS nc,
                     CAST(n AS DOUBLE)*CAST(n-1 AS DOUBLE) AS den
              FROM m)
            SELECT g, {sql_render_fixed('nx / den / 10000.0', 4)} AS var_x,
                   {sql_render_fixed('nc / den / 100.0', 6)} AS cov_xy
            FROM d
            """
        ),
    )


@given(
    docs=st.lists(
        st.lists(st.text(alphabet="abcdefg ", min_size=0, max_size=12), min_size=0, max_size=40),
        min_size=1,
        max_size=12,
    )
)
@SETTINGS
def test_fingerprint_closed_form_equals_rolling_fold(spark, tmp_path_factory, docs):
    """l7's vectorized closed-form kernel must equal the definitional
    rolling fold acc<-(acc*31+h) mod P for any token stream — including
    empty docs, empty tokens, and repeated tokens. Drives the REAL
    registered query over a planted documents table."""
    import hashlib

    from olr_cdc_oracle_with_dbz_spark.registry import load_all

    P = 1_000_000_007

    def h16(tok: str) -> int:
        return int(hashlib.md5(tok.encode()).hexdigest()[:15], 16) % 65536

    def rolling(doc: str) -> int:
        acc = 7
        for t in doc.lower().split(" "):
            acc = (acc * 31 + h16(t)) % P
        return acc

    texts = [" ".join(toks) for toks in docs]
    sf = tmp_path_factory.mktemp("fpdocs")
    pd.DataFrame({"doc_id": range(len(texts)), "text": texts}).to_parquet(
        str(sf / "documents.parquet")
    )
    got = (
        load_all()["l7_fingerprint"]
        .spark_fn(spark, str(sf))
        .toPandas()
        .sort_values("doc_id")["fingerprint"]
        .tolist()
    )
    assert got == [rolling(t) for t in texts]


@given(st.lists(st.binary(min_size=0, max_size=400), min_size=1, max_size=30))
@settings(max_examples=60, deadline=None)
def test_decode_fake_batch_equals_per_row(payloads):
    """m2's vectorized fake-codec twin must be bit-identical to the
    per-item decoder on arbitrary payloads (empty, short, 256-boundary,
    oversize)."""
    import numpy as np

    from olr_cdc_oracle_with_dbz_spark.llmops.multimodal import (
        _decode_fake_batch,
        decode_fake,
    )

    batch = _decode_fake_batch(payloads, None)
    for p, got in zip(payloads, batch):
        assert np.array_equal(decode_fake(p, "x"), got), p


@given(
    data=st.data(),
    events=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5),  # key (heavy dupes)
            st.sampled_from(["c", "u", "d"]),
            st.one_of(st.none(), st.sampled_from(["a", "b", "xyz"])),
        ),
        min_size=1,
        max_size=24,
    ),
)
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
    derandomize=True,
)
def test_spool_split_converges_to_single_merge(spark, tmp_path_factory, data, events):
    """PROPERTY: for ANY event sequence, ANY micro-batch split, and ANY
    spool threshold, spool-coalesced merging + tail flush converges to the
    same table state as one single-batch MERGE — the spool must be purely
    a batching optimization, never a semantics change."""
    from olr_cdc_oracle_with_dbz_spark.streaming.materialize import (
        ParquetUpsertTable,
    )

    # unique ascending _scn makes latest-wins deterministic per key
    rows = [
        (k, name, 100 + i, op, op == "d")
        for i, (k, op, name) in enumerate(events)
    ]

    def frame(rs):
        return spark.createDataFrame(
            rs, "id bigint, name string, _scn bigint, op string, __deleted boolean"
        )

    def state(table):
        df = table.read()
        if df is None:
            return []
        return sorted((r["id"], r["name"], r["_scn"]) for r in df.collect())

    root = tmp_path_factory.mktemp("spool_prop")

    # golden: everything as ONE merge
    golden_t = ParquetUpsertTable(spark, str(root / "golden"), key="id", n_buckets=4)
    golden_t.merge_batch(frame(rows), batch_id=1)
    golden = state(golden_t)

    # random split into 1..4 contiguous micro-batches + random threshold
    n_batches = data.draw(st.integers(min_value=1, max_value=4))
    cuts = sorted(
        data.draw(
            st.lists(
                st.integers(min_value=0, max_value=len(rows)),
                min_size=n_batches - 1,
                max_size=n_batches - 1,
            )
        )
    )
    bounds = [0, *cuts, len(rows)]
    batches = [rows[a:b] for a, b in zip(bounds, bounds[1:])]
    threshold = data.draw(st.integers(min_value=1, max_value=len(rows) + 5))

    spooled_t = ParquetUpsertTable(spark, str(root / "spooled"), key="id", n_buckets=4)
    for i, b in enumerate(batches, start=1):
        spooled_t.spool_batch(frame(b), i)
        if spooled_t.spool_events() >= threshold:
            spooled_t.flush_spool(i)
    spooled_t.flush_spool()
    assert state(spooled_t) == golden


# ---------------------------------------------------------------------------
# fround vs F.round bit-identity on adversarial shortest-repr midpoints
# (r19 verdict item 5: the fast path rounds the binary product while Round
# rounds the shortest-decimal repr — the detect-and-fallback band in
# plans/canonical.py must make them identical for EVERY double, not just
# the generated data)
# ---------------------------------------------------------------------------

def _fround_adversarial_values() -> list[float]:
    """Doubles engineered to sit at/near decimal rounding boundaries."""
    import math

    vals: list[float] = []
    # classic shortest-repr midpoints: k.d…5 at the rounded-away digit
    for k in (0, 1, 2, 7, 123, 99999, 10**9, 10**12):
        for frac in ("5", "05", "15", "25", "35", "45", "55", "65", "75",
                     "85", "95", "005", "675", "015", "0000005", "4999995"):
            x = float(f"{k}.{frac}")
            vals += [x, -x]
            # one-ulp perturbations straddle the band edge
            vals += [math.nextafter(x, math.inf), math.nextafter(x, -math.inf)]
    # magnitudes where ulp(|x|·10^s) approaches the 0.5 grid
    for e in (40, 44, 48, 50, 51, 52, 53, 60):
        base = float(2**e)
        for off in (0.0, 0.5, 0.25, 1.0 / 3.0):
            vals += [base + off, -(base + off), (base + off) / 1e6]
    vals += [0.0, -0.0, 0.5, -0.5, 1e-300, -1e-300, 5e-7, 4.999999e-7,
             -5e-7, -4.999999999999999e-7, 4.999999999999999e-7,
             float("inf"), float("-inf"), float("nan")]
    return vals


@given(
    st.lists(
        st.floats(allow_nan=True, allow_infinity=True, width=64),
        min_size=0,
        max_size=40,
    )
)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
    derandomize=True,
)
def test_fround_bit_identical_to_round(spark, extra):
    """PROPERTY: fround(x, s) must be BIT-identical to F.round(x, s) for
    every double, including shortest-repr decimal midpoints (2.675 @ scale
    2), their ulp neighbors, huge magnitudes past 2^52, ±0, ±inf and NaN."""
    import math
    import struct

    from pyspark.sql import functions as F

    from olr_cdc_oracle_with_dbz_spark.plans.canonical import fround

    vals = _fround_adversarial_values() + [float(v) for v in extra]
    pdf = pd.DataFrame({"x": pd.array(vals, dtype="float64")})
    df = spark.createDataFrame(pdf, schema="x double")
    scales = (0, 1, 2, 6)
    cols = []
    for s in scales:
        cols += [fround("x", s).alias(f"f{s}"), F.round("x", s).alias(f"r{s}")]
    out = df.select(F.col("x"), *cols).toPandas()

    def bits(v) -> bytes:
        if v is None:
            return b"null"
        if isinstance(v, float) and math.isnan(v):
            return b"nan"
        return struct.pack("<d", v)

    for _, row in out.iterrows():
        for s in scales:
            assert bits(row[f"f{s}"]) == bits(row[f"r{s}"]), (
                f"fround({row['x']!r}, {s}) = {row[f'f{s}']!r} "
                f"!= F.round = {row[f'r{s}']!r}"
            )


@given(
    st.lists(
        st.floats(allow_nan=False, allow_infinity=False, width=64,
                  min_value=-2.0, max_value=2.0),
        min_size=0,
        max_size=60,
    )
)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
    derandomize=True,
)
def test_np_fround6_matches_f_round(spark, extra):
    """PROPERTY: the numpy fround twin used by the fused similarity
    kernels must emit bit-identical doubles to F.round(x, 6) — including
    the shortest-repr midpoint band where half-away on the binary product
    diverges from BigDecimal HALF_UP (cosines live in [-1, 1], but the
    pin sweeps the general adversarial set too)."""
    import math
    import struct

    import numpy as np
    from pyspark.sql import functions as F

    from olr_cdc_oracle_with_dbz_spark.llmops.similarity import _np_fround6

    assert "<locals>" in _np_fround6.__qualname__  # pickles by value
    vals = [v for v in _fround_adversarial_values() if not math.isinf(v)]
    vals += [float(v) for v in extra]
    ref = [
        r[0]
        for r in spark.createDataFrame([(v,) for v in vals], "x double")
        .select(F.round("x", 6))
        .collect()
    ]
    mine = _np_fround6(np.array(vals, dtype=np.float64))

    def bits(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return b"nan/null"
        return struct.pack("<d", float(v))

    for v, a, b in zip(vals, ref, mine):
        assert bits(a) == bits(b), f"np_fround6({v!r}) = {b!r} != F.round {a!r}"

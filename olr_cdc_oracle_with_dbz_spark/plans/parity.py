"""Differential harness: run a QuerySpec in Spark AND DuckDB and compare.

This is the in-repo replica of the driver's t2 correctness gate (row count +
column names + order-insensitive values), used by the test suite so every
registered query is verified locally before the driver ever sees it. The
comparison is STRICT — exact values after canonical normalization — so passing
here implies passing any looser tolerance the driver applies.

Round-2 postmortem (why this file grew teeth): two queries were green here
and red at the driver twice in a row. The driver hashes a *rendered*
canonical form, so value typing matters: an int64 ``2932`` and a float64
``2932.0`` hash differently even though ``==`` says equal. Both round-2 reds
were exactly this (q42: Spark floor/ceil BIGINT vs DuckDB DOUBLE, signum
DOUBLE vs TINYINT; q49: DuckDB ``SUM(BIGINT)`` → HUGEINT → float). The gate
therefore now fails on render-kind mismatches (:func:`type_kinds`) in
addition to exact-value mismatches, making it strictly stronger than the
driver's hash on both axes: typing (kind equality ⊇ render equality for
matched values) and values (bitwise equality ⊇ round-6 render equality).
Known DuckDB traps the kind check catches: SUM over any integer column
(HUGEINT), FLOOR/CEIL (DOUBLE), sign (TINYINT), exact COUNT vs SUM typing.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from olr_cdc_oracle_with_dbz_spark.catalog import TABLES


def duckdb_connect(sf_dir: str):
    """DuckDB connection with the testdata tables registered as views."""
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def decimal_columns(df: pd.DataFrame) -> set:
    """Column names whose first non-null value is a ``decimal.Decimal``.

    The driver's comparator hashes raw fetched values, so a Spark-side
    ``Decimal("900.00")`` and a DuckDB float64 ``900.0`` hash differently even
    though they are numerically equal. ``compare_frames`` therefore treats
    Decimal-on-one-side-only as a mismatch instead of silently normalizing —
    checked queries must render decimals (cast to DOUBLE or VARCHAR) on both
    sides, matching the reference's decimal-as-string wire contract
    (/root/reference/README.md:823).
    """
    import decimal

    out = set()
    for c in df.columns:
        s = df[c]
        if s.dtype == object:
            nn = s.dropna()
            if len(nn) and isinstance(nn.iloc[0], decimal.Decimal):
                out.add(c)
    return out


def type_kinds(df: pd.DataFrame) -> dict:
    """Render-kind per column: the driver hashes a *rendered* canonical form,
    so an int64 ``2932`` and a float64 ``2932.0`` hash differently even though
    they compare numerically equal. (Proven by the round-2 driver reds:
    q42 flr/cl were Spark BIGINT vs DuckDB DOUBLE, q49 segment_orders was
    Spark BIGINT vs DuckDB SUM(BIGINT)→HUGEINT→float64 — all values bitwise
    identical, hashes red.) Kinds: int / float / bool / str / datetime /
    bytes / list. DATE and TIMESTAMP share the ``datetime`` kind (q41 mixes
    them and is driver-green)."""
    import datetime
    import decimal

    out = {}
    for c in df.columns:
        s = df[c]
        if isinstance(s.dtype, pd.DatetimeTZDtype) or np.issubdtype(s.dtype, np.datetime64):
            out[c] = "datetime"
        elif s.dtype == bool:
            out[c] = "bool"
        elif np.issubdtype(s.dtype, np.integer):
            out[c] = "int"
        elif np.issubdtype(s.dtype, np.floating):
            out[c] = "float"
        else:
            nn = s.dropna()
            if not len(nn):
                out[c] = "empty"
                continue
            v0 = nn.iloc[0]
            if isinstance(v0, decimal.Decimal):
                out[c] = "decimal"
            elif isinstance(v0, bool):
                out[c] = "bool"
            elif isinstance(v0, int):
                out[c] = "int"
            elif isinstance(v0, float):
                out[c] = "float"
            elif isinstance(v0, datetime.date):  # date or datetime
                out[c] = "datetime"
            elif isinstance(v0, (bytes, bytearray)):
                out[c] = "bytes"
            elif isinstance(v0, (list, tuple, np.ndarray)):
                out[c] = "list"
            else:
                out[c] = "str"
    return out


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Canonical pandas form: columns sorted by name, rows sorted, dtypes unified."""
    df = df.reindex(sorted(df.columns), axis=1).copy()
    for c in df.columns:
        s = df[c]
        if isinstance(s.dtype, pd.DatetimeTZDtype):
            s = s.dt.tz_convert("UTC").dt.tz_localize(None)
        if np.issubdtype(s.dtype, np.datetime64):
            s = s.astype("datetime64[us]")
        elif s.dtype == object:
            first = s.dropna()
            if len(first):
                import datetime
                import decimal

                v0 = first.iloc[0]
                if isinstance(v0, decimal.Decimal):
                    s = s.astype("float64")
                elif isinstance(v0, datetime.date) and not isinstance(v0, datetime.datetime):
                    s = pd.to_datetime(s).astype("datetime64[us]")
                elif isinstance(v0, (list, tuple, np.ndarray)):
                    s = s.map(lambda v: None if v is None else str(list(v)))
                elif not isinstance(v0, str):
                    s = s.map(lambda v: None if v is None else str(v))
        elif np.issubdtype(s.dtype, np.floating):
            s = s.astype("float64")
        elif np.issubdtype(s.dtype, np.integer):
            s = s.astype("int64")
        elif s.dtype == bool:
            s = s.astype("bool")
        df[c] = s
    if len(df):
        df = df.sort_values(list(df.columns), na_position="last").reset_index(drop=True)
    return df


def compare_frames(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> tuple[bool, str]:
    dec_a, dec_b = decimal_columns(spark_pdf), decimal_columns(oracle_pdf)
    if dec_a != dec_b:
        return False, (
            f"decimal-typed columns differ (driver would hash-mismatch): "
            f"spark={sorted(dec_a)} oracle={sorted(dec_b)}"
        )
    ka, kb = type_kinds(spark_pdf), type_kinds(oracle_pdf)
    kind_diff = {
        c: (ka.get(c), kb.get(c))
        for c in set(ka) | set(kb)
        if ka.get(c) != kb.get(c) and "empty" not in (ka.get(c), kb.get(c))
    }
    if kind_diff:
        return False, (
            f"render-kind mismatch (driver would hash-mismatch): "
            f"{ {c: f'spark={x} oracle={y}' for c, (x, y) in sorted(kind_diff.items())} }"
        )
    a, b = normalize(spark_pdf), normalize(oracle_pdf)
    if list(a.columns) != list(b.columns):
        return False, f"columns differ: spark={list(a.columns)} oracle={list(b.columns)}"
    if len(a) != len(b):
        return False, f"row count differs: spark={len(a)} oracle={len(b)}"
    for c in a.columns:
        av, bv = a[c], b[c]
        if np.issubdtype(av.dtype, np.floating) or np.issubdtype(bv.dtype, np.floating):
            av = av.astype("float64")
            bv = bv.astype("float64")
            both_nan = av.isna() & bv.isna()
            eq = (av == bv) | both_nan
            if not eq.all():
                i = int(np.argmax(~eq.values))
                d = np.nanmax(np.abs(av.values - bv.values))
                return False, (
                    f"col {c!r} differs at row {i}: spark={av.iloc[i]!r} "
                    f"oracle={bv.iloc[i]!r} (max abs diff {d:.3e})"
                )
            # r19 harness-mutation pass: -0.0 == 0.0 under IEEE equality,
            # but the driver hashes a RENDERED form where they differ
            # ("-0.0" vs "0.0") — a green here with mismatched zero signs
            # would be a false green. Require signbit equality on zeros.
            zero = (av == 0.0) & av.notna()
            if zero.any():
                sa = np.signbit(av[zero].values.astype("float64"))
                sb = np.signbit(bv[zero].values.astype("float64"))
                if not (sa == sb).all():
                    i = int(av[zero].index[int(np.argmax(sa != sb))])
                    return False, (
                        f"col {c!r} differs at row {i}: zero signs "
                        f"disagree (spark={av.iloc[i]!r} renders "
                        f"differently than oracle={bv.iloc[i]!r} in the "
                        f"driver's hashed form)"
                    )
        else:
            eq = (av == bv) | (av.isna() & bv.isna())
            if not eq.all():
                i = int(np.argmax(~eq.values))
                return False, (
                    f"col {c!r} differs at row {i}: spark={av.iloc[i]!r} oracle={bv.iloc[i]!r}"
                )
    return True, "ok"


def check_query(
    spark: SparkSession, name: str, sf_dir: str, con=None
) -> tuple[bool, str]:
    """Run one registered query in both engines and compare results."""
    from olr_cdc_oracle_with_dbz_spark.registry import load_all

    spec = load_all()[name]
    sdf: DataFrame = spec.spark_fn(spark, sf_dir)
    spark_pdf = sdf.toPandas()
    if spec.oracle is None:
        return (True, f"rows-only: {len(spark_pdf)} rows") if len(spark_pdf) >= 0 else (False, "no rows")
    own_con = con is None
    if own_con:
        con = duckdb_connect(sf_dir)
    try:
        oracle_pdf = con.execute(spec.oracle).df()
    finally:
        if own_con:
            con.close()
    return compare_frames(spark_pdf, oracle_pdf)

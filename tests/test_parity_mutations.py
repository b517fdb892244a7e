"""Mutation tests for the oracle-comparison harness itself (r19 verdict
order #4): the entire green wall rests on ``plans/parity.compare_frames``
— a too-lenient rule there turns real engine mismatches into false
greens. Each test perturbs a KNOWN-GOOD result in one specific way and
asserts the comparator REDDENS; controls pin the invariances that are
deliberate (row order, sub-microsecond timestamp truncation, equal-value
dtype-width differences) so a future "fix" can't silently widen or
narrow the contract in either direction.

Perturbation classes (the r18 verdict's adversarial list, extended):
cross-row value swaps, 7th-decimal flips, drop-and-duplicate at equal
row count, NULL-vs-empty-string, negative zero, cross-column value
swaps, int-vs-float render kinds, one-sided Decimal, list reorder,
boolean flips, microsecond-level timestamp shifts, NaN-vs-value.
"""

from __future__ import annotations

import datetime
import decimal

import numpy as np
import pandas as pd
import pytest

from olr_cdc_oracle_with_dbz_spark.plans.parity import compare_frames


def base() -> pd.DataFrame:
    """A known-good result frame exercising every render kind the checked
    queries emit: int, float, str (with NULLs), datetime, bool, list."""
    return pd.DataFrame(
        {
            "grp": ["a", "b", "c", None],
            "cnt": np.array([3, 1, 4, 1], dtype="int64"),
            "amt": np.array([1.25, -2.5, 0.0, 3.75], dtype="float64"),
            "ok": np.array([True, False, True, False], dtype=bool),
            "ts": pd.to_datetime(
                [
                    "2024-01-01 00:00:00.000001",
                    "2024-01-02 00:00:00.000000",
                    "2024-01-03 00:00:00.000000",
                    "2024-01-04 00:00:00.000000",
                ]
            ),
            "tags": pd.Series([[1, 2], [3], [], None], dtype=object),
        }
    )


def assert_red(mutant: pd.DataFrame, why: str) -> str:
    ok, msg = compare_frames(base(), mutant)
    assert not ok, f"comparator stayed GREEN on {why}: {msg}"
    ok2, msg2 = compare_frames(mutant, base())  # and symmetrically
    assert not ok2, f"comparator stayed GREEN (swapped sides) on {why}: {msg2}"
    return msg


def test_identity_and_row_order_invariance_controls():
    """Controls: identical frames pass, and ROW ORDER is deliberately
    insensitive (the driver sorts before hashing) — a mutation fix that
    reddened permutations would flag every unordered GROUP BY."""
    ok, msg = compare_frames(base(), base())
    assert ok, msg
    perm = base().iloc[[3, 0, 2, 1]].reset_index(drop=True)
    ok, msg = compare_frames(base(), perm)
    assert ok, msg
    # dtype WIDTH (int32 vs int64) is also a non-difference: the rendered
    # integer is identical
    narrowed = base()
    narrowed["cnt"] = narrowed["cnt"].astype("int32")
    ok, msg = compare_frames(base(), narrowed)
    assert ok, msg


def test_cross_row_value_swap_reddens():
    """Swapping one column's values between two rows preserves every
    per-column multiset — only the row-tuple association detects it."""
    m = base()
    m.loc[0, "cnt"], m.loc[2, "cnt"] = m.loc[2, "cnt"], m.loc[0, "cnt"]
    assert_red(m, "cross-row value swap")


def test_seventh_decimal_flip_reddens():
    """The float compare is exact (bitwise-equal doubles), so a 1e-7
    perturbation — below any print rounding — must redden. (Real engine
    divergence below the 6-dp grid is absorbed INSIDE the queries by the
    canonical.py fixed-point renders, never by comparator tolerance.)"""
    m = base()
    m.loc[1, "amt"] = m.loc[1, "amt"] + 1e-7
    msg = assert_red(m, "7th-decimal flip")
    assert "amt" in msg


def test_sign_flip_at_zero_reddens():
    """-0.0 == 0.0 under IEEE equality but renders differently in the
    driver's hashed form — the r19 tightening this suite motivated."""
    m = base()
    m.loc[2, "amt"] = -0.0
    msg = assert_red(m, "negative zero")
    assert "zero signs" in msg or "amt" in msg


def test_drop_and_duplicate_row_reddens():
    """Equal row COUNT with one row dropped and another duplicated —
    defeats any count-only or per-column-sorted compare."""
    m = base().iloc[[0, 0, 2, 3]].reset_index(drop=True)
    assert_red(m, "drop-and-duplicate at equal row count")


def test_null_vs_empty_string_reddens():
    m = base()
    m.loc[3, "grp"] = ""
    assert_red(m, "NULL vs empty string")


def test_nan_vs_value_reddens():
    m = base()
    m.loc[0, "amt"] = np.nan
    assert_red(m, "NaN vs value")


def test_cross_column_value_swap_reddens():
    """Two same-kind columns exchanging values row-wise: column-name
    sorting must not blend them."""
    m = base()
    m["cnt2"] = np.array([7, 8, 9, 10], dtype="int64")
    b = base()
    b["cnt2"] = np.array([7, 8, 9, 10], dtype="int64")
    swapped = b.copy()
    swapped["cnt"], swapped["cnt2"] = b["cnt2"], b["cnt"]
    ok, _ = compare_frames(b, swapped)
    assert not ok, "comparator stayed GREEN on cross-column swap"


def test_int_vs_float_render_kind_reddens():
    """2932 vs 2932.0: numerically equal, hash-different (the round-2
    driver reds that grew this harness its teeth)."""
    m = base()
    m["cnt"] = m["cnt"].astype("float64")
    msg = assert_red(m, "int-vs-float render kind")
    assert "kind" in msg


def test_one_sided_decimal_reddens():
    m = base()
    m["amt"] = m["amt"].map(lambda v: decimal.Decimal(str(v)))
    ok, msg = compare_frames(base(), m)
    assert not ok and "decimal" in msg.lower()


def test_boolean_flip_and_bool_vs_int_redden():
    m = base()
    m.loc[1, "ok"] = True
    assert_red(m, "boolean flip")
    k = base()
    k["ok"] = k["ok"].astype("int64")  # renders 1/0, hashes differently
    msg = assert_red(k, "bool-vs-int kind")
    assert "kind" in msg


def test_list_reorder_and_list_vs_str_redden():
    m = base()
    m.at[0, "tags"] = [2, 1]  # same multiset, different order: a real
    assert_red(m, "list element reorder")  # array result is ordered
    s = base()
    s["tags"] = s["tags"].map(lambda v: None if v is None else str(list(v)))
    msg = assert_red(s, "list-vs-str kind")
    assert "kind" in msg


def test_microsecond_timestamp_shift_reddens_sub_us_truncates():
    """A 1 µs shift must redden; a sub-µs (ns) component is DELIBERATELY
    truncated — Spark's timestamp domain is µs, DuckDB reads parquet ns,
    and the contract (TESTDATA.md / canonical.py) casts oracles to µs.
    Pinning both directions keeps the truncation from silently widening."""
    m = base()
    m.loc[0, "ts"] = m.loc[0, "ts"] + pd.Timedelta(microseconds=1)
    assert_red(m, "1-microsecond timestamp shift")
    ns = base()
    ns["ts"] = ns["ts"].astype("datetime64[ns]") + pd.Timedelta(nanoseconds=500)
    ok, msg = compare_frames(base(), ns)
    assert ok, f"sub-µs truncation contract changed: {msg}"


def test_column_rename_and_extra_column_redden():
    m = base().rename(columns={"cnt": "count"})
    assert_red(m, "column rename")
    e = base()
    e["extra"] = 1
    assert_red(e, "extra column")


def test_row_count_mismatch_reddens():
    assert_red(base().iloc[:3].reset_index(drop=True), "dropped row")


def test_real_query_result_mutations_redden(spark):
    """Ground the synthetic classes against a real checked query: perturb
    the actual DuckDB oracle result of q22 (TPC-H Q1) and assert each
    perturbation reddens against the live Spark result."""
    from olr_cdc_oracle_with_dbz_spark.plans.parity import (
        check_query,
        duckdb_connect,
    )
    from olr_cdc_oracle_with_dbz_spark.registry import load_all

    sf = "/root/testdata/sf0.001"
    spec = load_all()["q22_hash_agg_tpch_q1"]
    spark_pdf = spec.spark_fn(spark, sf).toPandas()
    con = duckdb_connect(sf)
    try:
        oracle_pdf = con.execute(spec.oracle).df()
    finally:
        con.close()
    ok, msg = compare_frames(spark_pdf, oracle_pdf)
    assert ok, f"q22 baseline not green at {sf}: {msg}"

    float_cols = [
        c for c in oracle_pdf.columns
        if np.issubdtype(oracle_pdf[c].dtype, np.floating)
    ]
    assert float_cols, "q22 oracle has no float column to perturb"
    fc = float_cols[0]

    # 7th-decimal flip on one aggregated value
    m = oracle_pdf.copy()
    m.loc[0, fc] = m.loc[0, fc] + 1e-7
    ok, _ = compare_frames(spark_pdf, m)
    assert not ok

    # cross-row swap within one column
    if len(oracle_pdf) >= 2:
        m = oracle_pdf.copy()
        m.loc[0, fc], m.loc[1, fc] = m.loc[1, fc], m.loc[0, fc]
        ok, _ = compare_frames(spark_pdf, m)
        assert not ok

        # drop one group and duplicate another (row count preserved)
        m = pd.concat(
            [oracle_pdf.iloc[[0]], oracle_pdf.iloc[: len(oracle_pdf) - 1]]
        ).reset_index(drop=True)
        ok, _ = compare_frames(spark_pdf, m)
        assert not ok

    # and the registered harness entry itself still passes end-to-end
    ok, msg = check_query(spark, "q22_hash_agg_tpch_q1", sf)
    assert ok, msg

#!/usr/bin/env python
"""Decompose q22's flat ~1 s constant at sf3 (r9 verdict item 1).

The flagship TPC-H-Q1 aggregate runs ~9× DuckDB at sf3 while SCALING
fine (2× time for 3× data) — a flat constant, not a widening pathology.
The same constant shows in q20b/q24/q26/q30 (every lineitem-scan
aggregate). This probe splits it into named stages, each a noop-write
median of 3 warm runs in one session (sf_trend method):

  scan_cols     bare scan of the 7 referenced columns
  scan_filter   + the shipdate predicate
  group_count   + groupBy(returnflag, linestatus).count()  [hash, no sums]
  plain_double  + the 7 aggregates as PLAIN double sums (nondeterministic
                — probe only, never a checked form)
  micros        the shipped q22 form (micro-unit long sums, sum6/avg6)
  dec18         sums as single-cast decimal(18,6) accumulation
  dec38         sums as decimal(38,12) accumulation (the r2-era dsum form)

DuckDB clean-subprocess reference for the full query rides along. Prints
one JSON line; paste the figures into SCALE.md.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

COLS = [
    "l_returnflag",
    "l_linestatus",
    "l_quantity",
    "l_extendedprice",
    "l_discount",
    "l_tax",
    "l_shipdate",
]


def variants(li):
    from olr_cdc_oracle_with_dbz_spark.plans.canonical import avg6, sum6

    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc * (1 + F.col("l_tax"))
    filt = li.filter(
        F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp")
    )
    grp = filt.groupBy("l_returnflag", "l_linestatus")

    def agg_with(mk_sum, mk_avg):
        return grp.agg(
            mk_sum("l_quantity").alias("sum_qty"),
            mk_sum("l_extendedprice").alias("sum_base_price"),
            mk_sum(disc).alias("sum_disc_price"),
            mk_sum(charge).alias("sum_charge"),
            mk_avg("l_quantity").alias("avg_qty"),
            mk_avg("l_extendedprice").alias("avg_price"),
            mk_avg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )

    def c(x):
        return F.col(x) if isinstance(x, str) else x

    def dsum(t):
        return lambda x: F.sum(c(x).cast(t))

    def davg(t):
        return lambda x: F.avg(c(x).cast(t))

    # candidate replacement encoding: half-away-from-zero via pure codegen
    # arithmetic (floor(|x|·1e6 + 0.5)·sign) instead of Round's per-value
    # BigDecimal.valueOf(...).setScale(...) object churn
    def m_arith(x):
        y = c(x) * 1_000_000
        return (F.floor(F.abs(y) + 0.5) * F.signum(y)).cast("long")

    def sum6a(x):
        return F.round(F.sum(m_arith(x)).cast("double") / 1_000_000, 6)

    def avg6a(x):
        return F.round(
            F.sum(m_arith(x)).cast("double") / 1_000_000 / F.count(c(x)), 6
        )

    # EXACT half-away-from-zero in pure codegen: floor(|y|) is exact, the
    # fractional remainder |y|−floor(|y|) is exact FP subtraction, and the
    # ≥0.5 comparison decides the round-up — no +0.5 addition, so no
    # double-rounding boundary bug; ≡ BigDecimal HALF_UP for |y| < 2^52
    def m_exact(x):
        y = c(x) * 1_000_000
        a = F.abs(y)
        m = F.floor(a)  # LongType
        up = (a - m >= 0.5).cast("long")
        mag = m + up
        return F.when(y < 0, -mag).otherwise(mag)

    def sum6e(x):
        return F.round(F.sum(m_exact(x)).cast("double") / 1_000_000, 6)

    def avg6e(x):
        return F.round(
            F.sum(m_exact(x)).cast("double") / 1_000_000 / F.count(c(x)), 6
        )

    return {
        "scan_cols": li.select(*COLS),
        "scan_filter": filt.select(*COLS),
        "group_count": grp.count(),
        "plain_double": agg_with(lambda x: F.sum(c(x)), lambda x: F.avg(c(x))),
        "micros": agg_with(sum6, avg6),
        "micros_arith": agg_with(sum6a, avg6a),
        "micros_exact": agg_with(sum6e, avg6e),
        "dec18": agg_with(dsum("decimal(18,6)"), davg("decimal(18,6)")),
        "dec38": agg_with(dsum("decimal(38,12)"), davg("decimal(38,12)")),
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfscale/sf3"
    from olr_cdc_oracle_with_dbz_spark.hostcal import apply_calibration
    from olr_cdc_oracle_with_dbz_spark.session import get_spark

    apply_calibration()
    confs = json.loads(os.environ.get("Q22_CONF", "{}"))
    spark = get_spark("q22-probe", **confs)
    spark.sparkContext.setLogLevel("ERROR")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    li.count()  # warm footers/codegen

    out: dict[str, float] = {}
    for name, df in variants(li).items():
        df.write.format("noop").mode("overwrite").save()  # warm
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            ts.append(time.perf_counter() - t0)
        out[name] = round(statistics.median(ts), 4)

    # DuckDB full-query reference, clean subprocess (BASELINE.md rule)
    snip = (
        "import sys,time,statistics;sys.path.insert(0,'/root/repo');"
        "from olr_cdc_oracle_with_dbz_spark.plans.parity import duckdb_connect;"
        "from olr_cdc_oracle_with_dbz_spark.registry import load_all;"
        f"con=duckdb_connect('{sf_dir}');sql=load_all()['q22_hash_agg_tpch_q1'].oracle;"
        "con.execute(sql).arrow();ts=[]\n"
        "for _ in range(3):\n"
        " t0=time.perf_counter();con.execute(sql).arrow();"
        "ts.append(time.perf_counter()-t0)\n"
        "print(round(statistics.median(ts),4))"
    )
    try:
        duck = float(
            subprocess.run(
                [sys.executable, "-c", snip], capture_output=True, text=True, check=True
            ).stdout.strip().splitlines()[-1]  # duckdb progress bars precede it
        )
    except subprocess.CalledProcessError as ex:
        print(ex.stderr, file=sys.stderr)
        duck = -1.0

    from olr_cdc_oracle_with_dbz_spark import hostcal

    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "stages": out,
                "duckdb_full_query_sec": duck,
                "confs": confs,
                "host_calibration": hostcal.LAST or None,
            }
        )
    )


if __name__ == "__main__":
    main()

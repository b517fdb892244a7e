#!/usr/bin/env python
"""Clean-process DuckDB baseline over the exact-class oracle queries.

BASELINE.md method: never time DuckDB inside the bench process (the
resident Spark JVM inflates it ~3x). Run this as its own process:
one cold pass to warm the buffer pool, then median of 3 warm runs per
query. Prints one JSON line compatible with BENCH_r{N}.json's shape.

Usage: python scripts/duckdb_clean_baseline.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    from olr_cdc_oracle_with_dbz_spark.plans.parity import duckdb_connect
    from olr_cdc_oracle_with_dbz_spark.registry import load_all

    registry = load_all()
    con = duckdb_connect(sf_dir)
    out: dict[str, float] = {}
    # bench.py's contention probe runs this script on a 3-canary subset
    keep = (
        set(os.environ["DUCKDB_BASELINE_QUERIES"].split(","))
        if os.environ.get("DUCKDB_BASELINE_QUERIES")
        else None
    )
    for name in sorted(registry):
        spec = registry[name]
        if spec.oracle is None or spec.approx:
            continue
        if keep is not None and name not in keep:
            continue
        con.execute(spec.oracle).fetchall()  # cold/warm-up pass
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            con.execute(spec.oracle).fetchall()
            times.append(time.perf_counter() - t0)
        out[name] = round(statistics.median(times), 4)
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    # a typo'd or approx/oracle-less requested name would otherwise be
    # silently skipped, making a partial timing map look like a fast
    # full canary result
    missing = sorted(keep - out.keys()) if keep is not None else []
    if missing:
        print(
            f"WARN: requested baseline queries produced no timing: {missing}",
            file=sys.stderr,
        )
    payload = {
        "metric": "duckdb_clean_exact_total_sec",
        "value": round(sum(out.values()), 3),
        "unit": "sec",
        "queries": out,
        "sf": sf,
    }
    if missing:
        payload["missing"] = missing
    print(json.dumps(payload))


if __name__ == "__main__":
    main()

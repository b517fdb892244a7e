#!/usr/bin/env python
"""Paired bench/DuckDB interleave — the BASELINE.md ≤2× protocol runner.

Alternates a full `python bench.py` (engine, noop-sink medians) with a
clean-subprocess `scripts/duckdb_clean_baseline.py` (DuckDB warm medians)
N times in one window, then reports the per-round ratio over the COMMON
exact-class query set. The paired ratio is the contention-proof quantity
(SCALE.md r5: absolutes swing ±9% across windows, the paired ratio holds
±4%). Writes INTERLEAVE_r{N}.json when --round N is given.

Usage: python scripts/interleave.py [--rounds 3] [--round 10] [sf_dir]
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run_bench(sf_dir: str) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR=sf_dir,
        BENCH_SKIP_CDC="1",  # CDC throughput is a separate headline; its
        # JVM churn would contaminate the paired query timings
    )
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        check=True,
        cwd=REPO,
    )
    line = json.loads(proc.stdout.strip().splitlines()[-1])
    with open(os.path.join(REPO, "BENCH_DETAILS.json")) as f:
        details = json.load(f)
    return {"line": line, "queries": details["queries"]}


def run_duck(sf_dir: str) -> dict:
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "duckdb_clean_baseline.py"), sf_dir],
        capture_output=True,
        text=True,
        check=True,
        cwd=REPO,
    )
    return json.loads(proc.stdout.strip().splitlines()[-1])


def main() -> None:
    args = sys.argv[1:]
    rounds = 3
    round_no = None
    if "--rounds" in args:
        i = args.index("--rounds")
        rounds = int(args[i + 1])
        del args[i : i + 2]
    if "--round" in args:
        i = args.index("--round")
        round_no = int(args[i + 1])
        del args[i : i + 2]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"

    from olr_cdc_oracle_with_dbz_spark.registry import load_all

    reg = load_all()
    exact = {n for n, s in reg.items() if s.bench and s.oracle and not s.approx}

    out = {
        "protocol": (
            "alternate full `python bench.py` and clean-subprocess "
            "`scripts/duckdb_clean_baseline.py`, N rounds, same window; "
            "ratio = engine/duckdb over the COMMON exact-class set per round"
        ),
        "rounds": [],
    }
    for r in range(1, rounds + 1):
        bench = run_bench(sf_dir)
        duck = run_duck(sf_dir)
        common = [
            n
            for n in exact
            if bench["queries"].get(n, -1) > 0 and duck["queries"].get(n, -1) > 0
        ]
        e = sum(bench["queries"][n] for n in common)
        d = sum(duck["queries"][n] for n in common)
        rec = {
            "round": r,
            "engine_exact_common_sec": round(e, 3),
            "duckdb_exact_common_sec": round(d, 3),
            "ratio": round(e / d, 3),
            "n_common": len(common),
            "engine_exact_total_sec": bench["line"]["value"],
            "engine_construct_total_sec": bench["line"].get("construct_total_sec"),
            "duckdb_all_sec": duck["value"],
            "host_calibration": bench["line"].get("host_calibration"),
            "duckdb_probe_sec": bench["line"].get("duckdb_probe_sec"),
        }
        out["rounds"].append(rec)
        print(json.dumps(rec), file=sys.stderr)
    out["median_ratio"] = round(
        statistics.median(r["ratio"] for r in out["rounds"]), 3
    )
    if round_no is not None:
        out["round"] = round_no
        path = os.path.join(REPO, f"INTERLEAVE_r{round_no:02d}.json")
        with open(path, "w") as f:
            json.dump(out, f, indent=1)
        print(f"wrote {path}", file=sys.stderr)
    print(json.dumps({"median_ratio": out["median_ratio"],
                      "ratios": [r["ratio"] for r in out["rounds"]]}))


if __name__ == "__main__":
    main()

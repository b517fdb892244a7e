#!/usr/bin/env python
"""Decompose the per-query driver floor at bench settings (VERDICT r8 item 1).

For each named query (default: the 12 cheapest from BENCH_DETAILS.json —
the ones whose wall clock IS the floor), run `reps` repetitions exactly the
way bench.py does (noop sink, AQE off, 8 shuffle partitions, layout
mirror) and split the median wall clock into:

  construct  Python-side plan construction (registry fn → DataFrame):
             pure py4j round trips, zero JVM work scheduled
  job_wall   sum of Spark job durations (submission→completion) from the
             UI REST API — JVM scheduling + task execution
  residual   everything else inside the noop save call: SQL analysis /
             optimization / physical planning, py4j invoke latency, and
             the v2 commit protocol — the part neither Python construction
             nor job execution explains

Usage: python scripts/profile_floor.py [--reps N] [name ...]
"""
from __future__ import annotations

import json
import os
import statistics
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def rest_jobs(ui: str) -> dict[int, dict]:
    apps = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications"))
    app_id = apps[0]["id"]
    jobs = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/jobs"))
    return {j["jobId"]: j for j in jobs}


def main() -> None:
    args = sys.argv[1:]
    reps = 5
    if args and args[0] == "--reps":
        reps = int(args[1])
        args = args[2:]

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from olr_cdc_oracle_with_dbz_spark.hostcal import apply_calibration
    from olr_cdc_oracle_with_dbz_spark.registry import load_all
    from olr_cdc_oracle_with_dbz_spark.session import get_spark
    from olr_cdc_oracle_with_dbz_spark.sources.layout import optimize_dir

    apply_calibration()
    spark = get_spark(
        "olr-cdc-floor-profile",
        **{
            "spark.ui.showConsoleProgress": "false",
            "spark.sql.adaptive.enabled": "false",
            "spark.sql.shuffle.partitions": "8",
            "spark.ui.enabled": "true",  # REST API is the job-duration source
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    ui = sc.uiWebUrl
    optimize_dir(sf_dir)
    os.environ["SPARK_GRAFT_LAYOUT_CACHE"] = "1"

    registry = load_all()
    if not args:
        try:
            det = json.load(
                open(os.path.join(os.path.dirname(__file__), "..", "BENCH_DETAILS.json"))
            )
            cheap = sorted(
                (
                    (v, n)
                    for n, v in det["queries"].items()
                    if v > 0 and registry[n].oracle and not registry[n].approx
                ),
            )[:12]
            args = [n for _v, n in cheap]
        except Exception:
            args = ["q01_scan_full", "q14_broadcast_join", "q11_case_when"]

    # warm-up identical to bench.py
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    from olr_cdc_oracle_with_dbz_spark.catalog import TABLES, Catalog

    cat = Catalog(spark, sf_dir)
    for t in TABLES:
        cat.table(t)
    import warnings

    from pyspark.sql.functions import pandas_udf

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        _warm = pandas_udf(lambda s: s, "long")
    spark.range(64).select(_warm("id")).write.format("noop").mode("overwrite").save()

    tracker = sc.statusTracker()
    out = []
    for name in args:
        cons, tot, jwall, njobs = [], [], [], []
        for _ in range(reps):
            sc.setJobGroup(name, name, interruptOnCancel=False)
            t0 = time.perf_counter()
            df = registry[name].spark_fn(spark, sf_dir)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            sc.setJobGroup(None, None)
            cons.append(t1 - t0)
            tot.append(t2 - t0)
        # one REST read at the end of the reps: sum durations of this
        # group's jobs and divide by reps (all reps share the group name)
        job_ids = tracker.getJobIdsForGroup(name)
        jobs = rest_jobs(ui)
        import datetime

        def dur(j) -> float:
            fmt = "%Y-%m-%dT%H:%M:%S.%fGMT"
            try:
                s = datetime.datetime.strptime(j["submissionTime"], fmt)
                e = datetime.datetime.strptime(j["completionTime"], fmt)
                return (e - s).total_seconds()
            except Exception:
                return 0.0

        wall = sum(dur(jobs[i]) for i in job_ids if i in jobs)
        c = statistics.median(cons)
        t = statistics.median(tot)
        jw = wall / reps
        out.append(
            {
                "name": name,
                "total": round(t, 4),
                "construct": round(c, 4),
                "job_wall": round(jw, 4),
                "residual": round(t - c - jw, 4),
                "jobs_per_run": len(job_ids) / reps,
            }
        )
        print(
            f"{name:32s} total={t:6.3f} construct={c:6.3f} "
            f"job_wall={jw:6.3f} residual={t - c - jw:6.3f} "
            f"jobs/run={len(job_ids) / reps:.1f}"
        )
    agg = {
        k: round(sum(r[k] for r in out), 3)
        for k in ("total", "construct", "job_wall", "residual")
    }
    agg["n"] = len(out)
    print(json.dumps(agg))


if __name__ == "__main__":
    main()

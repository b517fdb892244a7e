#!/usr/bin/env python
"""Per-query Spark JOB/STAGE count profile at bench settings.

The sf0.1 gap to DuckDB is a fixed ~0.25-0.3 s/query scheduling floor
(VERDICT r7); the floor scales with the number of jobs and stages a query
schedules, not its data volume. This script runs each bench query exactly
the way bench.py does (noop sink, AQE off, 8 shuffle partitions, layout
mirror) inside a named job group and reports jobs/stages/tasks per query,
sorted by job count — the queries scheduling >1 job are the remaining
floor candidates.

Usage: python scripts/profile_jobs.py [name ...]   (default: all bench)
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from olr_cdc_oracle_with_dbz_spark.hostcal import apply_calibration
    from olr_cdc_oracle_with_dbz_spark.registry import load_all
    from olr_cdc_oracle_with_dbz_spark.session import get_spark
    from olr_cdc_oracle_with_dbz_spark.sources.layout import optimize_dir

    apply_calibration()
    spark = get_spark(
        "olr-cdc-profile",
        **{
            "spark.ui.showConsoleProgress": "false",
            "spark.sql.adaptive.enabled": "false",
            "spark.sql.shuffle.partitions": "8",
            "spark.ui.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    optimize_dir(sf_dir)
    os.environ["SPARK_GRAFT_LAYOUT_CACHE"] = "1"

    registry = load_all()
    names = sys.argv[1:] or [n for n, s in sorted(registry.items()) if s.bench]

    # warm-up identical to bench.py (incl. catalog pre-touch so per-table
    # schema-inference jobs don't attribute to whichever query reads first)
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
    rows = []
    for name in names:
        sc.setJobGroup(name, name, interruptOnCancel=False)
        t0 = time.perf_counter()
        df = registry[name].spark_fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        el = time.perf_counter() - t0
        sc.setJobGroup(None, None)
        job_ids = tracker.getJobIdsForGroup(name)
        stages = tasks = 0
        for jid in job_ids:
            info = tracker.getJobInfo(jid)
            if info is None:
                continue
            for sid in info.stageIds:
                sinfo = tracker.getStageInfo(sid)
                if sinfo is not None:
                    stages += 1
                    tasks += sinfo.numTasks
        rows.append(
            {
                "name": name,
                "sec": round(el, 3),
                "jobs": len(job_ids),
                "stages": stages,
                "tasks": tasks,
            }
        )
    rows.sort(key=lambda r: (-r["jobs"], -r["stages"], -r["sec"]))
    for r in rows:
        print(
            f"{r['name']:34s} jobs={r['jobs']:3d} stages={r['stages']:3d} "
            f"tasks={r['tasks']:4d} sec={r['sec']:.3f}"
        )
    total_jobs = sum(r["jobs"] for r in rows)
    print(
        json.dumps(
            {
                "n_queries": len(rows),
                "total_jobs": total_jobs,
                "total_stages": sum(r["stages"] for r in rows),
                "total_sec": round(sum(r["sec"] for r in rows), 2),
                "multi_job": sum(1 for r in rows if r["jobs"] > 1),
            }
        )
    )


if __name__ == "__main__":
    main()

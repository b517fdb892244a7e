#!/usr/bin/env python
"""Machine-readable CDC steady-state merge probe (r7 verdict item 7).

Generates the synthetic Debezium envelope corpus for SPARK_GRAFT_SF_DIR
(default: the /tmp/sfscale/sf1 replica — ~2.15M events), seeds a
ParquetUpsertTable with the INSERT events (untimed — that's bulk load),
then times merging the update/delete tail into that populated state: the
read-back of touched buckets + compact over base ∪ batch that every
production micro-batch pays. Also reports the empty-table bulk merge as
the labeled upper bound. Prints ONE JSON line; commit it as
CDC_STEADY_r{N}.json.

Method notes:
- best-of-2 per phase (JVM codegen warmup on run 1, same policy as
  bench.py's CDC section);
- state reset between runs by copytree from the seed (untimed);
- all timings wall-clock around merge_batch only.
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/tmp/sfscale/sf1")
    from pyspark.sql import functions as F

    from olr_cdc_oracle_with_dbz_spark.cdc.envelope import (
        parse_envelope,
        source_filter,
        unwrap,
    )
    from olr_cdc_oracle_with_dbz_spark.cdc.genload import generate_envelope_lines
    from olr_cdc_oracle_with_dbz_spark.hostcal import apply_calibration
    from olr_cdc_oracle_with_dbz_spark.session import get_spark
    from olr_cdc_oracle_with_dbz_spark.streaming.materialize import ParquetUpsertTable

    apply_calibration()
    spark = get_spark(
        "cdc-steady-probe",
        **{
            "spark.ui.showConsoleProgress": "false",
            "spark.sql.adaptive.enabled": "false",
            "spark.sql.shuffle.partitions": "8",
            "spark.ui.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    work = tempfile.mkdtemp(prefix="cdc-steady-")
    out: dict = {"sf_dir": sf_dir}
    try:
        n_events = generate_envelope_lines(spark, sf_dir, f"{work}/in")
        unw = unwrap(
            source_filter(
                parse_envelope(spark.read.text(f"{work}/in"), "value"),
                "OLR_DB",
                "PRODUCT",
            )
        )
        tail = unw.filter(F.col("op") != "c")
        n_tail = tail.count()
        out.update(events_total=n_events, events_tail=n_tail)

        # labeled upper bound: whole corpus -> EMPTY table (bulk load)
        bulk_best = float("inf")
        for _ in range(2):
            shutil.rmtree(f"{work}/bulk", ignore_errors=True)
            t0 = time.perf_counter()
            ParquetUpsertTable(spark, f"{work}/bulk", key="id").merge_batch(unw, 0)
            bulk_best = min(bulk_best, time.perf_counter() - t0)
        out.update(
            bulk_merge_sec=round(bulk_best, 3),
            bulk_merge_events_per_sec=round(n_events / bulk_best, 1),
        )

        # steady state: seed with the inserts (untimed), time the tail
        seed = f"{work}/seed"
        ParquetUpsertTable(spark, seed, key="id").merge_batch(
            unw.filter(F.col("op") == "c"), 0
        )
        steady_best = float("inf")
        for _ in range(2):
            tgt = f"{work}/steady"
            shutil.rmtree(tgt, ignore_errors=True)
            shutil.copytree(seed, tgt)  # reset state, untimed
            t0 = time.perf_counter()
            ParquetUpsertTable(spark, tgt, key="id").merge_batch(tail, 1)
            steady_best = min(steady_best, time.perf_counter() - t0)
        out.update(
            steady_tail_merge_sec=round(steady_best, 3),
            steady_merge_events_per_sec=round(n_tail / steady_best, 1),
            method="seed merge untimed; tail merge timed; best of 2; "
            "bulk figure is the empty-table upper bound",
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

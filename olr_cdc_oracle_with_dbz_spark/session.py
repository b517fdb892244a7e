"""SparkSession factory with engine-wide configuration.

Design notes (100 TB target, tested on local[32]):

* AQE on: runtime re-planning (coalesce shuffle partitions, skew-join
  splitting, dynamic broadcast) is the single biggest lever at scale and is
  free to enable.
* Session timezone pinned UTC: the reference pipeline ships source commit
  timestamps through Avro as UTC instants (/root/reference/README.md:824
  ``time.precision.mode: adaptive``); pinning the session TZ makes timestamp
  rendering deterministic and oracle-comparable.
* Arrow enabled: every pandas interchange (toPandas, pandas UDFs, the
  multimodal mapInPandas operators) rides the vectorized Arrow path.
* ``spark.sql.shuffle.partitions`` defaults to a small local-friendly value;
  AQE coalesces further. On a real cluster this would be set to
  ~2-3x total cores (or left to AQE with a high initial value).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_DEFAULTS: dict[str, str] = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Parquet TIMESTAMP(NANOS) handling differs by Spark version — the
    # engine supports both: Spark 3.4/3.5 rejects NANOS unless this conf
    # reads it as BIGINT nanos; Spark 4.1+ IGNORES this conf and reads
    # TIMESTAMP_NTZ natively. Nothing may assume either dtype — all
    # events.ts consumers go through catalog.normalize_event_ts (or the
    # Catalog's conditional), which handles both.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # ANSI off: engine is permissive like the reference ingest
    # (unknown-type passthrough, /root/reference/scripts/OpenLogReplicator.json:25).
    "spark.sql.ansi.enabled": "false",
    # Broadcast threshold: dims like region/nation/supplier always broadcast.
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    # 16 beats 32 consistently at testdata scale (fewer near-empty reduce
    # tasks; AQE coalesces/splits from here). Cluster value: ~2-3x cores.
    "spark.sql.shuffle.partitions": "16",
    # Scan/shuffle partition sizing. These three are SCALE-DEPENDENT: the
    # values below are sized for the local testdata (MB-scale files on 32
    # cores — without them a 10 MB parquet scans as 1-3 splits and AQE
    # coalesces every shuffle to one partition, serializing the machine).
    # On a 100 TB cluster deployment override via SPARK_GRAFT_CONF_* to the
    # large-file values: maxPartitionBytes=128m, openCostInBytes=4m,
    # advisoryPartitionSizeInBytes=64m.
    "spark.sql.files.maxPartitionBytes": "4194304",
    "spark.sql.files.openCostInBytes": "262144",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "2097152",
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
}


def get_spark(app_name: str = "olr-cdc-spark-engine", **extra_conf: str) -> SparkSession:
    """Build (or fetch) the configured SparkSession.

    ``SPARK_GRAFT_CPUS`` controls local parallelism (default ``*``).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = SparkSession.builder.appName(app_name).master(f"local[{cpus}]")
    env_conf: dict[str, str] = {}
    if os.environ.get("SPARK_GRAFT_CONF"):  # JSON map of conf overrides
        import json

        env_conf = json.loads(os.environ["SPARK_GRAFT_CONF"])
    for k, v in {**_DEFAULTS, **extra_conf, **env_conf}.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    # If we attached to a pre-existing session (driver-owned), still pin the
    # confs that are runtime-settable and correctness-critical. Explicit
    # caller/env overrides win (e.g. a bench experiment turning AQE off).
    merged = {**_DEFAULTS, **extra_conf, **env_conf}
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set(
        "spark.sql.adaptive.enabled", merged["spark.sql.adaptive.enabled"]
    )
    return spark

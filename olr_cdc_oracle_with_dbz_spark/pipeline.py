"""Declarative pipeline assembly — the engine's "connector config" surface.

The reference is a CDC pipeline assembled **entirely from declarative
configuration**: an OLR source/filter/format config
(/root/reference/scripts/OpenLogReplicator.json), a Debezium source config
(README.md:797-827) and a JDBC sink config (README.md:829-850) wired
together, no imperative code. A user switching from the reference gets the
same experience here: one config dict → a running, checkpointed,
monitored capture→materialize pipeline.

Config shape (every key maps to a reference connector setting, cited):

    {
      "source": {
        "format": "debezium-json",            # wire format (R5)
        "path": "/in/events",                 # file form, or:
        "kafka": {"bootstrap": ..., "topic": ...},   # topic form (R1)
        "max_files_per_trigger": 10,          # batch bound (R19 analogue)
      },
      "filter": {"schema": "OLR_DB", "table": "PRODUCT"},  # OLR filter (R3)
      "schema_registry": "/meta/schemas",     # versioned decode (R16), optional
      "sink": {"table_dir": "/tables/products", "pk": "id",
               "min_batch_events": 500000,    # upsert (R8/R9); coalesce
                                              # undersized batches (CDC_STEADY_r09)
               "fs": "hadoop"},               # metadata seam (fs.py): "local"
                                              # (default) or "hadoop" for table
                                              # roots on hdfs:// / s3a:// / ...
      "checkpoint": "/ckpt/products",         # resume (R15)
    }
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQuery

from olr_cdc_oracle_with_dbz_spark.cdc.envelope import PK
from olr_cdc_oracle_with_dbz_spark.cdc.fixtures import ENVELOPE_SCHEMA
from olr_cdc_oracle_with_dbz_spark.streaming.ingest import read_cdc_stream
from olr_cdc_oracle_with_dbz_spark.streaming.materialize import (
    ParquetUpsertTable,
    materialize_stream,
)


def _sink_fs(spark: SparkSession, sink: dict):
    """Resolve the sink's metadata-filesystem config key to an fs.py impl.

    ``"local"`` / absent → LocalFS (driver-local bookkeeping, this build's
    default); ``"hadoop"`` → HadoopFS, required when ``table_dir`` lives on
    shared storage (hdfs:// / s3a:// / ...) — the 100 TB deployment shape.
    """
    choice = sink.get("fs", "local")
    if choice == "local":
        return None  # ParquetUpsertTable defaults to LocalFS
    if choice == "hadoop":
        from olr_cdc_oracle_with_dbz_spark.fs import HadoopFS

        return HadoopFS(spark)
    raise ValueError(f"unsupported sink fs {choice!r} (use 'local' or 'hadoop')")


def run_pipeline(
    spark: SparkSession,
    config: dict,
    trigger_once: bool = True,
    timeout_sec: float | None = None,
) -> tuple[StreamingQuery, ParquetUpsertTable]:
    """Assemble and start the configured capture→materialize pipeline.

    Returns the running query plus the queryable upsert table. Restart with
    the same config resumes from the checkpoint (R15) — the config IS the
    pipeline identity, exactly like re-PUTting a connector config.

    ``timeout_sec`` (ADVICE r11): when ``trigger_once`` and the sink
    coalesces micro-batches (``min_batch_events > 0``), this call awaits
    the bounded run so it can publish the sub-threshold spool tail; a
    wedged availableNow query would otherwise block the caller forever.
    With a timeout the await returns after ``timeout_sec`` seconds and the
    tail is flushed from whatever the stream durably staged by then.
    """
    src = config["source"]
    if src.get("format", "debezium-json") != "debezium-json":
        raise ValueError(f"unsupported source format {src.get('format')!r}")

    flt = config.get("filter", {})
    schema_name = flt.get("schema", "OLR_DB")
    table_name = flt.get("table", "PRODUCT")

    sink = config["sink"]
    fs = _sink_fs(spark, sink)  # one instance shared by registry + table

    # R16: decode pinned to the registered schema version if a registry is
    # configured (first run registers the built-in envelope schema as v1).
    envelope_ddl = ENVELOPE_SCHEMA
    if "schema_registry" in config:
        from olr_cdc_oracle_with_dbz_spark.cdc.schema_registry import SchemaRegistry

        # the registry lives beside the table — same filesystem seam
        reg = SchemaRegistry(
            config["schema_registry"], f"{schema_name}.{table_name}", fs=fs
        )
        if reg.current_version() is None:
            reg.register(ENVELOPE_SCHEMA)
        envelope_ddl = reg.current()

    table = ParquetUpsertTable(
        spark,
        sink["table_dir"],
        key=sink.get("pk", PK),
        fs=fs,
        # replay identity (r15 ADVICE): a fresh checkpoint reprocessing
        # into this table dir raises on a batch-id label collision
        # instead of silently no-op'ing the colliding batch
        stream_id=f"ckpt:{config['checkpoint'].rstrip('/')}",
    )

    if "quarantine" in config:
        # permissive-ingest form: parse inside foreachBatch so undecodable
        # lines divert to the dead-letter dir instead of failing the stream
        # (unknown-type passthrough posture, OpenLogReplicator.json:25)
        from pyspark.sql import functions as F

        from olr_cdc_oracle_with_dbz_spark.cdc.envelope import (
            quarantine_malformed,
            unwrap,
        )

        qdir = config["quarantine"]
        raw = spark.readStream.format("text").load(src["path"])

        q_min_batch = sink.get("min_batch_events", 0)

        def fn(batch, batch_id: int) -> None:
            good, bad = quarantine_malformed(batch, schema=envelope_ddl)
            # per-batch overwrite, keyed by the batch id (r19 review pass):
            # a foreachBatch REPLAY after a crash between this write and
            # the checkpoint commit re-lands the same dead letters in the
            # same partition dir instead of appending duplicates — the
            # same idempotent-per-batch discipline as the spool. Readers
            # `spark.read.parquet(qdir)` as before; partition discovery
            # surfaces the batch id as a column.
            bad.write.mode("overwrite").parquet(f"{qdir}/batch={batch_id}")
            good = good.filter(
                (F.col("_schema") == schema_name) & (F.col("_table") == table_name)
            )
            unwrapped = unwrap(good)
            if q_min_batch <= 0:
                table.merge_batch(unwrapped, batch_id)
                return
            table.spool_batch(unwrapped, batch_id)
            if table.spool_events() >= q_min_batch:
                table.flush_spool(batch_id)

        writer = (
            raw.writeStream.outputMode("update")
            .foreachBatch(fn)
            .option("checkpointLocation", config["checkpoint"])
        )
        if trigger_once:
            writer = writer.trigger(availableNow=True)
        query = writer.start()
        if trigger_once and q_min_batch > 0:
            # bounded run: publish the sub-threshold tail (ADVICE r10);
            # bounded await so a wedged query can't hang us (ADVICE r11),
            # stop-before-flush on expiry so an active stream can never
            # race the spool cleanup (run_to_completion owns the logic)
            from olr_cdc_oracle_with_dbz_spark.streaming.materialize import (
                run_to_completion,
            )

            run_to_completion(query, table, timeout_sec=timeout_sec)
        return query, table

    if "kafka" in src:
        from olr_cdc_oracle_with_dbz_spark.sources.kafka import read_kafka_cdc

        env = read_kafka_cdc(
            spark,
            src["kafka"]["bootstrap"],
            src["kafka"]["topic"],
            schema_name=schema_name,
            table=table_name,
        )
    else:
        env = read_cdc_stream(
            spark,
            src["path"],
            schema_name=schema_name,
            table=table_name,
            max_files_per_trigger=src.get("max_files_per_trigger"),
            envelope_schema=envelope_ddl,
        )

    min_batch_events = sink.get("min_batch_events", 0)
    query = materialize_stream(
        env,
        table,
        config["checkpoint"],
        trigger_once=trigger_once,
        # sink batch-sizing knob (CDC_STEADY_r09): micro-batches below this
        # event count are spooled and merged together, amortizing the
        # per-commit floor. 0 = merge every micro-batch (default).
        min_batch_events=min_batch_events,
    )
    if trigger_once and min_batch_events > 0:
        # A bounded run must publish its sub-threshold tail (ADVICE r10):
        # otherwise rows below the threshold sit durably in _spool/ while
        # the checkpoint commits, and readers see stale state. trigger_once
        # queries are finite, so awaiting here keeps run_pipeline's
        # "returns a queryable table" contract honest; continuous streams
        # call run_to_completion (or flush_spool) at shutdown themselves.
        from olr_cdc_oracle_with_dbz_spark.streaming.materialize import (
            run_to_completion,
        )

        run_to_completion(query, table, timeout_sec=timeout_sec)
    return query, table


def run_fanout_pipeline(
    spark: SparkSession,
    config: dict,
    trigger_once: bool = True,
    timeout_sec: float | None = None,
) -> tuple[StreamingQuery, dict[str, ParquetUpsertTable]]:
    """Multi-table capture: one stream, one checkpoint, per-table MERGE.

    The reference's OLR filter is an ARRAY of tables sharing one capture
    stream (/root/reference/scripts/OpenLogReplicator.json:32-39); here
    the equivalent is a single file/Kafka source whose micro-batches are
    routed by ``source.table`` inside ``foreachBatch`` — one offset log
    covers every sink atomically, so a restart can never leave tables at
    different stream positions (the cross-table consistency the
    reference gets from its single connector).

    Config: like :func:`run_pipeline` but ``filter.tables`` is a list and
    ``sink.root_dir`` holds one subdirectory per table.
    """
    from olr_cdc_oracle_with_dbz_spark.cdc.envelope import parse_envelope

    src = config["source"]
    flt = config.get("filter", {})
    schema_name = flt.get("schema", "OLR_DB")
    tables: list[str] = flt["tables"]
    root = config["sink"]["root_dir"]
    key = config["sink"].get("pk", PK)

    from pyspark.sql import functions as F

    raw = spark.readStream.format("text").load(src["path"])
    env = parse_envelope(raw, "value").filter(F.col("_schema") == schema_name)

    fs = _sink_fs(spark, config["sink"])
    sinks = {
        # one shared checkpoint drives every per-table sink, so they share
        # its replay identity (r15 ADVICE — see run_pipeline)
        t: ParquetUpsertTable(
            spark,
            f"{root}/{t}",
            key=key,
            fs=fs,
            stream_id=f"ckpt:{config['checkpoint'].rstrip('/')}",
        )
        for t in tables
    }
    # Per-table spool threshold (same sink knob as run_pipeline). Fanout is
    # where it matters most: routing splits every micro-batch N ways, so
    # per-table batches are 1/N the size and hit the per-commit floor N
    # times as often without coalescing.
    min_batch_events = config["sink"].get("min_batch_events", 0)

    def route(batch, batch_id: int) -> None:
        from olr_cdc_oracle_with_dbz_spark.cdc.envelope import unwrap

        for t, table in sinks.items():
            part = batch.filter(F.col("_table") == t)
            unwrapped = unwrap(part)
            if min_batch_events <= 0:
                table.merge_batch(unwrapped, batch_id)
                continue
            table.spool_batch(unwrapped, batch_id)
            if table.spool_events() >= min_batch_events:
                table.flush_spool(batch_id)

    writer = (
        env.writeStream.outputMode("update")
        .foreachBatch(route)
        .option("checkpointLocation", config["checkpoint"])
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    query = writer.start()
    if trigger_once and min_batch_events > 0:
        # bounded run: publish every table's sub-threshold tail (same
        # contract as run_pipeline — ADVICE r10); bounded await with
        # stop-before-flush on expiry (ADVICE r11 + flush-race fix)
        from olr_cdc_oracle_with_dbz_spark.streaming.materialize import (
            run_all_to_completion,
        )

        run_all_to_completion(query, sinks.values(), timeout_sec=timeout_sec)
    return query, sinks

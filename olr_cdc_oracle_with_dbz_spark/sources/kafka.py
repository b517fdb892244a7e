"""Kafka CDC source/sink builders (reference R1/R6 → Structured Streaming).

The reference's event backbone is a 3-broker KRaft Kafka cluster carrying
the Debezium topic ``oracle.olr.OLR_DB.PRODUCT``, keyed by PK so per-key
order is preserved (/root/reference/README.md:836,841-842;
docker-compose-main.yml:19-95). The engine's production ingest is
``readStream.format("kafka")`` on that topic; everything downstream
(envelope parse → unwrap → keyed merge) is identical to the file-source
test form in :mod:`olr_cdc_oracle_with_dbz_spark.streaming.ingest`.

This container has no Kafka broker or spark-sql-kafka jar, so the
builders here are **construct-only tested**: option assembly is pure and
unit-tested; ``.load()`` requires the connector jar at runtime
(``--packages org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-ver>``).

Scale notes (100 TB / 1000 executors):
* ``minPartitions`` > topic partition count splits hot Kafka partitions
  across more Spark tasks — set to ~2-3× total cores.
* ``maxOffsetsPerTrigger`` bounds micro-batch size so state-store updates
  and the downstream MERGE stay within executor memory.
* Per-key order across brokers is NOT global order (the reference forces
  global order with tasks.max=1, README.md:805,837) — the engine instead
  restores order per key by `_scn` sort inside the merge, which scales.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from olr_cdc_oracle_with_dbz_spark.cdc.envelope import parse_envelope, source_filter

DEFAULT_TOPIC = "oracle.olr.OLR_DB.PRODUCT"  # README.md:836


def kafka_source_options(
    bootstrap_servers: str,
    topic: str = DEFAULT_TOPIC,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
    min_partitions: int | None = None,
    fail_on_data_loss: bool = True,
) -> dict[str, str]:
    """Assemble the kafka-source option map (pure; unit-testable)."""
    opts = {
        "kafka.bootstrap.servers": bootstrap_servers,
        "subscribe": topic,
        "startingOffsets": starting_offsets,
        "failOnDataLoss": str(fail_on_data_loss).lower(),
    }
    if max_offsets_per_trigger is not None:
        opts["maxOffsetsPerTrigger"] = str(max_offsets_per_trigger)
    if min_partitions is not None:
        opts["minPartitions"] = str(min_partitions)
    return opts


def read_kafka_cdc(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str = DEFAULT_TOPIC,
    schema_name: str = "OLR_DB",
    table: str = "PRODUCT",
    **kw,
) -> DataFrame:
    """Streaming envelope DataFrame from the Debezium topic (R1 production
    form). ``value`` is Debezium-JSON (the registry-less wire format; with
    Schema Registry in the loop swap the cast for ``from_avro``).

    ``schema_name``/``table`` apply the same R3 source filter as the file
    path (``ingest.read_cdc_stream``) — without it, a topic carrying more
    than one table would merge foreign rows with colliding ids into the
    materialized table (r15 code-review); pass ``None`` for either to
    keep every event (a single-table topic with re-routed metadata)."""
    reader = spark.readStream.format("kafka")
    for k, v in kafka_source_options(bootstrap_servers, topic, **kw).items():
        reader = reader.option(k, v)
    raw = reader.load().select(
        F.col("key").cast("string").alias("key"),
        F.col("value").cast("string").alias("value"),
        "timestamp",
    )
    env = parse_envelope(raw, "value")
    if schema_name is not None and table is not None:
        env = source_filter(env, schema_name, table)
    return env


def kafka_sink_options(bootstrap_servers: str, topic: str) -> dict[str, str]:
    """Option map for writing a change stream back out to Kafka (the
    engine-as-producer direction; key by PK for per-key order, R6)."""
    return {"kafka.bootstrap.servers": bootstrap_servers, "topic": topic}


def to_kafka_records(env: DataFrame, key_col: str = "after.id") -> DataFrame:
    """Project a PARSED envelope DataFrame to Kafka's (key, value) wire shape.

    Key = PK string (partitioning/per-key order, README.md:841-842);
    value = the full envelope as JSON, INCLUDING the source block rebuilt
    from the promoted metadata columns — without it a re-ingest of the
    topic parses every event with ``_scn``/``_ssn`` NULL, the per-key
    total order degenerates to op precedence, and a delete anywhere in a
    key's history permanently beats later re-inserts (r15 code-review).
    Delete events key on before.id.
    """
    key = F.coalesce(F.col(key_col), F.col("before.id")).cast("string")
    source = F.struct(
        F.col("_scn").alias("scn"),
        F.col("_ssn").alias("ssn"),
        F.col("_txid").alias("txId"),
        F.col("_rowid").alias("rowId"),
        F.col("_schema").alias("schema"),
        F.col("_table").alias("table"),
    )
    return env.select(
        key.alias("key"),
        F.to_json(
            F.struct(
                F.col("before"),
                F.col("after"),
                F.col("op"),
                F.col("ts_ms"),
                source.alias("source"),
            )
        ).alias("value"),
    )

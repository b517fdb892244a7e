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

from olr_cdc_oracle_with_dbz_spark.cdc.envelope import parse_envelope

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
    spark: SparkSession, bootstrap_servers: str, topic: str = DEFAULT_TOPIC, **kw
) -> DataFrame:
    """Streaming envelope DataFrame from the Debezium topic (R1 production
    form). ``value`` is Debezium-JSON (the registry-less wire format; with
    Schema Registry in the loop swap the cast for ``from_avro``)."""
    reader = spark.readStream.format("kafka")
    for k, v in kafka_source_options(bootstrap_servers, topic, **kw).items():
        reader = reader.option(k, v)
    raw = reader.load().select(
        F.col("key").cast("string").alias("key"),
        F.col("value").cast("string").alias("value"),
        "timestamp",
    )
    return parse_envelope(raw, "value")


def kafka_sink_options(bootstrap_servers: str, topic: str) -> dict[str, str]:
    """Option map for writing a change stream back out to Kafka (the
    engine-as-producer direction; key by PK for per-key order, R6)."""
    return {"kafka.bootstrap.servers": bootstrap_servers, "topic": topic}


def to_kafka_records(env: DataFrame, key_col: str = "after.id") -> DataFrame:
    """Project an envelope DataFrame to Kafka's (key, value) wire shape.

    Key = PK string (partitioning/per-key order, README.md:841-842);
    value = the full envelope as JSON. Delete events key on before.id.
    """
    key = F.coalesce(F.col(key_col), F.col("before.id")).cast("string")
    return env.select(
        key.alias("key"),
        F.to_json(F.struct("before", "after", "op", "ts_ms")).alias("value"),
    )

"""Avro wire codec for the CDC bus (reference R5 — Schema Registry framing).

The reference serializes every topic with Avro + a central Schema Registry
(io.confluent AvroConverter on source and sink,
/root/reference/README.md:813-816; registry service
docker-compose-main.yml:97-119). The Spark-native equivalent is
``from_avro``/``to_avro`` from the ``spark-avro`` package over the Kafka
``value`` bytes, after stripping the Confluent wire framing (magic byte
0x00 + big-endian 4-byte schema id) that the registry-aware converters
prepend.

The spark-avro jar is NOT bundled with pyspark (add
``--packages org.apache.spark:spark-avro_2.13:<spark-ver>``), so the codec
is gated behind :func:`avro_available`: the framing logic (pure column
expressions) and the schema document are always live and unit-tested; the
actual decode raises a clear error until the jar is on the classpath.
"""

from __future__ import annotations

import json

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

#: Avro record schema for the Debezium envelope the reference ships
#: (field-for-field the JSON envelope in cdc/fixtures.py — README.md:823
#: decimal.handling.mode=string keeps price a string on the wire).
_ROW_FIELDS = [
    {"name": "id", "type": ["null", "long"], "default": None},
    {"name": "name", "type": ["null", "string"], "default": None},
    {"name": "description", "type": ["null", "string"], "default": None},
    {"name": "price", "type": ["null", "string"], "default": None},
    {"name": "stock", "type": ["null", "int"], "default": None},
    {"name": "created_date", "type": ["null", "long"], "default": None},
    {"name": "updated_date", "type": ["null", "long"], "default": None},
]

AVRO_ENVELOPE_SCHEMA: str = json.dumps(
    {
        "type": "record",
        "name": "Envelope",
        "namespace": "oracle.olr.OLR_DB.PRODUCT",
        "fields": [
            {
                "name": "before",
                "type": [
                    "null",
                    {"type": "record", "name": "Row", "fields": _ROW_FIELDS},
                ],
                "default": None,
            },
            {"name": "after", "type": ["null", "Row"], "default": None},
            {"name": "op", "type": "string"},
            {"name": "ts_ms", "type": ["null", "long"], "default": None},
            {
                "name": "source",
                "type": {
                    "type": "record",
                    "name": "Source",
                    "fields": [
                        {"name": "scn", "type": ["null", "long"], "default": None},
                        # ssn = Debezium's intra-transaction sequence; the
                        # JSON envelope carries it and compact_latest needs
                        # it to order same-SCN events (a same-SCN delete-
                        # then-re-insert wrongly compacts to deleted
                        # without it) — omitting it made encode crash on
                        # IncompatibleSchemaException and decode silently
                        # lossy (r15 code-review)
                        {"name": "ssn", "type": ["null", "long"], "default": None},
                        {"name": "txId", "type": ["null", "string"], "default": None},
                        {"name": "rowId", "type": ["null", "string"], "default": None},
                        {"name": "schema", "type": ["null", "string"], "default": None},
                        {"name": "table", "type": ["null", "string"], "default": None},
                        {"name": "ts_ms", "type": ["null", "long"], "default": None},
                    ],
                },
            },
        ],
    }
)


def avro_available(spark: SparkSession) -> bool:
    """True iff the spark-avro jar is on the session classpath."""
    try:
        spark._jvm.java.lang.Class.forName(  # noqa: SLF001 — classpath probe
            "org.apache.spark.sql.avro.AvroDataToCatalyst"
        )
        return True
    except Exception:
        return False


def strip_confluent_header(value: Column) -> Column:
    """Drop the Schema Registry wire framing from an Avro-encoded column.

    Confluent framing = 1 magic byte (0x00) + 4-byte big-endian schema id
    + Avro body. Pure binary slicing — works without the avro jar.
    """
    return F.substring(value, 6, 2147483647)


def confluent_schema_id(value: Column) -> Column:
    """Extract the big-endian 4-byte schema id from the wire framing."""

    def b(i: int) -> Column:
        return F.conv(F.hex(F.substring(value, i, 1)), 16, 10).cast("long")

    return (b(2) * 16777216 + b(3) * 65536 + b(4) * 256 + b(5)).alias("schema_id")


def decode_avro_envelope(
    raw: DataFrame,
    value_col: str = "value",
    schema_json: str = AVRO_ENVELOPE_SCHEMA,
    confluent_framing: bool = True,
) -> DataFrame:
    """Kafka value bytes → typed envelope column (R5 Avro path).

    Raises a clear RuntimeError when the spark-avro package is absent —
    callers fall back to the Debezium-JSON codec (cdc/envelope.py).
    """
    spark = raw.sparkSession
    if not avro_available(spark):
        raise RuntimeError(
            "spark-avro is not on the classpath; start the session with "
            "--packages org.apache.spark:spark-avro_2.13:<spark-version> "
            "or use the Debezium-JSON codec (cdc.envelope.parse_envelope)"
        )
    from pyspark.sql.avro.functions import from_avro

    body = strip_confluent_header(F.col(value_col)) if confluent_framing else F.col(value_col)
    return raw.withColumn("_e", from_avro(body, schema_json, {"mode": "PERMISSIVE"}))


def encode_avro_envelope(
    env: DataFrame, schema_json: str = AVRO_ENVELOPE_SCHEMA
) -> DataFrame:
    """Envelope struct → Avro body bytes (engine-as-producer direction)."""
    spark = env.sparkSession
    if not avro_available(spark):
        raise RuntimeError(
            "spark-avro is not on the classpath; start the session with "
            "--packages org.apache.spark:spark-avro_2.13:<spark-version>"
        )
    from pyspark.sql.avro.functions import to_avro

    payload = F.struct("before", "after", "op", "ts_ms", "source")
    return env.withColumn("value", to_avro(payload, schema_json))

"""Avro codec seam (R5): framing logic always-on, decode gated on the jar."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from olr_cdc_oracle_with_dbz_spark.sources import avro as A


def test_envelope_schema_is_valid_avro_json():
    doc = json.loads(A.AVRO_ENVELOPE_SCHEMA)
    assert doc["type"] == "record"
    names = [f["name"] for f in doc["fields"]]
    assert names == ["before", "after", "op", "ts_ms", "source"]
    row_fields = [f["name"] for f in doc["fields"][0]["type"][1]["fields"]]
    # field-for-field the JSON envelope (fixtures._COLS)
    assert row_fields == [
        "id", "name", "description", "price", "stock", "created_date", "updated_date",
    ]


def test_confluent_framing_strip_and_schema_id(spark):
    """Framing = 0x00 magic + 4-byte BE schema id + body; pure binary ops
    (no avro jar needed)."""
    body = b"avro-body-bytes"
    schema_id = 0x00010203
    wire = bytes([0]) + schema_id.to_bytes(4, "big") + body
    df = spark.createDataFrame([(wire,)], "value binary")
    got = df.select(
        A.strip_confluent_header(F.col("value")).alias("body"),
        A.confluent_schema_id(F.col("value")),
    ).collect()[0]
    assert bytes(got["body"]) == body
    assert got["schema_id"] == schema_id


def test_decode_raises_clearly_without_jar(spark):
    df = spark.createDataFrame([(b"\x00\x00\x00\x00\x01xx",)], "value binary")
    if A.avro_available(spark):
        pytest.skip("spark-avro present in this environment")
    with pytest.raises(RuntimeError, match="spark-avro"):
        A.decode_avro_envelope(df)
    with pytest.raises(RuntimeError, match="spark-avro"):
        A.encode_avro_envelope(df.withColumn("before", F.lit(None)))


@pytest.mark.skipif(
    "not config.getoption('--run-avro', default=False)",
    reason="requires spark-avro jar (run with --packages org.apache.spark:spark-avro)",
)
def test_avro_roundtrip_with_jar(spark):
    """Full envelope → to_avro → from_avro round-trip (runs only when the
    jar is present; the decode/encode seams are exercised jar-less above)."""
    from olr_cdc_oracle_with_dbz_spark.cdc.fixtures import ENVELOPE_SCHEMA, json_lines

    raw = spark.createDataFrame([(s,) for s in json_lines()], "value string")
    env = raw.select(F.from_json("value", ENVELOPE_SCHEMA).alias("e")).select("e.*")
    encoded = A.encode_avro_envelope(env)
    decoded = A.decode_avro_envelope(encoded, confluent_framing=False)
    assert decoded.count() == len(json_lines())


def test_avro_envelope_schema_carries_ssn():
    """r15 code-review: the Avro envelope must be field-for-field the
    JSON envelope — omitting source.ssn made encode crash against parsed
    envelopes and decode silently drop intra-transaction ordering (the
    same-SCN delete-then-re-insert would compact to deleted)."""
    import json as _json

    from olr_cdc_oracle_with_dbz_spark.sources.avro import AVRO_ENVELOPE_SCHEMA

    schema = _json.loads(AVRO_ENVELOPE_SCHEMA)
    source = next(f for f in schema["fields"] if f["name"] == "source")
    names = [f["name"] for f in source["type"]["fields"]]
    assert "ssn" in names and names.index("ssn") == names.index("scn") + 1

"""Connector-layer tests (SURVEY §2A R1/R2/R11-R14).

Kafka and JDBC transports aren't available in this container, so these
tests exercise everything up to the wire: option assembly, wire-format
projection, incremental-watermark state machine, MERGE statement shape,
and ES bulk-document rendering.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from olr_cdc_oracle_with_dbz_spark.cdc.fixtures import json_lines
from olr_cdc_oracle_with_dbz_spark.cdc.envelope import parse_envelope, unwrap
from olr_cdc_oracle_with_dbz_spark.sources.elasticsearch import (
    es_bulk_payload,
    parse_bulk_line,
)
from olr_cdc_oracle_with_dbz_spark.sources.jdbc import (
    JdbcIncrementalSource,
    jdbc_snapshot,
    upsert_statement,
)
from olr_cdc_oracle_with_dbz_spark.sources.kafka import (
    kafka_source_options,
    to_kafka_records,
)


def _envelopes(spark):
    raw = spark.createDataFrame([(s,) for s in json_lines()], "value string")
    return parse_envelope(raw)


def test_kafka_source_options_shape():
    opts = kafka_source_options(
        "b1:9092,b2:9092", max_offsets_per_trigger=100_000, min_partitions=96
    )
    assert opts["subscribe"] == "oracle.olr.OLR_DB.PRODUCT"
    assert opts["kafka.bootstrap.servers"] == "b1:9092,b2:9092"
    assert opts["maxOffsetsPerTrigger"] == "100000"
    assert opts["minPartitions"] == "96"
    assert opts["failOnDataLoss"] == "true"


def test_kafka_wire_records_keyed_by_pk(spark):
    env = _envelopes(spark)
    recs = to_kafka_records(env).collect()
    assert all(r.key is not None for r in recs)  # deletes key on before.id
    # round-trip: value is valid JSON carrying the op
    ops = {json.loads(r.value)["op"] for r in recs}
    assert ops >= {"c", "u", "d"}


def test_jdbc_snapshot_marks_read_events(spark, sf_dir):
    snap = jdbc_snapshot(
        spark, url="", table="",
        load_fn=lambda: spark.read.parquet(f"{sf_dir}/region.parquet"),
    )
    assert snap.filter(F.col("op") != "r").count() == 0
    assert snap.count() == 5


def test_jdbc_incremental_poll_advances_watermark(spark, sf_dir, tmp_path):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    # poll() emits the predicate in JDBC dialect (ANSI-double-quoted
    # identifiers); a Spark-side injected loader translates to backticks
    def spark_side(pred: str, bound: int):
        return orders.filter(pred.replace('"', "`")).filter(f"o_orderkey <= {bound}")

    src = JdbcIncrementalSource(
        spark,
        watermark_col="o_orderkey",
        state_path=str(tmp_path / "wm.json"),
        load_fn=lambda pred: spark_side(pred, 1000),
    )
    first = src.poll().count()
    assert first > 0
    # second poll above the same bound: nothing new
    assert src.poll().count() == 0
    # widen the bound: only the delta arrives
    src.load_fn = lambda pred: spark_side(pred, 2000)
    delta = src.poll()
    assert delta.count() > 0
    assert delta.agg(F.min("o_orderkey")).collect()[0][0] > 1000


def test_upsert_statement_merge_shape():
    sql = upsert_statement("products", ["id", "name", "price", "__deleted"], "id")
    assert "MERGE INTO products t" in sql
    assert 'WHEN MATCHED AND s."__deleted" THEN DELETE' in sql
    assert 'WHEN MATCHED THEN UPDATE SET t."name" = s."name", t."price" = s."price"' in sql
    assert 'WHEN NOT MATCHED AND NOT s."__deleted" THEN INSERT ("id", "name", "price")' in sql


def test_es_bulk_payload_upsert_and_delete(spark):
    rows = unwrap(_envelopes(spark))
    # one bulk action per change event (fixture includes delete-then-reinsert
    # of the same id, so key on the event, not the id)
    acts = es_bulk_payload(rows, "products", "id").collect()
    # NB: Row.__getattr__ refuses dunder-prefixed names — index instead
    assert any(r["__deleted"] for r in acts) and any(not r["__deleted"] for r in acts)
    for r in acts:
        act = parse_bulk_line(r.bulk)
        if r["__deleted"]:
            assert act["delete"]["_id"] == str(r._id)
        else:
            assert act["index"]["_index"] == "products"
            assert act["_source"]["id"] == r._id


def test_kafka_load_requires_connector_jar(spark):
    # documents the runtime requirement rather than silently passing
    from olr_cdc_oracle_with_dbz_spark.sources.kafka import read_kafka_cdc

    with pytest.raises(Exception):
        read_kafka_cdc(spark, "localhost:9092").printSchema()

"""Synthetic CDC load generator — envelope events at scale-factor volume.

The golden fixture (cdc/fixtures.py) is 12 hand-written events for
semantics; this generator produces *volume* for throughput measurement:
one Debezium-JSON envelope per ``orders`` row (deterministic mapping, op
mix c/u/d by key), written as JSON-lines text files — the same wire form
the streaming ingest consumes in production tests.

Update events (op='u') carry a before image with the prior price — and a
higher SCN than the insert of the same key, so latest-per-key compaction
has real work per key. Deletes ride keys ≡ 0 (mod 10); their final state
must be absence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from olr_cdc_oracle_with_dbz_spark.catalog import Catalog


def generate_envelope_lines(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    files: int = 16,
    hot_key_mod: int | None = None,
) -> int:
    """Write a deterministic envelope-event corpus; returns event count.

    Every order yields an insert; keys ≡ 1 (mod 3) add an update, keys ≡ 0
    (mod 10) add a delete — ~143% of |orders| events with realistic
    per-key histories. All JSON rendering happens in Spark (codegen'd
    ``to_json``), partitioned into ``files`` so the streaming reader can
    parallelize file discovery like a real spooldir.

    ``hot_key_mod=K`` redirects the events of every K-th updating row
    (keys ≡ 1 mod 3 with key % K == 0) onto primary key 1 — one hot row
    receiving ~2/(3K·1.43) of the whole event stream, every event under
    its own SCN — the skewed-ingest shape a popular entity produces in
    production CDC. K=7 puts ~5% of all events on the one key.
    """
    o = Catalog(spark, sf_dir).orders
    # the image's primary key; hot_key_mod redirects selected rows' events
    # onto key 1 while SCN/txn identity stays derived from the ORIGINAL
    # orderkey (every hot event keeps a distinct SCN — a real hot row's
    # history is many commits, not one)
    id_col = F.col("o_orderkey")
    if hot_key_mod:
        id_col = F.when(
            (F.col("o_orderkey") % 3 == 1)
            & (F.col("o_orderkey") % hot_key_mod == 0),
            F.lit(1),
        ).otherwise(F.col("o_orderkey"))

    def image(price_col):
        return F.struct(
            id_col.cast("int").alias("id"),
            F.col("o_orderpriority").alias("name"),
            F.lit(None).cast("string").alias("description"),
            price_col.cast("string").alias("price"),  # decimal-as-string (README.md:823)
            (F.col("o_orderkey") % 100).cast("int").alias("stock"),
            F.lit(1704067200000).alias("created_date"),
            F.lit(1704067200000).alias("updated_date"),
        )

    src = F.struct(
        F.lit("OLR_DB").alias("schema"),
        F.lit("PRODUCT").alias("table"),
        (F.col("o_orderkey") * 10 + F.col("seq")).alias("scn"),
        F.concat(F.lit("T"), F.col("o_orderkey").cast("string")).alias("txId"),
        F.concat(F.lit("AAA"), F.col("o_orderkey").cast("string")).alias("rowId"),
    )

    inserts = o.withColumn("seq", F.lit(0)).select(
        F.lit(None).cast("string").alias("_tag"),
        F.to_json(
            F.struct(
                F.lit(None).cast("struct<id:int>").alias("before"),
                image(F.col("o_totalprice")).alias("after"),
                F.lit("c").alias("op"),
                F.lit(1704067200000).alias("ts_ms"),
                src.alias("source"),
            )
        ).alias("value"),
    )
    updates = (
        o.filter(F.col("o_orderkey") % 3 == 1)
        .withColumn("seq", F.lit(1))
        .select(
            F.lit(None).cast("string").alias("_tag"),
            F.to_json(
                F.struct(
                    image(F.col("o_totalprice")).alias("before"),
                    image(F.round(F.col("o_totalprice") * 1.1, 2)).alias("after"),
                    F.lit("u").alias("op"),
                    F.lit(1704067210000).alias("ts_ms"),
                    src.alias("source"),
                )
            ).alias("value"),
        )
    )
    deletes = (
        o.filter(F.col("o_orderkey") % 10 == 0)
        .withColumn("seq", F.lit(2))
        .select(
            F.lit(None).cast("string").alias("_tag"),
            F.to_json(
                F.struct(
                    image(F.col("o_totalprice")).alias("before"),
                    F.lit(None).cast("struct<id:int>").alias("after"),
                    F.lit("d").alias("op"),
                    F.lit(1704067220000).alias("ts_ms"),
                    src.alias("source"),
                )
            ).alias("value"),
        )
    )
    events = inserts.unionByName(updates).unionByName(deletes).select("value")
    events.repartition(files).write.mode("overwrite").text(out_dir)
    return events.count()

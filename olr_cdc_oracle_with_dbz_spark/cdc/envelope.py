"""Debezium envelope parse + unwrap + compaction (reference R4–R9 semantics).

These are the reference pipeline's core dataflow operators re-expressed as
DataFrame transforms, shared by the batch queries (Q50–Q54) and the
streaming materializer (S1/S7):

* :func:`parse_envelope` — R4/R5: JSON wire → typed envelope rows
  (``from_json`` with the explicit envelope schema; never inferSchema).
* :func:`unwrap` — R7 (``ExtractNewRecordState`` +
  ``delete.handling.mode: rewrite``, /root/reference/README.md:844-848):
  flatten to row images, deletes carry ``before.*`` and ``__deleted=true``.
* :func:`compact_latest` — R8/R9 (``insert.mode: upsert`` +
  ``delete.enabled: true``, /root/reference/README.md:839-845): latest event
  per key wins, deletes drop the row.

Scale notes: compaction is one shuffle on the primary key (window
``row_number`` with partial pushdown via AQE); at 100 TB the key is
high-cardinality so partitions stay balanced, and in streaming form the
same transform runs per micro-batch over bounded input (foreachBatch MERGE).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from olr_cdc_oracle_with_dbz_spark.cdc.fixtures import ENVELOPE_SCHEMA

#: product table primary key (set-up-orl.sql:195; pk.fields README.md:842)
PK = "id"


def parse_envelope(
    raw: DataFrame, value_col: str = "value", schema: str = ENVELOPE_SCHEMA
) -> DataFrame:
    """Parse Debezium-JSON strings into typed envelope rows (R4/R5).

    Output columns: before, after (row structs), op, ts_ms, source struct
    with ``_scn``/``_ssn``/``_txid``/``_rowid`` promoted as metadata
    columns — the total order key per OpenLogReplicator.json:24-26.
    ``_ssn`` is Debezium's intra-transaction sequence (NULL where the wire
    omits it); with it, (scn, ssn) is a total order over events even when
    several ops on one key commit under the same SCN.

    ``schema`` is the pinned envelope schema for the stream's current
    schema version (R16: the reference pins decode schema to a dictionary
    SCN, olr-checkpoint/ORACLE-chkpt-2156848.json:11); additive evolution
    (R10) = re-parse with the widened schema — old events yield NULL for
    new fields, exactly like ``auto.evolve`` at the JDBC sink.
    """
    parsed = raw.select(F.from_json(F.col(value_col), schema).alias("e")).select("e.*")
    return _promote(parsed)


def _promote(parsed: DataFrame) -> DataFrame:
    """Envelope-struct columns → the typed row shape with the metadata
    promotions — the single definition shared by :func:`parse_envelope`
    and :func:`quarantine_malformed` (which already holds parsed rows and
    must not pay a second ``from_json`` pass)."""
    return parsed.select(
        "before",
        "after",
        "op",
        "ts_ms",
        F.col("source.scn").alias("_scn"),
        F.col("source.ssn").alias("_ssn"),
        F.col("source.txId").alias("_txid"),
        F.col("source.rowId").alias("_rowid"),
        F.col("source.schema").alias("_schema"),
        F.col("source.table").alias("_table"),
    )


def source_filter(env: DataFrame, schema: str = "OLR_DB", table: str = "PRODUCT") -> DataFrame:
    """R3: keep only the captured table (OpenLogReplicator.json:32-39)."""
    return env.filter((F.col("_schema") == schema) & (F.col("_table") == table))


def _image_cols(img: str) -> list[Column]:
    """Typed projection of one row image; price is decimal-as-string."""
    return [
        F.col(f"{img}.id").alias("id"),
        F.col(f"{img}.name").alias("name"),
        F.col(f"{img}.description").alias("description"),
        F.col(f"{img}.price").cast("decimal(10,2)").alias("price"),
        F.col(f"{img}.stock").alias("stock"),
        F.timestamp_millis(F.col(f"{img}.created_date")).alias("created_date"),
        F.timestamp_millis(F.col(f"{img}.updated_date")).alias("updated_date"),
    ]


def unwrap(env: DataFrame, extra_cols: tuple[str, ...] = ()) -> DataFrame:
    """R7: flatten envelope → row image + ``__deleted`` rewrite.

    Delete events carry only ``before`` — the rewritten row sources its
    columns from the before image (README.md:846-848 semantics).

    ``extra_cols``: additional (evolved) image fields to carry through —
    additive schema evolution (R10); absent in old events ⇒ NULL.
    """
    is_del = F.col("op") == "d"
    img = F.when(is_del, F.col("before")).otherwise(F.col("after"))
    flat = env.withColumn("_img", img).select(
        *_image_cols("_img"),
        *[F.col(f"_img.{c}").alias(c) for c in extra_cols],
        is_del.alias("__deleted"),
        "op",
        "_scn",
        "_ssn",
        "_txid",
        "_rowid",
    )
    return flat


def quarantine_malformed(
    raw: DataFrame, value_col: str = "value", schema: str = ENVELOPE_SCHEMA
) -> tuple[DataFrame, DataFrame]:
    """Permissive ingest split: (parsed good events, quarantined bad lines).

    The reference passes unknown/undecodable content through rather than
    failing (``unknown-type: 1``,
    /root/reference/scripts/OpenLogReplicator.json:25). Spark's PERMISSIVE
    ``from_json`` nulls out unparseable rows; here they divert to a
    quarantine stream (raw line + error tag) so the pipeline keeps moving
    and nothing is silently dropped — the lakehouse dead-letter pattern.
    """
    tagged = raw.withColumn("_e", F.from_json(F.col(value_col), schema))
    # a line is malformed if parsing produced no envelope, OR the envelope
    # is missing op / source: a null-op row would get __deleted=NULL in
    # unwrap and every ~__deleted filter silently drops it (neither
    # materialized nor quarantined — worse, it can win a key's window and
    # mask an older valid row); a null-source row has no (_scn,_ssn)
    # position in the total order. Debezium always emits both, so their
    # absence IS the malformed case (r15 code-review).
    unparseable = (
        F.col("_e").isNull()
        | F.col("_e.op").isNull()
        | F.col("_e.source").isNull()
    )
    # r19 review pass: an envelope whose op CLAIMS an image it doesn't
    # carry is equally malformed — c/u/r events always carry ``after``
    # and d events always carry ``before`` (full before-images, R17), so
    # a missing one would flow through unwrap as an all-NULL row image:
    # a NULL-id junk row that pollutes the keyed merge under the NULL
    # key group instead of either materializing usefully or surfacing.
    known_op = F.col("_e.op").isin("c", "u", "r", "d")
    missing_image = (
        (F.col("_e.op").isin("c", "u", "r") & F.col("_e.after").isNull())
        | ((F.col("_e.op") == "d") & F.col("_e.before").isNull())
    )
    # ops outside the c/u/r/d contract (e.g. Debezium's truncate "t")
    # carry no row image the engine can materialize — divert them loudly
    # rather than manufacture a NULL row (same nothing-vanishes posture).
    is_bad = unparseable | ~known_op | missing_image
    # good rows reuse the already-parsed struct — re-running from_json on
    # the filtered raw values would double the dominant CPU of ingest
    good = _promote(tagged.filter(~is_bad).select("_e.*"))
    bad = tagged.filter(is_bad).select(
        F.col(value_col).alias("raw_line"),
        F.when(unparseable, "unparseable-envelope")
        .when(~known_op, "unsupported-op")
        .otherwise("missing-image-for-op")
        .alias("error"),
    )
    return good, bad


def _latest_first_order(cols: set[str]) -> list[Column]:
    """The latest-event-first total order shared by every compaction form
    (see :func:`compact_latest` for the tie-break rationale). Every
    column after ``_scn`` is optional — an absent column participates
    exactly like an all-NULL one."""
    order = [F.col("_scn").desc()]
    if "_ssn" in cols:
        order.append(F.col("_ssn").desc_nulls_last())
    if "op" in cols:
        order.append(
            F.when(F.col("op") == "d", 2)
            .when(F.col("op") == "u", 1)
            .otherwise(0)
            .desc()
        )
    if "_rowid" in cols:
        order.append(F.col("_rowid").desc())
    return order


def compact_latest(
    unwrapped: DataFrame, key: str = PK, keep_tombstones: bool = False
) -> DataFrame:
    """R8/R9: keyed upsert compaction — latest ``_scn`` per key wins,
    surviving deletes are dropped.

    ``keep_tombstones=True`` retains a ``(key, _scn, __deleted=true)``
    tombstone row for deleted keys instead of dropping them — the
    materialization sink stores these so an out-of-order older event
    arriving in a LATER micro-batch cannot resurrect a deleted row
    (Delta-style tombstone retention; readers filter ``__deleted``).

    Per-key order is total because SCN is a total order over commits; Spark
    cannot rely on arrival order across partitions (unlike the reference's
    ``tasks.max=1`` serialization, README.md:805,837 — documented delta R20),
    so ordering is always re-derived from ``(_scn)``.

    Tie-break: two ops on the same key inside one Oracle transaction can
    COMMIT under the same SCN. The PRIMARY same-SCN order is ``_ssn``
    (Debezium's intra-transaction sequence, carried through
    :func:`parse_envelope`) — log order, exactly what the reference
    preserves via ``tasks.max=1`` — so a delete-then-re-insert within one
    transaction correctly compacts to the re-inserted row. Where the wire
    lacks a sequence (``_ssn`` NULL), the fallback is op precedence
    (d > u > c/r: the logically-latest state of a key in a same-SCN group
    is the delete if one exists, else the update) and ``_rowid`` as a
    final deterministic key. LIMITATION (documented, round-2 advice): a
    same-SCN d→c WITHOUT ssn still resolves to the delete under the
    fallback — sequence-less wire formats cannot distinguish the two
    orders.

    Every tie-break column after ``_scn`` is OPTIONAL: frames from
    sequence-less wire formats (or stored state written before ``_ssn``
    was carried through) may lack ``_ssn``/``op``/``_rowid`` entirely, so
    each key participates in the ordering only when the column is present
    — an absent column behaves exactly like an all-NULL one.
    """
    order = _latest_first_order(set(unwrapped.columns))
    w = Window.partitionBy(key).orderBy(*order)
    latest = unwrapped.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") == 1
    )
    if keep_tombstones:
        # Stored-state branch DELIBERATELY retains ``_ssn``: state is
        # re-compacted against later micro-batches, and a late event
        # committing under the SAME SCN as a stored row can only be
        # ordered by the intra-transaction sequence. The default branch
        # is a final user-facing snapshot — no further compaction — so
        # ``_ssn`` is dropped there.
        return latest.drop("_rn", "op", "_txid", "_rowid")
    return latest.filter(~F.col("__deleted")).drop(
        "_rn", "__deleted", "op", "_txid", "_rowid", "_ssn"
    )


def compact_latest_clustered(
    unwrapped: DataFrame, key: str, cluster_col: Column, n_parts: int
) -> DataFrame:
    """:func:`compact_latest` (tombstone-retaining form) under a
    cluster-aligned single shuffle.

    ``cluster_col`` must be a pure function of ``key`` (a bucket hash), so
    key groups never span clusters and latest-per-key within a cluster ≡
    latest-per-key globally. One exchange on the cluster id replaces the
    per-key window exchange; the window then orders ``(key, latest-first)``
    WITHIN each cluster — its required distribution is satisfied, so no
    second exchange — and latest-per-key is the first row of each key run
    (``lag(key)`` changes). The output stays clustered AND key-sorted, so
    a ``partitionBy(cluster)`` write emits one key-ordered file per
    cluster instead of tasks×clusters fragments, and subsequent bucket
    read-backs prune via per-file min/max key stats. Tie-break is the
    shared :func:`_latest_first_order` — identical to ``compact_latest``
    (asserted equivalent in tests/test_cdc.py).
    """
    order = _latest_first_order(set(unwrapped.columns))
    df = unwrapped.withColumn("_pbc", cluster_col).repartition(
        max(n_parts, 1), F.col("_pbc")
    )
    w = Window.partitionBy("_pbc").orderBy(F.col(key).asc(), *order)
    # Run-start detection must distinguish "no previous row" (partition
    # start) from "previous row had a NULL key": lag(key) is NULL in both
    # cases, and eqNullSafe(NULL, NULL) would swallow a NULL-key run that
    # opens the partition (NULLs sort first under asc). ``_mark`` is a
    # lag over a non-null literal — NULL exactly at the partition start —
    # so the first row is always a run start, matching compact_latest's
    # one-row-per-NULL-key-group semantics.
    latest = (
        df.withColumn("_prev", F.lag(key).over(w))
        .withColumn("_mark", F.lag(F.lit(0)).over(w))
        .filter(
            F.col("_mark").isNull()
            | ~F.col("_prev").eqNullSafe(F.col(key))
        )
    )
    return latest.drop("_prev", "_mark", "_pbc", "op", "_txid", "_rowid")

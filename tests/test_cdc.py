"""CDC unit tests: golden fixture semantics + schema evolution (R10/R16)."""

from __future__ import annotations

from pyspark.sql import functions as F

from olr_cdc_oracle_with_dbz_spark.cdc import envelope as E
from olr_cdc_oracle_with_dbz_spark.cdc.fixtures import (
    ENVELOPE_SCHEMA,
    EXPECTED_FINAL,
    json_lines,
)
from olr_cdc_oracle_with_dbz_spark.streaming.materialize import ParquetUpsertTable


def _env(spark, lines=None, schema=ENVELOPE_SCHEMA):
    raw = spark.createDataFrame([(s,) for s in (lines or json_lines())], "value string")
    return E.source_filter(E.parse_envelope(raw, schema=schema))


def test_golden_final_state(spark):
    final = E.compact_latest(E.unwrap(_env(spark))).orderBy("id").collect()
    got = [(r["id"], r["name"], r["description"], str(r["price"]), r["stock"]) for r in final]
    want = [(r[0], r[1], r[2], r[3], r[4]) for r in EXPECTED_FINAL]
    assert got == want


def test_delete_rewrite_sources_before_image(spark):
    """README.md:846-848: every __deleted row carries the before-image.

    The fixture has two deletes: T3 (scn=130, id=4) and the same-SCN
    delete half of the d->re-insert pair (T6B, scn=165, id=1)."""
    rows = E.unwrap(_env(spark)).filter(F.col("__deleted")).orderBy("_scn").collect()
    assert len(rows) == 2
    t3, t6b = rows
    assert (t3["id"], t3["name"], str(t3["price"])) == (4, "Test Product", "149.99")
    assert (t6b["id"], t6b["name"], str(t6b["price"])) == (1, "Widget", "19.99")


def test_intra_txn_ordering(spark):
    """Two updates in one txn (same txid, scn 150/151): the later scn wins."""
    final = E.compact_latest(E.unwrap(_env(spark)))
    r = final.filter(F.col("id") == 2).collect()[0]
    assert (str(r["price"]), r["stock"]) == ("27.99", 40)


def test_reinsert_after_delete(spark):
    final = E.compact_latest(E.unwrap(_env(spark)))
    r = final.filter(F.col("id") == 4).collect()[0]
    assert (r["name"], str(r["price"]), r["stock"]) == ("Test Product v2", "79.99", 7)


def test_tombstone_filtering(spark):
    """Kafka tombstones (value IS NULL, drop.tombstones=false) must be
    droppable before parse without affecting results."""
    lines = json_lines()
    raw = spark.createDataFrame(
        [(s,) for s in lines[:6]] + [(None,)] + [(s,) for s in lines[6:]],
        "value string",
    )
    env = E.source_filter(E.parse_envelope(raw.filter(F.col("value").isNotNull())))
    final = E.compact_latest(E.unwrap(env))
    assert final.count() == len(EXPECTED_FINAL)


_SCHEMA_V2 = ENVELOPE_SCHEMA.replace(
    "stock:int, created_date:bigint, updated_date:bigint>",
    "stock:int, created_date:bigint, updated_date:bigint, category:string>",
)


def test_schema_evolution_additive_column(spark, tmp_path):
    """R10 (auto.evolve): a widened envelope re-parses old events with NULL
    for the new column; the upsert table evolves additively."""
    import json

    # old-schema events materialized first
    table = ParquetUpsertTable(spark, str(tmp_path / "tbl"))
    old_env = _env(spark, json_lines()[:7])
    table.merge_batch(E.unwrap(old_env), batch_id=0)
    assert "category" not in table.read().columns

    # post-evolution event: update id=1 adding category
    evolved_event = json.dumps(
        {
            "before": None,
            "after": {
                "id": 1, "name": "Widget", "description": "Basic widget",
                "price": "21.99", "stock": 90,
                "created_date": 1704096000000, "updated_date": 1704110000000,
                "category": "tools",
            },
            "op": "u",
            "ts_ms": 1700000200000,
            "source": {"scn": 200, "txId": "T9", "rowId": "AAA0x1",
                       "schema": "OLR_DB", "table": "PRODUCT", "ts_ms": 1700000200000},
        }
    )
    new_env = _env(spark, [evolved_event], schema=_SCHEMA_V2)
    table.merge_batch(E.unwrap(new_env, extra_cols=("category",)), batch_id=1)

    final = table.read().orderBy("id")
    assert "category" in final.columns
    rows = {r["id"]: r["category"] for r in final.collect()}
    assert rows[1] == "tools"
    assert all(v is None for k, v in rows.items() if k != 1)  # pre-evolution → NULL
    got_price = {r["id"]: str(r["price"]) for r in final.collect()}
    assert got_price[1] == "21.99"


def test_genload_envelope_semantics(spark, tmp_path, sf_dir):
    """Synthetic volume load: per-key histories compact to the right state
    (update beats insert by SCN; deleted keys absent)."""
    import pyspark.sql.functions as F

    from olr_cdc_oracle_with_dbz_spark.cdc import envelope as E
    from olr_cdc_oracle_with_dbz_spark.cdc.genload import generate_envelope_lines

    out = str(tmp_path / "gen")
    n = generate_envelope_lines(spark, sf_dir, out, files=4)
    raw = spark.read.text(out)
    env = E.source_filter(E.parse_envelope(raw))
    assert env.count() == n
    final = E.compact_latest(E.unwrap(env))
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    # deletes: keys ≡ 0 (mod 10) gone
    assert final.filter("id % 10 = 0").count() == 0
    # updates: keys ≡ 1 (mod 3) carry the 1.1x price (unless deleted)
    upd = final.filter("id % 3 = 1 AND id % 10 <> 0")
    joined = upd.join(
        orders.select(F.col("o_orderkey").alias("id"), "o_totalprice"), "id"
    )
    mismatched = joined.filter(
        F.abs(F.col("price") - F.round(F.col("o_totalprice") * 1.1, 2)) > 1e-6
    ).count()
    assert mismatched == 0
    # inserts: everything else carries the original price
    ins = final.filter("id % 3 <> 1 AND id % 10 <> 0")
    j2 = ins.join(orders.select(F.col("o_orderkey").alias("id"), "o_totalprice"), "id")
    assert j2.filter(F.abs(F.col("price") - F.col("o_totalprice")) > 1e-6).count() == 0


def test_malformed_events_quarantined_not_dropped(spark):
    """Permissive ingest (unknown-type passthrough): bad lines divert to a
    quarantine stream; good events are unaffected; nothing vanishes."""
    from olr_cdc_oracle_with_dbz_spark.cdc.envelope import quarantine_malformed

    lines = json_lines()
    bad_lines = ["{not json at all", '{"foo": 1}', ""]
    raw = spark.createDataFrame(
        [(s,) for s in lines + bad_lines], "value string"
    )
    good, bad = quarantine_malformed(raw)
    assert good.count() == len(lines)
    assert bad.count() == len(bad_lines)
    assert set(r["error"] for r in bad.collect()) == {"unparseable-envelope"}
    # good side still compacts to the golden state
    final = E.compact_latest(E.unwrap(E.source_filter(good)))
    assert final.count() == len(EXPECTED_FINAL)


def test_out_of_order_batch_cannot_regress_state(spark, tmp_path):
    """A replayed/late batch carrying an OLDER scn for a key must not
    overwrite newer materialized state (idempotent MERGE contract)."""
    from olr_cdc_oracle_with_dbz_spark.streaming.materialize import ParquetUpsertTable

    lines = json_lines()
    raw_all = spark.createDataFrame([(s,) for s in lines], "value string")
    env_all = E.source_filter(E.parse_envelope(raw_all))
    table = ParquetUpsertTable(spark, str(tmp_path / "t"))
    table.merge_batch(E.unwrap(env_all), batch_id=1)
    after_full = {
        (r["id"], r["name"], float(r["price"]))
        for r in table.read().select("id", "name", "price").collect()
    }

    # replay ONLY the old update of id=4 (scn 120 < materialized 140)
    old_line = [s for s in lines if '"scn": 120' in s or '"scn":120' in s]
    assert old_line, "fixture must contain scn 120"
    raw_old = spark.createDataFrame([(s,) for s in old_line], "value string")
    table.merge_batch(E.unwrap(E.source_filter(E.parse_envelope(raw_old))), batch_id=2)
    after_replay = {
        (r["id"], r["name"], float(r["price"]))
        for r in table.read().select("id", "name", "price").collect()
    }
    assert after_replay == after_full


def _mk_lines(events):
    """Render ad-hoc (scn, txid, rowid, op, before, after) tuples as wire JSON."""
    import json as _json

    from olr_cdc_oracle_with_dbz_spark.cdc.fixtures import _row_obj

    out = []
    for scn, txid, rowid, op, before, after in events:
        out.append(
            _json.dumps(
                {
                    "before": _row_obj(before),
                    "after": _row_obj(after),
                    "op": op,
                    "ts_ms": scn * 1000 + 1_700_000_000_000,
                    "source": {
                        "scn": scn,
                        "txId": txid,
                        "rowId": rowid,
                        "schema": "OLR_DB",
                        "table": "PRODUCT",
                        "ts_ms": scn * 1000 + 1_700_000_000_000,
                    },
                },
                sort_keys=True,
            )
        )
    return out


def test_same_scn_tie_break_is_deterministic(spark):
    """Two ops on one key committed under the SAME SCN (one Oracle txn):
    compaction must be deterministic — delete outranks update outranks
    insert, then rowid breaks remaining ties."""
    t0 = 1704096000000
    rowa = (9, "A", None, "1.00", 1, t0, t0)
    rowb = (9, "B", None, "2.00", 2, t0, t0)
    # insert + update share scn 500: update must win (op precedence)
    lines = _mk_lines(
        [
            (500, "T9", "AAA0x9", "c", None, rowa),
            (500, "T9", "AAA0x9", "u", rowa, rowb),
        ]
    )
    for _ in range(2):  # deterministic across runs
        got = E.compact_latest(E.unwrap(_env(spark, lines))).collect()
        assert [(r["id"], r["name"]) for r in got] == [(9, "B")]

    # insert + update + delete all at scn 600: delete wins -> key gone
    lines_d = _mk_lines(
        [
            (600, "TA", "AAA0xA", "c", None, rowa),
            (600, "TA", "AAA0xA", "u", rowa, rowb),
            (600, "TA", "AAA0xA", "d", rowb, None),
        ]
    )
    assert E.compact_latest(E.unwrap(_env(spark, lines_d))).count() == 0


def test_tombstone_blocks_resurrection_across_batches(spark, tmp_path):
    """An out-of-order OLDER event for a DELETED key arriving in a later
    micro-batch must not resurrect the row (tombstone retention)."""
    lines = json_lines()
    # batch 1: everything through the delete of id=4 at scn 130
    b1 = [s for s in lines if '"scn": 1' in s or True][:6]  # scn 100..130
    table = ParquetUpsertTable(spark, str(tmp_path / "tomb"))
    table.merge_batch(E.unwrap(_env(spark, b1)), batch_id=1)
    assert 4 not in {r["id"] for r in table.read().collect()}

    # batch 2: ONLY the stale update of id=4 (scn 120 < delete scn 130)
    stale = [s for s in lines if '"scn": 120' in s]
    assert stale
    table.merge_batch(E.unwrap(_env(spark, stale)), batch_id=2)
    assert 4 not in {r["id"] for r in table.read().collect()}, (
        "deleted key resurrected by an older replayed event"
    )


def test_clustered_compaction_equivalent(spark, sf_dir):
    """compact_latest_clustered must reproduce compact_latest's
    tombstone-retaining output exactly — same survivors, same tie-breaks —
    on the golden fixture (same-SCN ties, intra-txn ssn ordering, deletes)
    AND the generated volume corpus (real per-key histories)."""
    import tempfile

    from olr_cdc_oracle_with_dbz_spark.cdc.genload import generate_envelope_lines

    def norm(df):
        cols = sorted(df.columns)
        return sorted(tuple(r) for r in df.select(*cols).collect())

    bucket = F.pmod(F.xxhash64(F.col("id")), F.lit(16))
    unw = E.unwrap(_env(spark))
    a = E.compact_latest(unw, "id", keep_tombstones=True)
    b = E.compact_latest_clustered(unw, "id", bucket, 4)
    assert norm(a) == norm(b)

    # NULL-key rows: compact_latest treats NULL as one key group and keeps
    # exactly one survivor; the clustered form must too (NULLs sort first,
    # so the NULL run opens its cluster partition — the regression case
    # where run-start detection via lag(key) alone dropped the whole run).
    nullk = unw.limit(3).withColumn("id", F.lit(None).cast(unw.schema["id"].dataType))
    mixed = unw.unionByName(nullk)
    an = E.compact_latest(mixed, "id", keep_tombstones=True)
    bn = E.compact_latest_clustered(mixed, "id", bucket, 4)
    assert norm(an) == norm(bn)
    assert bn.filter(F.col("id").isNull()).count() == 1

    with tempfile.TemporaryDirectory() as work:
        generate_envelope_lines(spark, sf_dir, f"{work}/in")
        env = E.source_filter(
            E.parse_envelope(spark.read.text(f"{work}/in"), "value")
        )
        unw2 = E.unwrap(env)
        a2 = E.compact_latest(unw2, "id", keep_tombstones=True)
        b2 = E.compact_latest_clustered(unw2, "id", bucket, 8)
        assert norm(a2) == norm(b2)


def test_incomplete_envelopes_quarantined_not_silently_dropped(spark):
    """r15 code-review: a line missing op (or source) previously passed
    the quarantine gate as 'good', got __deleted=NULL in unwrap, and
    every ~__deleted filter silently dropped it — neither materialized
    nor dead-lettered. Both now divert to quarantine."""
    from olr_cdc_oracle_with_dbz_spark.cdc.envelope import quarantine_malformed

    lines = json_lines()
    no_op = '{"after": {"id": 99}, "source": {"scn": 1, "schema": "OLR_DB", "table": "PRODUCT"}}'
    no_source = '{"op": "c", "after": {"id": 98}}'
    raw = spark.createDataFrame(
        [(s,) for s in lines + [no_op, no_source]], "value string"
    )
    good, bad = quarantine_malformed(raw)
    assert good.count() == len(lines)
    assert bad.count() == 2
    # the good side parses identically to the strict path (single-parse
    # restructure must not change the output shape or values)
    final = E.compact_latest(E.unwrap(E.source_filter(good)))
    assert final.count() == len(EXPECTED_FINAL)


def test_op_image_contract_quarantined_with_distinct_tags(spark):
    """r19 review pass: an envelope whose op claims an image it doesn't
    carry (c/u/r without after, d without before — Debezium always emits
    them, R17 full before-images) previously flowed through unwrap as an
    all-NULL row image: a NULL-id junk row polluting the merge's NULL key
    group. So do ops outside the c/u/r/d contract (Debezium truncate
    't'). All now divert to quarantine under distinct error tags; valid
    events — including deletes carrying ONLY before — stay good."""
    from olr_cdc_oracle_with_dbz_spark.cdc.envelope import quarantine_malformed

    lines = json_lines()
    src = '"source": {"scn": 7, "schema": "OLR_DB", "table": "PRODUCT"}'
    c_no_after = '{"op": "c", "before": {"id": 91}, %s}' % src
    u_no_after = '{"op": "u", %s}' % src
    d_no_before = '{"op": "d", "after": {"id": 92}, %s}' % src
    truncate = '{"op": "t", %s}' % src
    garbage = "not json at all"
    raw = spark.createDataFrame(
        [(s,) for s in lines + [c_no_after, u_no_after, d_no_before, truncate, garbage]],
        "value string",
    )
    good, bad = quarantine_malformed(raw)
    assert good.count() == len(lines)  # every valid event untouched
    from collections import Counter
    counts = Counter(r["error"] for r in bad.collect())
    assert counts == {
        "missing-image-for-op": 3,
        "unsupported-op": 1,
        "unparseable-envelope": 1,
    }, counts
    # deletes with only a before image remain GOOD (the d-contract shape)
    d_ok = '{"op": "d", "before": {"id": 93}, %s}' % src
    raw2 = spark.createDataFrame([(d_ok,)], "value string")
    good2, bad2 = quarantine_malformed(raw2)
    assert good2.count() == 1 and bad2.count() == 0
    # and nothing vanishes: good + bad always partitions the input
    assert good.count() + bad.count() == raw.count()

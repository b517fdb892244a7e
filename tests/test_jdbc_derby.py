"""JDBC connector seam driven END-TO-END against a real database.

Spark ships the embedded Derby JDBC driver (its Hive-metastore backend),
so the R2/R11/R14 seams — previously jar-gated "production path never
executed" — run here against an actual SQL engine: real
``spark.read.format("jdbc")`` scans, real predicate pushdown, a real
staged MERGE with update + delete propagation. Reference semantics:
snapshot ``snapshot.mode=initial`` (/root/reference/README.md:822),
kafka-connect-jdbc incremental source (Dockerfile:68-69), Confluent JDBC
sink upsert+delete (README.md:832-845).
"""

from __future__ import annotations

import pytest

from olr_cdc_oracle_with_dbz_spark.sources.jdbc import (
    JdbcIncrementalSource,
    jdbc_snapshot,
    jdbc_upsert_sink,
)


@pytest.fixture(scope="module")
def derby_url(spark, tmp_path_factory):
    url = f"jdbc:derby:{tmp_path_factory.mktemp('derby')}/db;create=true"
    try:
        conn = spark._jvm.java.sql.DriverManager.getConnection(url)
    except Exception:
        pytest.skip("embedded Derby driver not on the JVM classpath")
    conn.close()
    return url


def _exec(spark, url: str, *stmts: str):
    conn = spark._jvm.java.sql.DriverManager.getConnection(url)
    try:
        st = conn.createStatement()
        for s in stmts:
            st.execute(s)
    finally:
        conn.close()


def test_jdbc_snapshot_real_database_read(spark, derby_url):
    """R2: the production spark.read.jdbc path (no load_fn injection)."""
    _exec(
        spark,
        derby_url,
        'CREATE TABLE snap_src ("id" BIGINT, "name" VARCHAR(32))',
        """INSERT INTO snap_src VALUES (1, 'widget'), (2, 'gadget')""",
    )
    snap = jdbc_snapshot(spark, derby_url, "snap_src")
    rows = sorted((r["id"], r["name"], r["op"]) for r in snap.collect())
    assert rows == [(1, "widget", "r"), (2, "gadget", "r")]


def test_jdbc_incremental_poll_pushes_predicate(spark, derby_url, tmp_path):
    """R14: each poll issues a real WHERE-pushdown JDBC query; the
    watermark file advances exactly like the connector's offsets."""
    _exec(
        spark,
        derby_url,
        'CREATE TABLE poll_src ("seq" BIGINT, "v" VARCHAR(8))',
        """INSERT INTO poll_src VALUES (1, 'a'), (2, 'b')""",
    )

    def load(pred: str):
        return (
            spark.read.format("jdbc")
            .option("url", derby_url)
            # pushdown: the predicate lands in the database query itself
            .option("dbtable", f'(SELECT * FROM poll_src WHERE {pred}) s')
            .load()
        )

    src = JdbcIncrementalSource(spark, "seq", str(tmp_path / "wm.json"), load)
    assert {r["seq"] for r in src.poll().collect()} == {1, 2}
    _exec(spark, derby_url, """INSERT INTO poll_src VALUES (3, 'c')""")
    assert {r["seq"] for r in src.poll().collect()} == {3}  # delta only
    assert src.poll().count() == 0  # no new rows, watermark held


def test_jdbc_incremental_poll_timestamp_watermark(spark, derby_url, tmp_path):
    """R14 ``mode=timestamp``: a TIMESTAMP watermark column renders as a
    quoted literal in the pushed predicate and still compares correctly
    in the database (ADVICE r5: the raw interpolation was numeric-only)."""
    _exec(
        spark,
        derby_url,
        'CREATE TABLE poll_ts ("updated_at" TIMESTAMP, "v" VARCHAR(8))',
        """INSERT INTO poll_ts VALUES
           (TIMESTAMP('2026-01-01 10:00:00'), 'a'),
           (TIMESTAMP('2026-01-01 11:00:00'), 'b')""",
    )

    def load(pred: str):
        return (
            spark.read.format("jdbc")
            .option("url", derby_url)
            .option("dbtable", f"(SELECT * FROM poll_ts WHERE {pred}) s")
            .load()
        )

    src = JdbcIncrementalSource(spark, "updated_at", str(tmp_path / "wmts.json"), load)
    assert {r["v"] for r in src.poll().collect()} == {"a", "b"}
    _exec(
        spark,
        derby_url,
        """INSERT INTO poll_ts VALUES (TIMESTAMP('2026-01-01 12:00:00'), 'c')""",
    )
    assert {r["v"] for r in src.poll().collect()} == {"c"}  # delta only
    assert src.poll().count() == 0


def test_jdbc_upsert_sink_schema_qualified_stage_name(spark, derby_url):
    """R11 (ADVICE r5): a schema-qualified target must not leak its dot
    into the unquoted stage-table identifier."""
    _exec(
        spark,
        derby_url,
        "CREATE SCHEMA appx",
        'CREATE TABLE appx.qualified ("id" BIGINT PRIMARY KEY, "name" VARCHAR(32))',
    )
    sink = jdbc_upsert_sink(derby_url, "appx.qualified", "id")
    b = spark.createDataFrame(
        [(1, "thing", False)], "id bigint, name string, __deleted boolean"
    )
    sink(b, 7)
    out = (
        spark.read.format("jdbc")
        .option("url", derby_url)
        .option("dbtable", "appx.qualified")
        .load()
    )
    assert [(r["id"], r["name"]) for r in out.collect()] == [(1, "thing")]


def test_jdbc_upsert_sink_merge_end_to_end(spark, derby_url):
    """R11: staged MERGE against a live database — insert, update, and
    delete propagation across two micro-batches."""
    _exec(
        spark,
        derby_url,
        'CREATE TABLE products ("id" BIGINT PRIMARY KEY, "name" VARCHAR(32), "price" DOUBLE)',
    )
    sink = jdbc_upsert_sink(derby_url, "products", "id")
    b1 = spark.createDataFrame(
        [(1, "widget", 9.99, False), (2, "gadget", 19.99, False)],
        "id bigint, name string, price double, __deleted boolean",
    )
    sink(b1, 1)
    b2 = spark.createDataFrame(
        # update 1, delete 2, insert 3
        [(1, "widget v2", 11.0, False), (2, None, None, True), (3, "doohickey", 5.0, False)],
        "id bigint, name string, price double, __deleted boolean",
    )
    sink(b2, 2)
    final = (
        spark.read.format("jdbc")
        .option("url", derby_url)
        .option("dbtable", "products")
        .load()
    )
    rows = sorted((r["id"], r["name"], r["price"]) for r in final.collect())
    assert rows == [(1, "widget v2", 11.0), (3, "doohickey", 5.0)]
    # the stage tables were dropped after each MERGE
    conn = spark._jvm.java.sql.DriverManager.getConnection(derby_url)
    rs = conn.getMetaData().getTables(None, None, "%", None)
    names = set()
    while rs.next():
        names.add(rs.getString("TABLE_NAME").lower())
    conn.close()
    assert not any(n.startswith("stage_") for n in names)


def test_jdbc_upsert_sink_failed_merge_drops_stage(spark, derby_url):
    """r19 review pass: a FAILED MERGE must still drop its stage table —
    previously only the success path dropped it, so a batch that was
    never replayed (operator intervention after a poisoned merge) left
    stage_<table>_<id> behind forever. The stage is derived state,
    re-created under overwrite on any retry, so the failure-path drop
    can never lose data; the MERGE error still propagates."""
    import pytest

    # no target table exists -> the MERGE itself fails after staging
    sink = jdbc_upsert_sink(derby_url, "no_such_target", "id")
    b = spark.createDataFrame(
        [(1, "x", False)], "id bigint, name string, __deleted boolean"
    )
    with pytest.raises(Exception):
        sink(b, 42)
    conn = spark._jvm.java.sql.DriverManager.getConnection(derby_url)
    rs = conn.getMetaData().getTables(None, None, "%", None)
    names = set()
    while rs.next():
        names.add(rs.getString("TABLE_NAME").lower())
    conn.close()
    assert "stage_no_such_target_42" not in names, names

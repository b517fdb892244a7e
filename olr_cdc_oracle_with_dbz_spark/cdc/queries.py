"""CDC batch queries Q50–Q54 — the reference's dataflow, DuckDB-checkable.

Both sides consume the SAME literal event history (cdc/fixtures.py): Spark
parses the Debezium-JSON wire form; the oracle gets a VALUES relation of the
flattened envelope. Hash-matching these proves the envelope→unwrap→compact
pipeline reproduces the reference's Postgres end state
(/root/reference/README.md:839-848).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from olr_cdc_oracle_with_dbz_spark.cdc import envelope as E
from olr_cdc_oracle_with_dbz_spark.cdc import fixtures
from olr_cdc_oracle_with_dbz_spark.cdc.fixtures import duckdb_values, json_lines
from olr_cdc_oracle_with_dbz_spark.registry import register
from olr_cdc_oracle_with_dbz_spark.plans.canonical import ordered

_V = duckdb_values()


_RAW_CACHE: dict[tuple[int, tuple[str, ...]], DataFrame] = {}


def _lit_lines(spark: SparkSession, lines: list[str]) -> DataFrame:
    """JSON strings → one-column DataFrame as PLAN-EMBEDDED literals.

    ``createDataFrame``/``parallelize`` back the frame with a Python RDD, so
    every execution pays a Python-worker scan stage (~0.2 s) just to re-read
    12 immutable strings. ``explode(array(lit(...)))`` embeds the rows in
    the logical plan instead: execution is a single JVM LocalTableScan-style
    generate — no Python process, no extra stage, one partition. Memoized
    per (session, fixture) since the plan fragment itself is immutable.
    """
    key = (id(spark), tuple(lines))
    if key not in _RAW_CACHE:
        _RAW_CACHE[key] = spark.range(1).select(
            F.explode(F.array(*[F.lit(s) for s in lines])).alias("value")
        )
    return _RAW_CACHE[key]


def _raw_events(spark: SparkSession) -> DataFrame:
    """The fixture history as a one-column DataFrame of JSON strings."""
    return _lit_lines(spark, json_lines())


_PARSED_CACHE: dict[int, DataFrame] = {}


def _parsed(spark: SparkSession) -> DataFrame:
    """Parsed fixture envelope, memoized per session.

    The parse projection builds a few hundred Column objects — ~0.3 s of
    py4j round-trips per construction, the dominant cost of a 12-row
    fixture query. DataFrames are immutable and the fixture is a module
    constant, so the plan fragment is shared across q50–q54 (and across a
    bench's repeat runs) exactly like ``_RAW_CACHE`` shares the literals."""
    key = id(spark)
    if key not in _PARSED_CACHE:
        _PARSED_CACHE[key] = E.source_filter(E.parse_envelope(_raw_events(spark)))
    return _PARSED_CACHE[key]


@register(
    "q50_envelope_parse",
    oracle=f"""
    WITH {_V}
    SELECT scn,
           op,
           coalesce(txid, '(none)') AS txid,
           rowid,
           coalesce(b_id, -1) AS before_id,
           coalesce(a_id, -1) AS after_id,
           coalesce(a_name, '(none)') AS after_name,
           CAST(coalesce(CAST(a_price AS DECIMAL(10,2)), -1) AS DOUBLE) AS after_price
    FROM cdc_events ORDER BY scn
    """,
    tags=("cdc",),
)
def q50_envelope_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R4/R5: Debezium-JSON → typed envelope projection."""
    env = _parsed(spark)
    return env.select(
        F.col("_scn").alias("scn"),
        "op",
        F.coalesce(F.col("_txid"), F.lit("(none)")).alias("txid"),
        F.col("_rowid").alias("rowid"),
        F.coalesce(F.col("before.id"), F.lit(-1)).alias("before_id"),
        F.coalesce(F.col("after.id"), F.lit(-1)).alias("after_id"),
        F.coalesce(F.col("after.name"), F.lit("(none)")).alias("after_name"),
        F.coalesce(F.col("after.price").cast("decimal(10,2)"), F.lit(-1))
        .cast("double")
        .alias("after_price"),
    ).transform(ordered, "scn")


@register(
    "q51_unwrap",
    oracle=f"""
    WITH {_V}
    SELECT scn,
           CASE WHEN op = 'd' THEN b_id ELSE a_id END AS id,
           CASE WHEN op = 'd' THEN b_name ELSE a_name END AS name,
           coalesce(CASE WHEN op = 'd' THEN b_description ELSE a_description END, '(null)') AS description,
           CAST(CAST(CASE WHEN op = 'd' THEN b_price ELSE a_price END AS DECIMAL(10,2)) AS DOUBLE) AS price,
           CASE WHEN op = 'd' THEN b_stock ELSE a_stock END AS stock,
           epoch_ms(CASE WHEN op = 'd' THEN b_updated ELSE a_updated END) AS updated_date,
           (op = 'd') AS __deleted
    FROM cdc_events ORDER BY scn
    """,
    tags=("cdc",),
)
def q51_unwrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R7: unwrap + __deleted rewrite (delete rows source before-image)."""
    flat = E.unwrap(_parsed(spark))
    return flat.select(
        F.col("_scn").alias("scn"),
        "id",
        "name",
        F.coalesce(F.col("description"), F.lit("(null)")).alias("description"),
        F.col("price").cast("double").alias("price"),
        "stock",
        "updated_date",
        "__deleted",
    ).transform(ordered, "scn")


_COMPACT_ORACLE = f"""
    WITH {_V},
    unwrapped AS (
      SELECT scn, ssn, op, rowid,
             CASE WHEN op = 'd' THEN b_id ELSE a_id END AS id,
             CASE WHEN op = 'd' THEN b_name ELSE a_name END AS name,
             CASE WHEN op = 'd' THEN b_description ELSE a_description END AS description,
             CAST(CASE WHEN op = 'd' THEN b_price ELSE a_price END AS DECIMAL(10,2)) AS price,
             CASE WHEN op = 'd' THEN b_stock ELSE a_stock END AS stock,
             epoch_ms(CASE WHEN op = 'd' THEN b_created ELSE a_created END) AS created_date,
             epoch_ms(CASE WHEN op = 'd' THEN b_updated ELSE a_updated END) AS updated_date,
             (op = 'd') AS __deleted
      FROM cdc_events
    ),
    ranked AS (
      -- mirror compact_latest's full tie-break (envelope.py:173): same-SCN
      -- events order by ssn (intra-txn sequence), then op precedence
      -- d > u > c/r, then rowid as the deterministic final key
      SELECT *, row_number() OVER (
        PARTITION BY id
        ORDER BY scn DESC, ssn DESC NULLS LAST,
                 CASE WHEN op = 'd' THEN 2 WHEN op = 'u' THEN 1 ELSE 0 END DESC,
                 rowid DESC
      ) AS rn
      FROM unwrapped
    )
    SELECT id, name, coalesce(description, '(null)') AS description,
           CAST(price AS DOUBLE) AS price, stock, created_date, updated_date
    FROM ranked WHERE rn = 1 AND NOT __deleted
    ORDER BY id
"""


def _final_state(df: DataFrame) -> DataFrame:
    return df.select(
        "id",
        "name",
        F.coalesce(F.col("description"), F.lit("(null)")).alias("description"),
        F.col("price").cast("double").alias("price"),
        "stock",
        "created_date",
        "updated_date",
    ).transform(ordered, "id")


@register("q52_upsert_compaction", oracle=_COMPACT_ORACLE, tags=("cdc",))
def q52_upsert_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R8/R9: latest-per-key upsert + delete — must equal the Postgres-style
    sink state {1, 2@scn151, 3@scn160, 4 re-inserted}."""
    return _final_state(E.compact_latest(E.unwrap(_parsed(spark))))


@register("q53_snapshot_incremental", oracle=_COMPACT_ORACLE, tags=("cdc",))
def q53_snapshot_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R2→R8: snapshot (op='r') materialized first, then incremental changes
    merged on top — same end state as one-shot compaction (Q52)."""
    env = _parsed(spark)
    snapshot = E.unwrap(env.filter(F.col("op") == "r"))
    changes = E.unwrap(env.filter(F.col("op") != "r"))
    # snapshot rows are version 0; changes replay over them by SCN order
    return _final_state(E.compact_latest(snapshot.unionByName(changes)))


@register(
    "q54_changelog_stats",
    oracle=f"""
    WITH {_V}
    SELECT op, COUNT(*) AS n, MIN(scn) AS min_scn, MAX(scn) AS max_scn,
           COUNT(DISTINCT coalesce(CASE WHEN op = 'd' THEN b_id ELSE a_id END, -1)) AS n_keys
    FROM cdc_events GROUP BY op ORDER BY op
    """,
    tags=("cdc",),
)
def q54_changelog_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R21 observability: per-op event counts over the change log."""
    env = _parsed(spark)
    key = F.when(F.col("op") == "d", F.col("before.id")).otherwise(F.col("after.id"))
    return (
        env.groupBy("op")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("_scn").alias("min_scn"),
            F.max("_scn").alias("max_scn"),
            F.countDistinct(F.coalesce(key, F.lit(-1))).alias("n_keys"),
        )
        .transform(ordered, "op")
    )


_V2 = fixtures.duckdb_values_v2()


@register(
    "q50b_envelope_evolved",
    oracle=f"""
    WITH {_V2},
    unwrapped AS (
      SELECT scn, ssn, op, rowid,
             CASE WHEN op = 'd' THEN b_id ELSE a_id END AS id,
             CASE WHEN op = 'd' THEN b_name ELSE a_name END AS name,
             CAST(CAST(CASE WHEN op = 'd' THEN b_price ELSE a_price END AS DECIMAL(10,2)) AS DOUBLE) AS price,
             CASE WHEN op = 'd' THEN b_stock ELSE a_stock END AS stock,
             coalesce(CASE WHEN op = 'd' THEN b_category ELSE a_category END, '(none)') AS category,
             (op = 'd') AS __deleted
      FROM cdc_events_v2
    ),
    ranked AS (
      -- same full tie-break as _COMPACT_ORACLE (the v1/v2 shared history
      -- contains the same-SCN delete->re-insert at scn=165)
      SELECT *, row_number() OVER (
        PARTITION BY id
        ORDER BY scn DESC, ssn DESC NULLS LAST,
                 CASE WHEN op = 'd' THEN 2 WHEN op = 'u' THEN 1 ELSE 0 END DESC,
                 rowid DESC
      ) AS rn
      FROM unwrapped
    )
    SELECT id, name, price, stock, category
    FROM ranked WHERE rn = 1 AND NOT __deleted
    ORDER BY id
    """,
    tags=("cdc",),
)
def q50b_envelope_evolved(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R10/R16: additive schema evolution mid-stream.

    The registry pins decode versions the way the reference's Schema
    Registry does (/root/reference/docker-compose-main.yml:97-119): v1 DDL
    is registered, the additive v2 DDL (appended ``category``) registers as
    version 2, and the FULL history — v1 wire events without the key plus
    v2 events with it — re-parses under the CURRENT schema. Old events
    surface NULL category (auto.evolve, README.md:843); compaction yields
    the evolved final state.
    """
    import tempfile

    from olr_cdc_oracle_with_dbz_spark.cdc.schema_registry import SchemaRegistry

    with tempfile.TemporaryDirectory() as root:
        reg = SchemaRegistry(root, "olr_db.product")
        v1 = reg.register(fixtures.ENVELOPE_SCHEMA)
        v2 = reg.register(fixtures.ENVELOPE_SCHEMA_V2)
        assert reg.is_additive(v1, v2), "category append must be auto.evolve-safe"
        ddl = reg.current()
    raw = _lit_lines(spark, fixtures.json_lines_v2())
    env = E.source_filter(E.parse_envelope(raw, schema=ddl))
    flat = E.unwrap(env, extra_cols=("category",))
    final = E.compact_latest(flat)
    return final.select(
        "id",
        "name",
        F.col("price").cast("double").alias("price"),
        "stock",
        F.coalesce(F.col("category"), F.lit("(none)")).alias("category"),
    ).transform(ordered, "id")

"""Golden CDC fixture: a deterministic Debezium-envelope event history.

Mirrors the reference's verification DML (/root/reference/README.md:862-874 —
INSERT → UPDATE price → DELETE on ``olr_db.product``) plus the edge cases
from FIXTURES.md §1.3: snapshot reads, re-insert-after-delete, two updates in
one transaction, explicit NULL update, and a same-SCN delete→re-insert
inside one transaction (ordered by ``ssn``, the intra-transaction sequence
Debezium's Oracle source emits — the reference preserves log order via
``tasks.max=1``, README.md:805; we re-derive it from (scn, ssn)). SCN
increases per commit (scn-type flag,
/root/reference/scripts/OpenLogReplicator.json:24), xid/rid carried per
event (:26, :21), price shipped as STRING
(``decimal.handling.mode: "string"``, /root/reference/README.md:823).

One literal history, three renderings:
* :data:`EVENTS` — python dicts (ground truth)
* :func:`json_lines` — Debezium-JSON strings (streaming/file-source input)
* :func:`duckdb_values` — a DuckDB VALUES relation for oracle SQL
"""

from __future__ import annotations

import json

# (scn, txid, rowid, op, ts_ms, before, after); row = (id, name, desc, price,
# stock, created_ms, updated_ms). Timestamps are epoch millis (Debezium wire
# form for adaptive time precision).
_T0 = 1704096000000  # 2024-01-01 08:00:00 UTC

ROW1 = (1, "Widget", "Basic widget", "19.99", 100, _T0, _T0)
ROW2 = (2, "Gadget", "Handy gadget", "29.99", 50, _T0, _T0)
ROW3 = (3, "Doohickey", None, "9.99", 5, _T0, _T0)
ROW4A = (4, "Test Product", "A test product", "99.99", 10, _T0 + 3600_000, _T0 + 3600_000)
ROW4B = (4, "Test Product", "A test product", "149.99", 10, _T0 + 3600_000, _T0 + 7200_000)
ROW4C = (4, "Test Product v2", "Re-inserted", "79.99", 7, _T0 + 10800_000, _T0 + 10800_000)
ROW2B = (2, "Gadget", "Handy gadget", "29.99", 45, _T0, _T0 + 9000_000)
ROW2C = (2, "Gadget", "Handy gadget", "27.99", 40, _T0, _T0 + 9000_000)
ROW3B = (3, "Doohickey Pro", None, "9.99", 5, _T0, _T0 + 12600_000)
ROW1X = (1, "Widget X", "Replaced in-txn", "24.99", 60, _T0 + 16200_000, _T0 + 16200_000)

EVENTS: list[dict] = [
    # initial snapshot (snapshot.mode=initial, README.md:822)
    dict(scn=100, txid=None, rowid="AAA0x1", op="r", before=None, after=ROW1),
    dict(scn=101, txid=None, rowid="AAA0x2", op="r", before=None, after=ROW2),
    dict(scn=102, txid=None, rowid="AAA0x3", op="r", before=None, after=ROW3),
    # README.md:863-865 insert
    dict(scn=110, txid="T1", rowid="AAA0x4", op="c", before=None, after=ROW4A),
    # README.md:868-869 price update
    dict(scn=120, txid="T2", rowid="AAA0x4", op="u", before=ROW4A, after=ROW4B),
    # README.md:872-873 delete (before image only — R7 rewrite sources this)
    dict(scn=130, txid="T3", rowid="AAA0x4", op="d", before=ROW4B, after=None),
    # re-insert after delete
    dict(scn=140, txid="T4", rowid="AAA0x5", op="c", before=None, after=ROW4C),
    # two updates in ONE transaction (same txid, two scns) — intra-txn order
    dict(scn=150, txid="T5", rowid="AAA0x2", op="u", before=ROW2, after=ROW2B),
    dict(scn=151, txid="T5", rowid="AAA0x2", op="u", before=ROW2B, after=ROW2C),
    # update keeping a NULL column
    dict(scn=160, txid="T6", rowid="AAA0x3", op="u", before=ROW3, after=ROW3B),
    # delete + re-insert of one key inside ONE transaction: both events
    # commit under the SAME SCN; only ssn (intra-txn sequence) orders them.
    # Without it a d>u>c op-precedence heuristic would wrongly compact this
    # key to 'deleted' (round-2 advice).
    dict(scn=165, ssn=1, txid="T6B", rowid="AAA0x1", op="d", before=ROW1, after=None),
    dict(scn=165, ssn=2, txid="T6B", rowid="AAA0x1", op="c", before=None, after=ROW1X),
]

_COLS = ("id", "name", "description", "price", "stock", "created_date", "updated_date")

#: Final state after upsert/delete compaction (R8/R9) — the golden result.
EXPECTED_FINAL = [ROW1X, ROW2C, ROW3B, ROW4C]


def _row_obj(row: tuple | None, cols: tuple[str, ...] = _COLS) -> dict | None:
    return None if row is None else dict(zip(cols, row))


def json_lines() -> list[str]:
    """The history as Debezium-JSON strings (file/Kafka wire form)."""
    out = []
    for e in EVENTS:
        out.append(
            json.dumps(
                {
                    "before": _row_obj(e["before"]),
                    "after": _row_obj(e["after"]),
                    "op": e["op"],
                    "ts_ms": e["scn"] * 1000 + 1_700_000_000_000,
                    "source": {
                        "scn": e["scn"],
                        "ssn": e.get("ssn"),
                        "txId": e["txid"],
                        "rowId": e["rowid"],
                        "schema": "OLR_DB",
                        "table": "PRODUCT",
                        "ts_ms": e["scn"] * 1000 + 1_700_000_000_000,
                    },
                },
                sort_keys=True,
            )
        )
    return out


ENVELOPE_SCHEMA = """
    before struct<id:bigint, name:string, description:string, price:string,
                  stock:int, created_date:bigint, updated_date:bigint>,
    after  struct<id:bigint, name:string, description:string, price:string,
                  stock:int, created_date:bigint, updated_date:bigint>,
    op string,
    ts_ms bigint,
    source struct<scn:bigint, ssn:bigint, txId:string, rowId:string,
                  schema:string, table:string, ts_ms:bigint>
"""


def _sql_lit(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    return str(v)


def duckdb_values(name: str = "cdc_events") -> str:
    """A WITH-clause relation of the flattened history for oracle SQL.

    Columns: scn, txid, rowid, op, b_* (before image), a_* (after image);
    timestamps as epoch-millis BIGINT (converted with ``epoch_ms``).
    """
    rows = []
    for e in EVENTS:
        b = e["before"] or (None,) * 7
        a = e["after"] or (None,) * 7
        vals = [e["scn"], e.get("ssn"), e["txid"], e["rowid"], e["op"], *b, *a]
        rows.append("(" + ", ".join(_sql_lit(v) for v in vals) + ")")
    cols = (
        "scn, ssn, txid, rowid, op, "
        "b_id, b_name, b_description, b_price, b_stock, b_created, b_updated, "
        "a_id, a_name, a_description, a_price, a_stock, a_created, a_updated"
    )
    return f"{name}({cols}) AS (SELECT * FROM (VALUES\n  " + ",\n  ".join(rows) + "\n))"


# --- R10/R16 additive evolution: schema v2 APPENDS a ``category`` column ---
# (auto.evolve contract: old events re-parse under v2 with NULL category;
# the sink table evolves additively — /root/reference/README.md:843
# ``auto.evolve: true``.)

_COLS_V2 = _COLS + ("category",)

ROW1B = (1, "Widget", "Basic widget", "21.99", 95, _T0, _T0 + 14400_000, "tools")
ROW5 = (5, "Gizmo", "Post-evolution insert", "49.99", 20, _T0 + 14400_000, _T0 + 14400_000, "gadgets")

#: Events committed AFTER the DDL that added ``category`` (schema v2).
EVENTS_V2: list[dict] = [
    dict(scn=170, txid="T7", rowid="AAA0x1", op="u", before=ROW1X + (None,), after=ROW1B),
    dict(scn=171, txid="T8", rowid="AAA0x6", op="c", before=None, after=ROW5),
]

ENVELOPE_SCHEMA_V2 = """
    before struct<id:bigint, name:string, description:string, price:string,
                  stock:int, created_date:bigint, updated_date:bigint,
                  category:string>,
    after  struct<id:bigint, name:string, description:string, price:string,
                  stock:int, created_date:bigint, updated_date:bigint,
                  category:string>,
    op string,
    ts_ms bigint,
    source struct<scn:bigint, ssn:bigint, txId:string, rowId:string,
                  schema:string, table:string, ts_ms:bigint>
"""


def json_lines_v2() -> list[str]:
    """The FULL evolved history: v1 wire events (no category key) followed
    by v2 wire events (category present) — what a topic actually holds
    after an additive DDL mid-stream."""
    out = list(json_lines())
    for e in EVENTS_V2:
        out.append(
            json.dumps(
                {
                    "before": _row_obj(e["before"], _COLS_V2),
                    "after": _row_obj(e["after"], _COLS_V2),
                    "op": e["op"],
                    "ts_ms": e["scn"] * 1000 + 1_700_000_000_000,
                    "source": {
                        "scn": e["scn"],
                        "ssn": e.get("ssn"),
                        "txId": e["txid"],
                        "rowId": e["rowid"],
                        "schema": "OLR_DB",
                        "table": "PRODUCT",
                        "ts_ms": e["scn"] * 1000 + 1_700_000_000_000,
                    },
                },
                sort_keys=True,
            )
        )
    return out


def duckdb_values_v2(name: str = "cdc_events_v2") -> str:
    """Flattened evolved history for oracle SQL (v1 rows: category NULL)."""
    rows = []
    for e in EVENTS + EVENTS_V2:
        b = e["before"] or (None,) * 8
        a = e["after"] or (None,) * 8
        b = tuple(b) + (None,) * (8 - len(b))
        a = tuple(a) + (None,) * (8 - len(a))
        vals = [e["scn"], e.get("ssn"), e["txid"], e["rowid"], e["op"], *b, *a]
        rows.append("(" + ", ".join(_sql_lit(v) for v in vals) + ")")
    cols = (
        "scn, ssn, txid, rowid, op, "
        "b_id, b_name, b_description, b_price, b_stock, b_created, b_updated, b_category, "
        "a_id, a_name, a_description, a_price, a_stock, a_created, a_updated, a_category"
    )
    return f"{name}({cols}) AS (SELECT * FROM (VALUES\n  " + ",\n  ".join(rows) + "\n))"

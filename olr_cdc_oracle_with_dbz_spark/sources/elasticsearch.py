"""Elasticsearch sink (reference R12 — installed, not configured).

The reference bakes kafka-connect-elasticsearch 14.1.2 into its Connect
image without wiring a connector config (/root/reference/Dockerfile:62-63).
The engine ships both halves: the document-formatting (pure, tested) and a
stdlib-urllib bulk transport — each partition POSTs its actions to
``/_bulk`` in chunks, so no ES client library is required. Verified
against a stdlib ``http.server`` mock in tests/test_sources.py.

At 100 TB the transport would normally be the official
``elasticsearch-spark`` / ES-Hadoop connector (``df.write.format("es")``),
but the shape is the same as here: bulk-batched per partition (no
driver-side funnel), id-keyed for idempotent upsert, delete actions for
tombstones.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def es_bulk_payload(
    df: DataFrame,
    index: str,
    id_col: str,
    deleted_flag: str = "__deleted",
    on_null_id: str = "error",
) -> DataFrame:
    """Render each row as an ES bulk-API action+source pair (one string).

    Upserts become ``index`` actions keyed by ``id_col`` (idempotent —
    replaying a micro-batch rewrites the same doc ids); deletes become
    ``delete`` actions — the R9 delete-propagation contract, ES form.

    The action-metadata line is rendered with ``to_json`` over a struct,
    never by string concatenation: a string id (or index name) containing
    a quote or backslash would otherwise produce malformed NDJSON and ES
    rejects the whole ``_bulk`` request with a 400, wedging the stream on
    retry (r15 code-review).

    A null ``id_col`` must not reach rendering: ``to_json`` omits null
    struct fields, so a null id would yield an ``index`` action with no
    ``_id`` (ES auto-generates one — silently breaking idempotent
    micro-batch replay with duplicate docs) and a ``delete`` action with
    no ``_id`` (400-fails the whole ``_bulk`` request) (r15 ADVICE).
    ``on_null_id="error"`` (default) raises executor-side via
    ``raise_error`` — fail fast, whole-stage-codegen friendly, no extra
    pass over the data. ``on_null_id="drop"`` excludes those rows; the
    caller is then responsible for diverting
    ``df.filter(F.col(id_col).isNull())`` to a dead-letter stream first.
    """
    id_str = F.col(id_col).cast("string")
    if on_null_id == "error":
        id_str = F.when(
            id_str.isNull(),
            F.raise_error(
                F.lit(
                    f"es_bulk_payload: null {id_col!r} — cannot render an "
                    "id-keyed bulk action (would break idempotent replay); "
                    "divert null-id rows or use on_null_id='drop'"
                )
            ),
        ).otherwise(id_str)
    elif on_null_id == "drop":
        df = df.filter(F.col(id_col).isNotNull())
    else:
        raise ValueError(f"on_null_id must be 'error' or 'drop', got {on_null_id!r}")
    meta = F.struct(
        F.lit(index).alias("_index"),
        id_str.alias("_id"),
    )
    action = F.when(
        F.col(deleted_flag),
        F.concat(F.lit('{"delete":'), F.to_json(meta), F.lit("}")),
    ).otherwise(
        F.concat(
            F.lit('{"index":'),
            F.to_json(meta),
            F.lit("}\n"),
            F.to_json(F.struct(*[c for c in df.columns if c != deleted_flag])),
        )
    )
    return df.select(
        F.col(id_col).alias("_id"), F.col(deleted_flag), action.alias("bulk")
    )


def es_sink(
    index: str,
    id_col: str,
    hosts: str = "localhost:9200",
    batch_actions: int = 1000,
    timeout_sec: float = 30.0,
    deleted_flag: str = "__deleted",
    on_null_id: str = "error",
):
    """foreachBatch ES sink: bulk POST per partition via stdlib urllib.

    Each PARTITION opens its own connection and flushes ``batch_actions``
    NDJSON lines per ``POST /_bulk`` — executor-side fan-out with no
    driver funnel, the same topology as the ES-Hadoop connector. A
    response with ``"errors": true`` (or a transport failure) raises, so
    Structured Streaming retries the micro-batch; actions are id-keyed
    index/delete ops, making the retry idempotent.

    ``on_null_id`` passes through to :func:`es_bulk_payload` (r16
    review): the default ``"error"`` fails the micro-batch on a null id
    — right for sources whose key is a real PK — but a stream that can
    legitimately carry null ids would wedge in a raise/retry loop, so
    such callers pass ``"drop"`` and divert
    ``batch.filter(F.col(id_col).isNull())`` to a dead-letter sink in a
    wrapping foreachBatch of their own.
    """
    url = f"http://{hosts}/_bulk"

    def post_partition(rows) -> None:
        import urllib.request

        buf: list[str] = []

        def flush() -> None:
            if not buf:
                return
            data = ("\n".join(buf) + "\n").encode("utf-8")
            req = urllib.request.Request(
                url,
                data=data,
                headers={"Content-Type": "application/x-ndjson"},
                method="POST",
            )
            with urllib.request.urlopen(req, timeout=timeout_sec) as resp:
                body = json.loads(resp.read().decode("utf-8"))
            if body.get("errors"):
                failed = [
                    it
                    for it in body.get("items", [])
                    for op in it.values()
                    if int(op.get("status", 200)) >= 300
                ]
                raise RuntimeError(f"ES bulk reported errors: {failed[:5]}")
            buf.clear()

        for row in rows:
            buf.append(row["bulk"])
            if len(buf) >= batch_actions:
                flush()
        flush()

    def fn(batch: DataFrame, batch_id: int) -> None:
        es_bulk_payload(batch, index, id_col, deleted_flag, on_null_id).select(
            "bulk"
        ).foreachPartition(post_partition)

    return fn


def parse_bulk_line(line: str) -> dict:
    """Test helper: decode one rendered bulk action back to a dict."""
    parts = line.split("\n")
    out = json.loads(parts[0])
    if len(parts) > 1:
        out["_source"] = json.loads(parts[1])
    return out

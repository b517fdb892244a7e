"""Elasticsearch sink (reference R12 — installed, not configured).

The reference bakes kafka-connect-elasticsearch 14.1.2 into its Connect
image without wiring a connector config (/root/reference/Dockerfile:62-63).
Mirroring that status: the engine ships the document-formatting half (pure,
tested) and stubs the HTTP transport (no ES client in this container).

At scale the transport would be the official ``elasticsearch-spark`` /
ES-Hadoop connector (``df.write.format("es")``) — bulk-batched per
partition, id-keyed for idempotent upsert, exactly the document shape
produced here.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def es_bulk_payload(df: DataFrame, index: str, id_col: str, deleted_flag: str = "__deleted") -> DataFrame:
    """Render each row as an ES bulk-API action+source pair (one string).

    Upserts become ``index`` actions keyed by ``id_col`` (idempotent —
    replaying a micro-batch rewrites the same doc ids); deletes become
    ``delete`` actions — the R9 delete-propagation contract, ES form.
    """
    action = F.when(
        F.col(deleted_flag),
        F.concat(
            F.lit('{"delete":{"_index":"' + index + '","_id":"'),
            F.col(id_col).cast("string"),
            F.lit('"}}'),
        ),
    ).otherwise(
        F.concat(
            F.lit('{"index":{"_index":"' + index + '","_id":"'),
            F.col(id_col).cast("string"),
            F.lit('"}}\n'),
            F.to_json(F.struct(*[c for c in df.columns if c != deleted_flag])),
        )
    )
    return df.select(
        F.col(id_col).alias("_id"), F.col(deleted_flag), action.alias("bulk")
    )


def es_sink(index: str, id_col: str, hosts: str = "localhost:9200"):
    """foreachBatch stub: formats the bulk payload, then raises — the HTTP
    POST to ``/_bulk`` needs an ES client/connector not present here."""

    def fn(batch: DataFrame, batch_id: int) -> None:
        payload = es_bulk_payload(batch, index, id_col)
        n = payload.count()
        raise NotImplementedError(
            f"ES transport not available in this environment: would POST "
            f"{n} bulk actions for batch {batch_id} to http://{hosts}/_bulk "
            f"(connector parity: /root/reference/Dockerfile:62-63)"
        )

    return fn


def parse_bulk_line(line: str) -> dict:
    """Test helper: decode one rendered bulk action back to a dict."""
    parts = line.split("\n")
    out = json.loads(parts[0])
    if len(parts) > 1:
        out["_source"] = json.loads(parts[1])
    return out

"""Pipeline health/observability (reference R21 → StreamingQueryListener).

The reference watches pipeline health through container healthchecks and
connector REST status (/root/reference/docker-compose-orl.yml:24-29,
README.md:897-902). The Spark-native form: a ``StreamingQueryListener``
accumulating per-batch progress (rows, duration, state size) plus a
point-in-time ``health()`` snapshot equivalent to ``GET /connectors/x/status``.

At scale this listener is the hook where progress metrics ship to the
metrics system; the dataflow (query → progress events → sink) is identical.
"""

from __future__ import annotations

import json
from collections import deque
from dataclasses import dataclass, field

from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.streaming.listener import StreamingQueryListener


@dataclass
class BatchStats:
    batch_id: int
    num_input_rows: int
    duration_ms: int
    sink_description: str


@dataclass
class PipelineMonitor(StreamingQueryListener):
    """Accumulates micro-batch progress for every query on the session.

    ``batches`` keeps only the most recent ``max_batches`` entries (a
    listener on a continuous query lives as long as the driver — an
    unbounded list is a slow heap leak at a per-seconds trigger cadence);
    the row total is maintained as a running counter so ``total_rows()``
    stays exact over the full history at O(1) memory (r15 code-review).
    """

    max_batches: int = 1024
    batches: deque = field(default_factory=deque)
    started: list[str] = field(default_factory=list)
    terminated: list[tuple[str, str | None]] = field(default_factory=list)
    _rows_total: int = 0

    def __post_init__(self) -> None:
        self.batches = deque(self.batches, maxlen=self.max_batches)

    # -- listener callbacks -------------------------------------------------
    def onQueryStarted(self, event) -> None:
        self.started.append(str(event.id))

    def onQueryProgress(self, event) -> None:
        p = event.progress
        self._rows_total += p.numInputRows
        self.batches.append(
            BatchStats(
                batch_id=p.batchId,
                num_input_rows=p.numInputRows,
                duration_ms=(p.durationMs or {}).get("triggerExecution", 0),
                sink_description=p.sink.description if p.sink else "",
            )
        )

    def onQueryTerminated(self, event) -> None:
        self.terminated.append((str(event.id), event.exception))

    def onQueryIdle(self, event) -> None:  # pragma: no cover - timing-dependent
        pass

    # -- aggregate views ----------------------------------------------------
    def total_rows(self) -> int:
        """Rows across ALL observed batches (running counter — exact even
        after old entries rotate out of the bounded ``batches`` window)."""
        return self._rows_total

    def failed(self) -> list[tuple[str, str | None]]:
        return [(qid, exc) for qid, exc in self.terminated if exc is not None]


def health(query: StreamingQuery) -> dict:
    """Connector-REST-status equivalent for one running query."""
    lp = query.lastProgress or {}
    if hasattr(lp, "json"):  # Spark 4 returns StreamingQueryProgress
        lp = json.loads(lp.json)
    return {
        "id": str(query.id),
        "name": query.name,
        "active": query.isActive,
        "state": ("RUNNING" if query.isActive else "FINISHED"),
        "message": query.status.get("message", "")
        if isinstance(query.status, dict)
        else str(query.status),
        "last_batch_rows": lp.get("numInputRows"),
        "exception": query.exception().desc if query.exception() else None,
    }

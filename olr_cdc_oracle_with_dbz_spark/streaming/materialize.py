"""Keyed upsert materialization sink (reference R8–R11 → foreachBatch MERGE).

The reference materializes the Kafka change stream into Postgres with a JDBC
sink in upsert mode + delete propagation (/root/reference/README.md:839-845).
The Spark-native equivalent is ``writeStream.foreachBatch`` running a keyed
MERGE per micro-batch into a table the rest of the engine can query.

This local build has no Delta/Iceberg jars, so the table is a **versioned
parquet directory with an atomic pointer swap** — same MERGE semantics,
lakehouse-format-free:

    table_dir/
      _CURRENT            # text file: name of the live version dir
      v00000000000042/    # parquet snapshot written by batch 42

On a cluster this class swaps its ``_merge_and_write`` for
``DeltaTable.merge(...).whenMatchedUpdate/Delete.whenNotMatchedInsert`` —
the dataflow (dedup latest per key by SCN → merge) is identical.

Exactly-once: foreachBatch may replay a batch after failure; the merge is
idempotent (latest-SCN-wins is a deterministic function of {current state ∪
batch}), and the version dir is keyed by batch id, so replays overwrite
rather than duplicate — together with the checkpoint offset log this gives
the reference's effective exactly-once contract (R15).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from olr_cdc_oracle_with_dbz_spark.cdc.envelope import PK, compact_latest, unwrap

_CURRENT = "_CURRENT"


class ParquetUpsertTable:
    """A queryable keyed table maintained by micro-batch MERGE."""

    def __init__(
        self,
        spark: SparkSession,
        table_dir: str,
        key: str = PK,
        extra_cols: tuple[str, ...] = (),
    ):
        """``extra_cols``: evolved image columns to carry through unwrap —
        the R10 auto.evolve path; rows from pre-evolution events surface
        NULL for them, and unionByName(allowMissingColumns) inside the
        merge evolves the existing table additively."""
        self.spark = spark
        self.table_dir = table_dir
        self.key = key
        self.extra_cols = extra_cols
        os.makedirs(table_dir, exist_ok=True)

    # -- read side ---------------------------------------------------------
    def current_version(self) -> str | None:
        ptr = os.path.join(self.table_dir, _CURRENT)
        if not os.path.exists(ptr):
            return None
        with open(ptr) as f:
            v = f.read().strip()
        return v or None

    def read(self, version: str | None = None) -> DataFrame | None:
        """Read the live version, or time-travel to any retained version.

        Every micro-batch MERGE writes a full new version dir and flips the
        pointer, so history is retained until vacuumed — the same contract
        Delta's transaction log provides (``VERSION AS OF``), here with
        directory granularity.
        """
        v = version or self.current_version()
        if v is None:
            return None
        return self.spark.read.parquet(os.path.join(self.table_dir, v))

    def versions(self) -> list[str]:
        """All retained versions, oldest→newest (batch id order)."""
        return sorted(
            d for d in os.listdir(self.table_dir) if d.startswith("v")
        )

    def vacuum(self, keep: int = 2) -> list[str]:
        """Drop all but the newest ``keep`` versions (never the live one)."""
        import shutil

        live = self.current_version()
        victims = [v for v in self.versions()[:-keep] if v != live]
        for v in victims:
            shutil.rmtree(os.path.join(self.table_dir, v), ignore_errors=True)
        return victims

    # -- write side --------------------------------------------------------
    def merge_batch(self, unwrapped: DataFrame, batch_id: int) -> None:
        """MERGE: latest event per key wins; deletes drop rows (R8/R9)."""
        current = self.read()
        if current is not None:
            # current rows keep the _scn they were materialized at, so a
            # replayed/late older event can never overwrite newer state;
            # they are live rows, hence __deleted=false.
            base = current.withColumn("__deleted", F.lit(False))
            merged_src = base.unionByName(unwrapped, allowMissingColumns=True)
        else:
            merged_src = unwrapped
        new_state = compact_latest(merged_src, self.key)
        vdir = f"v{batch_id:020d}"
        out = os.path.join(self.table_dir, vdir)
        new_state.write.mode("overwrite").parquet(out)
        tmp = os.path.join(self.table_dir, f"{_CURRENT}.tmp")
        with open(tmp, "w") as f:
            f.write(vdir)
        os.replace(tmp, os.path.join(self.table_dir, _CURRENT))  # atomic swap

    def compact(self, target_partitions: int = 8) -> None:
        """Major compaction: rewrite the live version sorted by key.

        Micro-batch MERGEs leave the table fragmented and unordered; the
        scheduled major compaction re-sorts by PK and bounds file count so
        point lookups prune via min/max stats and scans stay wide-split
        (SCALE.md §5). Same atomic pointer swap as a merge — readers never
        see a half-written version; a concurrent merge that lands after
        the rewrite simply supersedes it.
        """
        current = self.read()
        if current is None:
            return
        vdir = f"{self.current_version()}c"  # e.g. v...042 -> v...042c
        out = os.path.join(self.table_dir, vdir)
        (
            current.repartitionByRange(target_partitions, self.key)
            .sortWithinPartitions(self.key)
            .write.mode("overwrite")
            .parquet(out)
        )
        tmp = os.path.join(self.table_dir, f"{_CURRENT}.tmp")
        with open(tmp, "w") as f:
            f.write(vdir)
        os.replace(tmp, os.path.join(self.table_dir, _CURRENT))

    def foreach_batch(self):
        """The function handed to ``writeStream.foreachBatch``."""

        def fn(env_batch: DataFrame, batch_id: int) -> None:
            # per-batch: unwrap envelope rows, then keyed merge. Keeping the
            # state columns (_scn) in the table makes replay idempotent and
            # preserves the total order for the next merge.
            self.merge_batch(unwrap(env_batch, self.extra_cols), batch_id)

        return fn


def materialize_stream(
    env_stream: DataFrame,
    table: ParquetUpsertTable,
    checkpoint_dir: str,
    trigger_once: bool = True,
) -> StreamingQuery:
    """Run the envelope stream into the upsert table (S1/S7).

    ``checkpointLocation`` provides the OLR-checkpoint-equivalent resume
    contract: offsets of consumed source files + commit log of completed
    batches (R15).
    """
    writer = (
        env_stream.writeStream.outputMode("update")
        .foreachBatch(table.foreach_batch())
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()

"""Table-layout operators: partitioned and bucketed at-rest storage.

SCALE.md §1's cluster-ingest claims, as code:

* **Partitioned writes** — fact tables partition by a date/key column so
  predicates prune whole directories before any I/O (`PartitionFilters`
  in the scan, distinct from row-group pruning).
* **Bucketed writes** — co-bucketing two fact tables on the join key
  removes the join's shuffle entirely (`SortMergeJoin` with no
  `Exchange`): the dominant TPC-H-shaped cost at 100 TB.

Both are plan-shape-tested in tests/test_storage.py; the bench testdata
itself stays unpartitioned because the driver owns those files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], sort_col: str | None = None
) -> None:
    """Write a partitioned parquet table (dir-per-partition-value).

    ``sort_col`` additionally orders rows inside each file so min/max
    zone maps prune row groups under point/range predicates — the
    two-level pruning stack (partition dir → row group)."""
    w = df
    if sort_col is not None:
        w = df.repartition(*[df[c] for c in partition_cols]).sortWithinPartitions(
            sort_col
        )
    w.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    buckets: int = 16,
    path: str | None = None,
) -> None:
    """Persist as a bucketed, bucket-sorted catalog table.

    Joins/aggregations on ``bucket_col`` between tables sharing the same
    bucket count read co-located buckets directly — no exchange. At
    100 TB this is the difference between shuffling both fact tables per
    query and never shuffling them at all.
    """
    w = df.write.bucketBy(buckets, bucket_col).sortBy(bucket_col).mode("overwrite")
    if path is not None:  # external table; else managed under the warehouse dir
        w = w.option("path", path)
    w.saveAsTable(table_name)


def zorder_key(cols: list, bits: int = 16):
    """Interleaved-bit (Morton) key over normalized rank columns.

    Sorting by this key clusters rows so that range predicates on ANY of
    the participating columns hit few row groups — the multi-dimensional
    generalization of single-key sorting (Delta's OPTIMIZE ZORDER BY).
    Inputs must be pre-normalized to integer ranks in [0, 2^bits).
    """
    from pyspark.sql import functions as F

    key = F.lit(0).cast("long")
    for b in range(bits):
        for i, c in enumerate(cols):
            col = F.col(c) if isinstance(c, str) else c
            bit = F.shiftright(col.cast("long"), b).bitwiseAND(F.lit(1))
            key = key.bitwiseOR(
                F.shiftleft(bit, b * len(cols) + i).cast("long")
            )
    return key


def write_zordered(
    df: DataFrame, path: str, cols: list[str], files: int = 8, bits: int = 10
) -> None:
    """Write parquet clustered by a Z-order key over ``cols``.

    Columns are rank-normalized with ``ntile`` (robust to skew), Morton-
    interleaved, and the data is range-partitioned + sorted by the key.
    Row-group min/max stats on the ORIGINAL columns then prune under
    predicates on either column — verified in tests/test_storage.py.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    n_tiles = 1 << bits
    ranked = df
    rank_cols = []
    for c in cols:
        rc = f"_z_{c}"
        ranked = ranked.withColumn(
            rc, F.ntile(n_tiles).over(Window.orderBy(c)) - 1
        )
        rank_cols.append(rc)
    keyed = ranked.withColumn("_zkey", zorder_key(rank_cols, bits))
    (
        keyed.repartitionByRange(files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey", *rank_cols)
        .write.mode("overwrite")
        .parquet(path)
    )


def bucketed_fact_join(
    spark: SparkSession, left_table: str, right_table: str, left_key: str, right_key: str
) -> DataFrame:
    """Join two co-bucketed fact tables on their bucket keys."""
    lt = spark.table(left_table)
    rt = spark.table(right_table)
    return lt.join(rt, lt[left_key] == rt[right_key])


def ensure_cobucketed_facts(
    spark: SparkSession, sf_dir: str, buckets: int = 16
) -> tuple[DataFrame, DataFrame]:
    """(lineitem, orders) as co-bucketed catalog tables on the order key.

    The one-time layout write is the INGEST cost a lakehouse pays once
    (SCALE.md §1) so that every subsequent fact-fact join on the bucket
    key reads co-located buckets with NO exchange on either side — at
    100 TB the difference between shuffling both fact tables per query
    and never shuffling them. Tables are cached per (session, sf_dir):
    re-entry within a session is metadata-only. Spark's in-memory catalog
    cannot re-attach bucketing metadata to existing files across
    sessions, so a fresh session re-writes — on a cluster the metastore
    makes this genuinely once."""
    import getpass
    import hashlib
    import os
    import shutil
    import tempfile

    digest = hashlib.md5(sf_dir.rstrip("/").encode()).hexdigest()[:10]
    li_name, o_name = f"li_b_{digest}", f"o_b_{digest}"
    # per-user root (ADVICE r8): a fixed shared /tmp path collides with
    # another user's dir (permission failure) on multi-tenant hosts
    user = getpass.getuser()
    root = f"{tempfile.gettempdir()}/olr-bucketed-{user}/{digest}"
    # trust the in-memory catalog only while the files it points at still
    # exist — a tmp reaper can delete them mid-session (ADVICE r8)
    have = spark.catalog.tableExists(li_name) and spark.catalog.tableExists(o_name)
    if have:
        have = all(
            os.path.isdir(f"{root}/{n}") and os.listdir(f"{root}/{n}")
            for n in (li_name, o_name)
        )
    if not have:
        from pyspark.sql import functions as F

        from olr_cdc_oracle_with_dbz_spark.catalog import Catalog

        cat = Catalog(spark, sf_dir)
        # one file per bucket: pre-cluster rows into their bucket before
        # the write, so each bucket's rows sit in one task → one file,
        # and the reader can use the per-file sort order
        for src, name, key in (
            (cat.lineitem, li_name, "l_orderkey"),
            (cat.orders, o_name, "o_orderkey"),
        ):
            path = f"{root}/{name}"
            # a previous SESSION may have left files without catalog
            # metadata (bucketing info lives only in the catalog) —
            # saveAsTable refuses an existing location, so clear it
            spark.sql(f"DROP TABLE IF EXISTS {name}")
            shutil.rmtree(path, ignore_errors=True)
            clustered = src.repartition(buckets, F.col(key))
            write_bucketed(clustered, name, key, buckets=buckets, path=path)
    return spark.table(li_name), spark.table(o_name)

"""Storage-layout ingest: rewrite parquet for scan parallelism.

An engine owns its storage layout. The driver's testdata files are written
as a **single parquet row group** per table; Spark parallelizes parquet
scans at row-group granularity, so every scan of such a file decodes on
one core no matter the cluster size — the layout, not the plan, caps
throughput. (This is exactly the 100 TB lesson in miniature: badly sized
row groups serialize a 1000-executor cluster the same way.)

:func:`optimize_dir` ingests a testdata directory into a mirror with
row groups sized so a full-table scan can use every core. Values, schema,
and row order are byte-identical — only the row-group framing changes —
so results are unaffected; correctness runs read the original files.

The mirror is content-addressed by (source path, mtime, size): stale or
missing mirrors rebuild on demand, repeat calls are free.

Production shape of this module: the ingest path of the lakehouse —
partitioned, sorted, compacted writes (`repartition(N).sortWithinPartitions
(key)` → parquet/Delta with 128 MB row groups + min/max zone maps).
"""

from __future__ import annotations

import json
import os

import pyarrow.parquet as pq

#: target tasks per full-table scan at bench scale
_TARGET_GROUPS = 32
_MIN_ROWS_PER_GROUP = 4096


def _fingerprint(path: str) -> dict:
    st = os.stat(path)
    return {"src": os.path.abspath(path), "mtime": st.st_mtime, "size": st.st_size}


def optimize_file(src: str, dst: str, target_groups: int = _TARGET_GROUPS) -> str:
    """Rewrite one parquet file with scan-parallel row groups (idempotent)."""
    meta_path = dst + ".meta.json"
    fp = _fingerprint(src)
    if os.path.exists(dst) and os.path.exists(meta_path):
        with open(meta_path) as f:
            if json.load(f) == fp:
                return dst
    table = pq.read_table(src)
    rows_per_group = max(len(table) // target_groups, _MIN_ROWS_PER_GROUP)
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    tmp = dst + ".tmp"
    pq.write_table(table, tmp, row_group_size=rows_per_group)
    os.replace(tmp, dst)
    with open(meta_path, "w") as f:
        json.dump(fp, f)
    return dst


def optimize_dir(
    src_dir: str,
    cache_root: str = "/tmp/spark-graft-layout",
    target_groups: int = _TARGET_GROUPS,
) -> str:
    """Mirror every ``*.parquet`` in ``src_dir`` with optimized layout."""
    src_dir = src_dir.rstrip("/")
    dst_dir = os.path.join(cache_root, src_dir.strip("/").replace("/", "_"))
    for fname in sorted(os.listdir(src_dir)):
        if fname.endswith(".parquet"):
            optimize_file(
                os.path.join(src_dir, fname),
                os.path.join(dst_dir, fname),
                target_groups,
            )
    return dst_dir

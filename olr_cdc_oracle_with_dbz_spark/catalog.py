"""Table catalog over the driver testdata parquet directories.

The reference's "catalog" is its table filter + schema registry
(/root/reference/scripts/OpenLogReplicator.json:32-39,
docker-compose-main.yml:97-119): a fixed set of named, schema'd tables. Here a
:class:`Catalog` binds the well-known table names to parquet files under a
scale-factor directory and registers them as temp views so both the DataFrame
and ``spark.sql`` surfaces see the same relations.

Reading is always ``spark.read.parquet`` (columnar, pushdown-capable); schema
comes from parquet footers — these are static, driver-written files, so footer
schema IS the declared schema (no inferSchema on any streaming path).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Unique sort keys for deterministic output ordering (FIXTURES.md §2).
UNIQUE_KEYS: dict[str, tuple[str, ...]] = {
    "region": ("r_regionkey",),
    "nation": ("n_nationkey",),
    "customer": ("c_custkey",),
    "supplier": ("s_suppkey",),
    "part": ("p_partkey",),
    "orders": ("o_orderkey",),
    "lineitem": ("l_orderkey", "l_linenumber"),
    "events": ("event_id",),
    "documents": ("doc_id",),
    "embeddings": ("vec_id",),
}


#: session-wide DataFrame cache: (session id, dir, table) → DataFrame.
#: A real engine caches catalog metadata; without this every query pays a
#: py4j round-trip + parquet footer read per table reference.
_TABLE_CACHE: dict[tuple[int, str, str], DataFrame] = {}


def normalize_event_ts(df: DataFrame, col: str = "ts") -> DataFrame:
    """Normalize ``events.ts`` across Spark versions.

    The driver writes ``events.ts`` as parquet TIMESTAMP(NANOS).  Spark 3.x
    only reads that under ``spark.sql.legacy.parquet.nanosAsLong`` (BIGINT
    nanos); Spark 4.1+ ignores that conf and reads TIMESTAMP_NTZ natively.
    Callers that need a plain TIMESTAMP for event-time windows must go
    through this helper instead of assuming either dtype.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, TimestampNTZType

    dt = df.schema[col].dataType
    if isinstance(dt, LongType):
        # legacy nanos-as-long read: truncate ns -> µs (same as DuckDB's cast)
        return df.withColumn(col, F.timestamp_micros(F.expr(f"{col} div 1000")))
    if isinstance(dt, TimestampNTZType):
        return df.withColumn(col, F.col(col).cast("timestamp"))
    return df


class Catalog:
    """Lazy table access for one scale-factor directory."""

    def __init__(self, spark: SparkSession, sf_dir: str):
        self.spark = spark
        self.sf_dir = sf_dir.rstrip("/")
        if os.environ.get("SPARK_GRAFT_LAYOUT_CACHE") == "1":
            # Bench path: read through the scan-parallel layout mirror
            # (sources/layout.py) — same bytes, row groups sized so a scan
            # fans out across cores instead of decoding on one.
            from olr_cdc_oracle_with_dbz_spark.sources.layout import optimize_dir

            self.sf_dir = optimize_dir(self.sf_dir)
        self._cache = _TABLE_CACHE
        self._key = (id(spark), self.sf_dir)

    def path(self, name: str) -> str:
        return f"{self.sf_dir}/{name}.parquet"

    def table(self, name: str) -> DataFrame:
        if name not in TABLES:
            raise KeyError(f"unknown table {name!r}; known: {TABLES}")
        key = (*self._key, name)
        if key not in self._cache:
            df = self.spark.read.parquet(self.path(name))
            if name == "events":
                # events.ts is parquet TIMESTAMP(NANOS); Spark reads it as a
                # long (spark.sql.legacy.parquet.nanosAsLong). Truncate to
                # microseconds — same as DuckDB's ns→µs TIMESTAMP cast.
                from pyspark.sql import functions as F
                from pyspark.sql.types import LongType

                if isinstance(df.schema["ts"].dataType, LongType):
                    df = df.withColumn(
                        "ts", F.timestamp_micros(F.expr("ts div 1000"))
                    )
            self._cache[key] = df
        return self._cache[key]

    def __getattr__(self, name: str) -> DataFrame:
        if name in TABLES:
            return self.table(name)
        raise AttributeError(name)

    def register_views(self, names: tuple[str, ...] = TABLES) -> None:
        """Register temp views so ``spark.sql`` queries resolve the tables."""
        for name in names:
            self.table(name).createOrReplaceTempView(name)

    def bounds(self, name: str, column: str | None = None) -> tuple[float, float] | None:
        """(min, max) of ``column`` (default: the table's leading unique
        key) from parquet FOOTER statistics — a driver-side metadata read,
        zero Spark jobs. Feeds :func:`plans.canonical.ordered_static`,
        whose ordering is correct for ANY bounds (monotone clamped
        buckets), so staleness or missing stats (→ ``None``, sampled
        fallback) only affect partition balance, never results. A real
        lakehouse table keeps these in its manifest (Delta/Iceberg
        column stats); parquet footers are the same information one hop
        closer to the file."""
        column = column or UNIQUE_KEYS[name][0]
        return _bounds_cached(self.path(name), column)


#: Keyed on (path, column, files-fingerprint): a rewrite of the parquet
#: files at the same path changes mtime/size and naturally invalidates the
#: entry (ADVICE r8 — the old (sf_dir, table, column) key silently served
#: stale bounds after a rewrite; only balance skew, but invisible).
_BOUNDS_CACHE: dict[tuple, "tuple[float, float] | None"] = {}


def _path_fingerprint(path: str) -> tuple:
    """Cheap identity of the file set at ``path``: (count, total size,
    max mtime_ns). Driver-side stat calls only — no file reads."""
    try:
        if os.path.isdir(path):
            n = sz = mt = 0
            for root, _dirs, names in os.walk(path):
                for f in names:
                    if f.endswith(".parquet"):
                        st = os.stat(os.path.join(root, f))
                        n += 1
                        sz += st.st_size
                        mt = max(mt, st.st_mtime_ns)
            return (n, sz, mt)
        st = os.stat(path)
        return (1, st.st_size, st.st_mtime_ns)
    except OSError:
        return ("missing",)


def _bounds_cached(path: str, column: str) -> "tuple[float, float] | None":
    key = (path, column, _path_fingerprint(path))
    if key not in _BOUNDS_CACHE:
        _BOUNDS_CACHE[key] = _footer_bounds(path, column)
    return _BOUNDS_CACHE[key]


def key_bounds(
    sf_dir: str, table: str, column: str | None = None
) -> tuple[float, float] | None:
    """Module-level :meth:`Catalog.bounds` (same cache) for call sites that
    have ``sf_dir`` in scope but no catalog instance. Reads the ORIGINAL
    file's footers — the layout mirror rewrites identical bytes, so the
    stats are the same either way."""
    column = column or UNIQUE_KEYS[table][0]
    return _bounds_cached(f"{sf_dir.rstrip('/')}/{table}.parquet", column)


_ROWS_CACHE: dict[tuple, int] = {}


def row_count(sf_dir: str, table: str) -> int:
    """Exact row count from parquet FOOTER metadata — a driver-side
    read, zero Spark jobs (same cache policy as :func:`key_bounds`).
    Feeds :func:`plans.canonical.sized_partitions` so exchange widths
    track data volume instead of being a constant that is right at one
    scale factor and wrong at every other."""
    path = f"{sf_dir.rstrip('/')}/{table}.parquet"
    key = (path, _path_fingerprint(path))
    if key not in _ROWS_CACHE:
        try:
            import pyarrow.parquet as pq

            if os.path.isdir(path):
                n = 0
                for root, _dirs, names in os.walk(path):
                    for f in names:
                        if f.endswith(".parquet"):
                            n += pq.ParquetFile(os.path.join(root, f)).metadata.num_rows
            else:
                n = pq.ParquetFile(path).metadata.num_rows
            _ROWS_CACHE[key] = n
        except Exception:
            _ROWS_CACHE[key] = 0
    return _ROWS_CACHE[key]


def _footer_bounds(path: str, column: str) -> tuple[float, float] | None:
    """Scan row-group footer stats of a parquet file-or-directory for the
    global (min, max) of ``column``; ``None`` when any row group lacks
    stats (the caller falls back to Spark's boundary sampler)."""
    import datetime

    try:
        import pyarrow.parquet as pq
    except ImportError:  # pragma: no cover - pyarrow is baked into the env
        return None

    files: list[str] = []
    if os.path.isdir(path):
        for root, _dirs, names in os.walk(path):
            files += [os.path.join(root, n) for n in names if n.endswith(".parquet")]
    else:
        files = [path]
    lo: float | None = None
    hi: float | None = None
    try:
        for f in files:
            md = pq.ParquetFile(f).metadata
            idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
            if column not in idx:
                return None
            ci = idx[column]
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(ci).statistics
                if st is None or not st.has_min_max:
                    return None
                mn, mx = st.min, st.max
                if isinstance(mn, datetime.datetime):
                    # pyarrow returns NAIVE datetimes carrying UTC wall
                    # time; .timestamp() would re-interpret them in the
                    # process's local TZ (ADVICE r8). Pin the epoch math
                    # to UTC so bounds are host-TZ independent.
                    utc = datetime.timezone.utc
                    mn = mn.replace(tzinfo=mn.tzinfo or utc).timestamp()
                    mx = mx.replace(tzinfo=mx.tzinfo or utc).timestamp()
                elif isinstance(mn, datetime.date):
                    mn = (mn - datetime.date(1970, 1, 1)).days
                    mx = (mx - datetime.date(1970, 1, 1)).days
                elif not isinstance(mn, (int, float)):
                    return None  # string/binary stats: no numeric bucketing
                lo = float(mn) if lo is None else min(lo, float(mn))
                hi = float(mx) if hi is None else max(hi, float(mx))
    except Exception:
        return None
    if lo is None or hi is None:
        return None
    return lo, hi

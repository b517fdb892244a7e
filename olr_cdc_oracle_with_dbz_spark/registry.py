"""Query registry: the single source of truth for the engine's declared surface.

Every operator/query from SURVEY.md §2B registers here as a
:class:`QuerySpec` — a named pair of (Spark implementation, DuckDB oracle
SQL). ``__spark_entry__.queries()`` / ``oracle_sql()`` are thin views over
this registry, which guarantees the two stay in sync (same keys, and by
convention identical output column names — the driver's comparator sorts
columns by name before hashing).

Specs with ``oracle=None`` are non-SQL-expressible (streaming, iterative,
approximate) and get the driver's weaker rows-only check.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERY_MODULES: tuple[str, ...] = (
    "olr_cdc_oracle_with_dbz_spark.operators.scans",
    "olr_cdc_oracle_with_dbz_spark.operators.project_filter",
    "olr_cdc_oracle_with_dbz_spark.operators.joins",
    "olr_cdc_oracle_with_dbz_spark.operators.aggregates",
    "olr_cdc_oracle_with_dbz_spark.operators.windows",
    "olr_cdc_oracle_with_dbz_spark.operators.setops",
    "olr_cdc_oracle_with_dbz_spark.operators.subqueries",
    "olr_cdc_oracle_with_dbz_spark.functions.scalar",
    "olr_cdc_oracle_with_dbz_spark.functions.udfs",
    "olr_cdc_oracle_with_dbz_spark.cdc.queries",
    "olr_cdc_oracle_with_dbz_spark.streaming.batch_equiv",
    "olr_cdc_oracle_with_dbz_spark.llmops.dedup",
    "olr_cdc_oracle_with_dbz_spark.llmops.similarity",
    "olr_cdc_oracle_with_dbz_spark.llmops.text",
    "olr_cdc_oracle_with_dbz_spark.llmops.multimodal",
)


@dataclass
class QuerySpec:
    name: str
    spark_fn: QueryFn
    oracle: str | None = None  # DuckDB-runnable ANSI SQL, or None (rows-only check)
    doc: str = ""
    bench: bool = True  # include in bench.py headline set
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None = None,
    bench: bool = True,
    tags: tuple[str, ...] = (),
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(
            name=name,
            spark_fn=fn,
            oracle=oracle,
            doc=(fn.__doc__ or "").strip(),
            bench=bench,
            tags=tags,
        )
        return fn

    return deco


_loaded = False


def load_all() -> dict[str, QuerySpec]:
    """Import every query module (idempotent) and return the registry."""
    global _loaded
    if not _loaded:
        for mod in _QUERY_MODULES:
            importlib.import_module(mod)
        _loaded = True
    return REGISTRY

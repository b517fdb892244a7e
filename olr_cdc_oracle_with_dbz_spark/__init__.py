"""PySpark-native analytics + CDC engine.

A from-scratch re-creation, on Apache Spark, of the capabilities of the
reference CDC pipeline (somatra-dev/olr-cdc-oracle-with-dbz): Debezium-style
change-data-capture semantics (envelope parse, unwrap, keyed upsert/delete
materialization, snapshot+incremental merge, checkpointed streaming ingest)
plus the relational query surface the reference delegates to its sink
databases, plus LLM-training-data pipeline operators (dedup, similarity
search, multimodal columns, text analysis).

Everything is expressed Spark-first: DataFrame/SQL plans optimized by
Catalyst, Structured Streaming for the streaming path, Pandas UDFs only where
built-ins cannot express the semantics.

Blueprint: SURVEY.md at the repo root. Reference citations in docstrings are
file:line into /root/reference (read-only).
"""

__version__ = "0.1.0"

from olr_cdc_oracle_with_dbz_spark.session import get_spark  # noqa: F401
from olr_cdc_oracle_with_dbz_spark.catalog import Catalog  # noqa: F401


def __getattr__(name: str):
    # lazy top-level conveniences (avoid importing streaming deps eagerly)
    if name == "run_pipeline":
        from olr_cdc_oracle_with_dbz_spark.pipeline import run_pipeline

        return run_pipeline
    if name == "load_all":
        from olr_cdc_oracle_with_dbz_spark.registry import load_all

        return load_all
    raise AttributeError(name)

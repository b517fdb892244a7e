"""Connector layer (reference R1/R2/R11-R14 → Spark sources & sinks).

* :mod:`.kafka` — Debezium-topic ingest + keyed producer (R1/R6)
* :mod:`.jdbc` — snapshot, incremental polling source, upsert sink (R2/R11/R14)
* :mod:`.elasticsearch` — bulk-document sink, transport stubbed (R12)

The spooldir-style file sources (R13) live in
:mod:`olr_cdc_oracle_with_dbz_spark.streaming.ingest` (``read_csv_stream``,
``read_cdc_stream``) because they are the engine's tested streaming path.
"""

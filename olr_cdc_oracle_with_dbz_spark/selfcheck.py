"""30-second engine self-check: ``python -m olr_cdc_oracle_with_dbz_spark.selfcheck``.

Runs the driver's entry query plus one representative oracle parity per
subsystem at sf0.001 — the fastest end-to-end confidence signal after any
change (the full gates are ``pytest tests/`` and the tri-scale sweep).
"""

from __future__ import annotations

import sys

_REPRESENTATIVES = (
    "q22_hash_agg_tpch_q1",  # scan/filter/agg/sort core
    "q20_multiway_join",     # join planning + broadcasts
    "q52_upsert_compaction", # CDC semantics
    "l1_exact_dedup",        # LLM ops
    "u2_pandas_udf",         # Arrow/Python path
)


def main(sf_dir: str = "/root/testdata/sf0.001") -> int:
    from olr_cdc_oracle_with_dbz_spark.plans.parity import check_query, duckdb_connect
    from olr_cdc_oracle_with_dbz_spark.registry import load_all
    from olr_cdc_oracle_with_dbz_spark.session import get_spark

    spark = get_spark("selfcheck", **{"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    load_all()

    import __spark_entry__ as e

    n = len(e.entry(spark).collect())
    print(f"entry: {n} rows")

    con = duckdb_connect(sf_dir)
    failed = 0
    for name in _REPRESENTATIVES:
        ok, msg = check_query(spark, name, sf_dir, con)
        print(f"{'PASS' if ok else 'FAIL'} {name}" + ("" if ok else f": {msg}"))
        failed += 0 if ok else 1
    print("selfcheck:", "OK" if failed == 0 else f"{failed} FAILURES")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))

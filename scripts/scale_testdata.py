#!/usr/bin/env python
"""Distribution-preserving scale-up of the driver testdata (sf-trend probe).

The driver ships sf{0.001,0.01,0.1} only; BASELINE.md's ≤2× argument
extrapolates from two points. This script manufactures a larger scale
factor by replicating the sf0.1 FACT tables K times with key shifting
(orderkeys/event ids/doc ids offset per replica so uniqueness and the
orders⇄lineitem FK survive) while dimensions stay fixed — the marginal
cost a scale-up measures lives in the fact scans/joins/aggregations, and
both engines read the identical files, so the engine/DuckDB ratio is
unaffected by the synthetic provenance. Value columns are copied, not
re-sampled: group cardinalities (returnflag, event_type, lang…) and value
distributions match sf0.1 exactly.

Writes /tmp/sfscale/sf{K/10}/<table>.parquet (scratch; /root/testdata is
read-only). Usage: python scripts/scale_testdata.py [K] (default 10 → sf1).
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
KEY_SHIFT = 10_000_000  # larger than any source key

FACTS = {
    # table -> (key columns to shift per replica)
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey"],
    "events": ["event_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
DIMS = ("region", "nation", "customer", "supplier", "part")


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out_dir = f"/tmp/sfscale/sf{k / 10:g}"
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    for t in DIMS:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet')) "
            f"TO '{out_dir}/{t}.parquet' (FORMAT PARQUET)"
        )
    for t, keys in FACTS.items():
        shifted = ", ".join(
            f"({c} + r.i * {KEY_SHIFT}) AS {c}" for c in keys
        )
        others_row = con.execute(
            f"DESCRIBE SELECT * FROM read_parquet('{SRC}/{t}.parquet')"
        ).fetchall()
        others = ", ".join(c[0] for c in others_row if c[0] not in keys)
        con.execute(
            f"COPY (SELECT {shifted}, {others} "
            f"FROM read_parquet('{SRC}/{t}.parquet'), range({k}) AS r(i)) "
            f"TO '{out_dir}/{t}.parquet' (FORMAT PARQUET, ROW_GROUP_SIZE 122880)"
        )
    for t in (*FACTS, *DIMS):
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{out_dir}/{t}.parquet')"
        ).fetchone()[0]
        print(f"{t}: {n} rows")
    print(f"wrote {out_dir}")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Render the BASELINE.md measured table from BENCH_DETAILS.json.

Run after `BENCH_BASELINE=1 python bench.py`; prints the per-group
markdown table (exact-class queries only — the set the ≤2x bar covers).
"""

from __future__ import annotations

import json
import os
import re
import sys

GROUPS: list[tuple[str, str]] = [
    ("Scans Q1-Q4", r"q0[1-4]"),
    ("Project/filter Q5-Q12", r"q0[5-9]|q1[0-2]"),
    ("Joins/analytics Q13-Q21c", r"q1[3-9]|q2[01]"),
    ("Aggregates Q22-Q30", r"q2[2-9]|q30"),
    ("Windows/sort Q31-Q36", r"q3[1-6]"),
    ("Set ops Q37-Q39", r"q3[7-9]"),
    ("Scalar/array/json Q40-Q46", r"q4[0-6]"),
    ("Subqueries Q47-Q49", r"q4[7-9]"),
    ("CDC batch Q50-Q54", r"q5[0-4]"),
    ("Streaming batch-equiv S2-S4", r"s[2-4]"),
    ("UDF surface U1-U5", r"u[1-5]"),
    ("LLM + multimodal exact", r"[lm]\d"),
]


def main() -> None:
    path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_DETAILS.json"
    d = json.load(open(path))
    if "baseline" not in d:
        sys.exit(f"{path} has no baseline section — run BENCH_BASELINE=1 python bench.py first")
    base, q = d["baseline"], d["queries"]
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from olr_cdc_oracle_with_dbz_spark.registry import load_all

    reg = load_all()
    exact = {n for n in q if n in reg and reg[n].oracle and not reg[n].approx}

    def grp(name: str) -> str:
        for title, pat in GROUPS:
            if re.match(pat, name):
                return title
        return "?ungrouped"

    agg: dict[str, list[float]] = {}
    dropped = []
    for n in sorted(exact):
        if base.get(n, -1) > 0 and q.get(n, -1) > 0:
            g = agg.setdefault(grp(n), [0.0, 0.0])
            g[0] += base[n]
            g[1] += q[n]
        else:
            dropped.append(n)
    if dropped:
        print(f"WARNING dropped (errored/missing timing or baseline): {dropped}", file=sys.stderr)
    if not agg:
        sys.exit("no usable (engine, baseline) pairs — run BENCH_BASELINE=1 python bench.py (full set) first")

    print("| Query group (SURVEY §2B) | DuckDB sf0.1 (s, baseline) | Engine sf0.1 (s) | Ratio |")
    print("|---|---|---|---|")
    tb = ts = 0.0
    for title, _ in GROUPS:
        if title not in agg:
            continue
        b, s = agg[title]
        tb += b
        ts += s
        print(f"| {title.replace('-', '–')} | {b:.2f} | {s:.2f} | {s / b:.1f}× |")
    print(f"| **Total (exact-class, oracle-checked)** | **{tb:.2f}** | **{ts:.2f}** | **{ts / tb:.1f}×** |")
    ung = [n for n in exact if grp(n) == "?ungrouped"]
    if ung:
        print(f"\nWARNING ungrouped: {ung}", file=sys.stderr)


if __name__ == "__main__":
    main()

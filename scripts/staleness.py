#!/usr/bin/env python
"""Rotation-hygiene helper: recompute the correctness-staleness histogram
and check DRIVER_FIRST against the standing rotation invariant.

The driver checks ~50 queries per round (CORRECTNESS_r{N}.json), taken in
registry order, so `DRIVER_FIRST` (registry.py) decides which rows refresh.
The standing verdict invariant: no oracle-backed query's latest green may
fall more than 3 rounds behind — so every round the STALEST rows must lead,
then canaries for code the round touches, then the stalest refresh block,
with the cut rows staged directly below the window cutoff to lead the next
round at exactly 3 rounds stale.

Usage:
  python scripts/staleness.py            # histogram + per-row latest green
  python scripts/staleness.py --check N  # exit 1 if the r{N} window (first
                                         # 50 registry rows) would leave any
                                         # row >3 rounds stale at r{N}
"""
from __future__ import annotations

import glob
import json
import os
import re
import sys
from collections import Counter

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

WINDOW = 50  # driver correctness budget per round


def latest_green() -> dict[str, int]:
    """query -> latest round with a fully-green driver correctness row."""
    latest: dict[str, int] = {}
    paths = sorted(
        glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")),
        key=lambda p: int(re.search(r"r(\d+)", os.path.basename(p)).group(1)),
    )
    for p in paths:
        rnd = int(re.search(r"r(\d+)", os.path.basename(p)).group(1))
        for q, row in json.load(open(p)).items():
            ok = (
                row.get("rows_match")
                and row.get("schema_match")
                # hash_match is None for rows-only (non-SQL-expressible) checks
                and row.get("hash_match") in (True, None)
            )
            if ok:
                latest[q] = rnd
    return latest


def main() -> int:
    latest = latest_green()
    if not latest:
        print("no CORRECTNESS_r*.json artifacts found")
        return 1
    hist = Counter(latest.values())
    cur = max(hist)
    print(f"rows with a green history: {len(latest)}")
    print("latest-green histogram:", dict(sorted(hist.items(), reverse=True)))
    for rnd in sorted(hist):
        rows = sorted(q for q, r in latest.items() if r == rnd)
        age = cur - rnd
        tag = " <-- MUST LEAD next round" if age >= 2 else ""
        print(f"  r{rnd} ({age}+1 rounds stale next round, {len(rows)}):{tag}")
        for q in rows:
            print(f"    {q}")

    if "--check" in sys.argv:
        n = int(sys.argv[sys.argv.index("--check") + 1])
        from olr_cdc_oracle_with_dbz_spark.registry import load_all

        window = list(load_all())[:WINDOW]
        ok = True
        for q, rnd in sorted(latest.items()):
            # a row refreshed this round if it sits inside the window
            eff = n if q in window else rnd
            if n - eff > 3:
                print(f"INVARIANT VIOLATION: {q} would be {n - eff} rounds "
                      f"stale at r{n} (latest green r{rnd}, not in window)")
                ok = False
        print("window check:", "OK" if ok else "FAILED")
        return 0 if ok else 1
    return 0


if __name__ == "__main__":
    sys.exit(main())

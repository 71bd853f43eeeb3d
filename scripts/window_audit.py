#!/usr/bin/env python3
"""Audit the driver gate window vs recorded CORRECTNESS_r*.json rows.

For every registered query, find its LATEST driver row across all
CORRECTNESS files and report: window position, the round of that row,
its status, and staleness.  Flags queries that have NEVER been
driver-checked and queries whose latest row is more than one round
old — the two states the per-round `_PRIORITY` rotation exists to
prevent (see queries/__init__.py).

Run before AND after editing `_PRIORITY`:
    python3 scripts/window_audit.py
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WINDOW = 50


def row_ok(row: dict) -> bool:
    if row.get("err") == "no_oracle":
        # by-design rows-only query: must actually have run and
        # produced rows (a zero-row or rows-missing run is a failure,
        # not a pass — every rows-only query here is expected non-empty)
        return (row.get("spark_rows") or 0) > 0
    return bool(row.get("rows_match") and row.get("schema_match"))


def main() -> int:
    from reflinkcep_spark.queries import all_queries

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rounds: list[tuple[int, dict]] = []
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        m = re.search(r"r(\d+)\.json$", path)
        if m:
            with open(path) as f:
                rounds.append((int(m.group(1)), json.load(f)))
    if not rounds:
        print("no CORRECTNESS_r*.json files found")
        return 1
    latest_round = max(r for r, _ in rounds)

    names = list(all_queries())
    never, stale, red = [], [], []
    print(f"{len(names)} queries, window = first {WINDOW}, "
          f"latest driver round = r{latest_round}\n")
    print(f"{'pos':>4}  {'query':<34} {'latest row':<10} status")
    for i, name in enumerate(names):
        hit = None
        for rnd, data in sorted(rounds, reverse=True):
            if name in data:
                hit = (rnd, data[name])
                break
        pos = f"{i:>4}"
        if hit is None:
            never.append(name)
            print(f"{pos}  {name:<34} {'NEVER':<10} "
                  f"{'in window' if i < WINDOW else 'NOT in window — will stay NEVER'}")
            continue
        rnd, row = hit
        ok = row_ok(row)
        age = latest_round - rnd
        status = "pass" if ok else "FAIL"
        if row.get("err") == "no_oracle":
            status = "rows-only"
        if not ok and row.get("err") != "no_oracle":
            red.append(name)
        if age > 1 and i >= WINDOW:
            stale.append(name)
        flag = ""
        if age > 1:
            flag = f"  <-- {age} rounds stale" + ("" if i < WINDOW else " AND outside window")
        print(f"{pos}  {name:<34} {'r' + str(rnd):<10} {status}{flag}")

    print()
    print(f"never checked: {len(never)}  ({'OK' if all(n in names[:WINDOW] for n in never) else 'SOME OUTSIDE WINDOW'})")
    print(f"latest-row FAIL: {len(red)} {red or ''}")
    print(f">1 round stale and outside window: {len(stale)} {stale or ''}")
    return 0 if not red and not stale and all(n in names[:WINDOW] for n in never) else 2


if __name__ == "__main__":
    raise SystemExit(main())

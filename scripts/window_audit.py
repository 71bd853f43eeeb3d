#!/usr/bin/env python3
"""Audit the driver gate window vs recorded CORRECTNESS_r*.json rows.

For every registered query, find its LATEST driver row across all
CORRECTNESS files and report: window position, the round of that row,
its status, and staleness.  Flags queries that have NEVER been
driver-checked and queries whose latest row is more than one round
old — the two states the per-round `_PRIORITY` rotation exists to
prevent (see queries/__init__.py).

Staleness is judged against the machine-readable sit-out plan
(`queries/__init__.py:PLANNED_SITOUTS`): a 2-rounds-stale query that
is IN the plan and green is expected (the 50-slot window can't hold
every candidate); one NOT in the plan — or planned but red — is a
rotation bug.  Additionally (round 11, VERDICT r10 item 3) there is a
HARD CEILING: any row more than 2 rounds stale fails the audit even
when planned — with a 50-slot window over ~120 queries an exact
round-robin keeps every row ≤2 rounds stale, so exceeding that means
the rotation has drifted, and the answer is to promote or retire, not
to plan deeper staleness.  Exit 0 iff observed staleness matches the
plan exactly, so "nonzero exit" always means "act", never "expected
noise".

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


def classify(names, rounds, planned_sitouts, window=WINDOW):
    """Pure staleness classification (unit-testable without the repo's
    CORRECTNESS files).  `rounds` is [(round_no, {query: row})…];
    returns a dict with the per-query report lines and the four flag
    lists the exit code is computed from."""
    latest_round = max(r for r, _ in rounds)
    never, stale, red, planned, lines = [], [], [], [], []
    by_round = sorted(rounds, reverse=True)
    for i, name in enumerate(names):
        hit = None
        for rnd, data in by_round:
            if name in data:
                hit = (rnd, data[name])
                break
        pos = f"{i:>4}"
        if hit is None:
            never.append(name)
            lines.append(f"{pos}  {name:<34} {'NEVER':<10} "
                         f"{'in window' if i < window else 'NOT in window — will stay NEVER'}")
            continue
        rnd, row = hit
        ok = row_ok(row)
        age = latest_round - rnd
        status = "pass" if ok else "FAIL"
        if row.get("err") == "no_oracle":
            status = "rows-only"
        if not ok and row.get("err") != "no_oracle":
            red.append(name)
        if age > 2:
            # hard ceiling: no plan excuses >2 rounds of staleness
            # (exact round-robin over the window never exceeds 2)
            stale.append(name)
        elif age > 1 and i >= window:
            # planned sit-outs must still be green — a stale AND red
            # row is a real regression no plan excuses
            (stale if name not in planned_sitouts or not ok else planned).append(name)
        flag = ""
        if age > 2:
            flag = f"  <-- {age} rounds stale: EXCEEDS HARD CEILING (2)"
        elif age > 1:
            if i < window:
                flag = f"  <-- {age} rounds stale"
            elif name in planned_sitouts and ok:
                flag = f"  (planned sit-out, {age} rounds stale)"
            else:
                flag = f"  <-- {age} rounds stale AND outside window (UNPLANNED)"
        lines.append(f"{pos}  {name:<34} {'r' + str(rnd):<10} {status}{flag}")

    # plan sanity: every planned sit-out must be a registered query
    # sitting OUTSIDE the window (a planned sit-out inside the window,
    # or a name that no longer exists, means the plan and _PRIORITY
    # have drifted apart)
    plan_bugs = [n for n in planned_sitouts
                 if n not in names or n in names[:window]]
    healthy = (not red and not stale and not plan_bugs
               and all(n in names[:window] for n in never))
    return {
        "latest_round": latest_round, "lines": lines, "never": never,
        "red": red, "planned": planned, "stale": stale,
        "plan_bugs": plan_bugs, "exit": 0 if healthy else 2,
    }


def main() -> int:
    from reflinkcep_spark.queries import PLANNED_SITOUTS, all_queries

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

    names = list(all_queries())
    rep = classify(names, rounds, PLANNED_SITOUTS)
    print(f"{len(names)} queries, window = first {WINDOW}, "
          f"latest driver round = r{rep['latest_round']}\n")
    print(f"{'pos':>4}  {'query':<34} {'latest row':<10} status")
    for line in rep["lines"]:
        print(line)
    print()
    print(f"never checked: {len(rep['never'])}  "
          f"({'OK' if all(n in names[:WINDOW] for n in rep['never']) else 'SOME OUTSIDE WINDOW'})")
    print(f"latest-row FAIL: {len(rep['red'])} {rep['red'] or ''}")
    print(f"planned sit-outs ≥2 rounds stale (expected): {len(rep['planned'])} {rep['planned'] or ''}")
    print(f"UNPLANNED >1 round stale and outside window: {len(rep['stale'])} {rep['stale'] or ''}")
    if rep["plan_bugs"]:
        print(f"PLANNED_SITOUTS entries unregistered or inside window: {rep['plan_bugs']}")
    return rep["exit"]


if __name__ == "__main__":
    raise SystemExit(main())

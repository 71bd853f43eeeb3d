#!/usr/bin/env python3
"""Normalize two driver bench records by the calibration row.

Usage:
    python3 scripts/drift_normalize.py BENCH_r08.json BENCH_r09.json

Implements NOTES_r08.md's one-division drift rule: the fixed-work
``calibration_cpu`` row (bench.py) moves only with host state, so a
uniform bench move that TRACKS the calibration ratio is box weather,
not code.  Prints the raw total ratio, the calibration ratio, the
normalized total ratio, and the per-query movers whose ratio exceeds
what calibration explains by more than the noise floor — those are the
only rows worth a bench-vs-bench reproduction.

Driver records nest bench.py's JSON line under ``parsed``; raw
bench.py output (one JSON object) is accepted too.
"""

from __future__ import annotations

import json
import sys

NOISE_FLOOR = 1.25  # single-run sub-second rows swing this much anyway
MIN_ABS_SEC = 0.3  # ignore movers below this absolute time (noise)


def load(path: str) -> dict:
    with open(path) as f:
        d = json.load(f)
    # "parsed" may be present-but-null (the driver's truncated-tail
    # case, e.g. BENCH_r10.json) — fall back to the record itself,
    # and fail with a sentence instead of a KeyError/AttributeError
    # when neither form carries a bench line.
    d = d.get("parsed") or d
    if not isinstance(d, dict) or "queries" not in d:
        raise SystemExit(
            f"{path}: no parsed bench line (driver 'parsed' is null and "
            "the record itself has no 'queries' map) — re-run bench.py "
            "or pick a round whose BENCH file parsed"
        )
    if d.get("unit") == "ms":
        # round-11+ compact format (integer milliseconds, `calib_ms`)
        # — normalize to the seconds schema the comparisons use
        d = dict(d)
        d["queries"] = {k: v / 1000.0 for k, v in d["queries"].items()}
        if d.get("calib_ms") is not None:
            d["calibration_sec"] = d["calib_ms"] / 1000.0
        if d.get("calib_shuffle_ms") is not None:
            d["calibration_shuffle_sec"] = d["calib_shuffle_ms"] / 1000.0
    return d


def main() -> int:
    if len(sys.argv) != 3:
        print(__doc__)
        return 2
    a, b = load(sys.argv[1]), load(sys.argv[2])
    qa, qb = a["queries"], b["queries"]
    common = sorted(set(qa) & set(qb))
    if not common:
        print("no common queries between the two records")
        return 1
    total_a = sum(qa[q] for q in common)
    total_b = sum(qb[q] for q in common)
    if total_a <= 0:
        print("record A has a zero total over the common subset — nothing to ratio")
        return 1
    raw = total_b / total_a
    ca, cb = a.get("calibration_sec"), b.get("calibration_sec")
    print(f"common subset: {len(common)} queries")
    print(f"raw total ratio      (B/A): {raw:.3f}  ({total_a:.2f}s -> {total_b:.2f}s)")
    shuf = None
    if ca is not None and cb is not None and ca > 0 and cb > 0:
        calib = cb / ca
        label = "normalized"
        print(f"calibration ratio    (B/A): {calib:.3f}  ({ca:.3f}s -> {cb:.3f}s)")
        print(f"normalized total ratio    : {raw / calib:.3f}  (1.0 = box state explains it)")
        # Second divisor (round 13+): the shuffle/bandwidth calibration
        # row.  Most headline rows live on the memory/shuffle path, and
        # the box has shown a bandwidth-degraded mode where calib_cpu
        # RUNS FASTER while the workload inflates (NOTES_r13.md) — when
        # the two divisors disagree, the shuffle row is the one that
        # explains scan/shuffle-heavy movers.
        sa = a.get("calibration_shuffle_sec")
        sb_ = b.get("calibration_shuffle_sec")
        if sa and sb_ and sa > 0 and sb_ > 0:
            shuf = sb_ / sa
            print(
                f"shuffle-calib ratio  (B/A): {shuf:.3f}  "
                f"({sa:.3f}s -> {sb_:.3f}s)"
            )
            print(
                f"shuffle-normalized total  : {raw / shuf:.3f}  "
                "(use for scan/shuffle-heavy movers)"
            )
    else:
        calib = 1.0
        label = "raw"  # don't print ratios as calibration-adjusted when they aren't
        missing = [p for p, c in ((sys.argv[1], ca), (sys.argv[2], cb)) if not c]
        print(f"calibration row missing in {missing} — raw comparison only")
    movers = []
    for q in common:
        if max(qa[q], qb[q]) < MIN_ABS_SEC:
            continue  # both below the absolute noise floor
        # A zero/near-zero side is reported as an infinite mover, never
        # divided by (a 0.0 recording with a measurable other side is
        # exactly the row a human should look at).
        if qa[q] <= 0:
            movers.append((float("inf"), float("inf"), q, qa[q], qb[q]))
            continue
        r_cpu = (qb[q] / qa[q]) / calib
        # A mover must exceed the floor under BOTH divisors (rule stated
        # in the r13 verdict): inflation EITHER calibration row explains
        # is box state; only inflation (or speedup) NEITHER divisor
        # explains is the regression-hunt signal.  Checked per divisor,
        # same direction — a query one divisor explains never flags.
        r_shuf = (qb[q] / qa[q]) / shuf if shuf else r_cpu
        up = r_cpu > NOISE_FLOOR and r_shuf > NOISE_FLOOR
        down = r_cpu < 1 / NOISE_FLOOR and r_shuf < 1 / NOISE_FLOOR
        if up or down:
            movers.append((r_cpu, r_shuf, q, qa[q], qb[q]))
    if movers:
        what = ("BOTH calibration divisors" if shuf
                else "calibration" if label == "normalized"
                else f"x{NOISE_FLOOR} raw")
        print(f"\nmovers beyond {what} (reproduce these interleaved median-of-3):")
        for r_cpu, r_shuf, q, ta, tb in sorted(movers, reverse=True):
            both = f"cpu-norm x{r_cpu:.2f}"
            if shuf:
                both += f"  shuf-norm x{r_shuf:.2f}"
            print(f"  {q:32s} {ta:7.3f}s -> {tb:7.3f}s   {both}")
    else:
        print("\nno per-query mover exceeds what calibration explains — chase nothing")
    # Explicit verdict line (round 14): name the box-vs-code call so the
    # adjudication is mechanical, not a judgment re-made each round.
    if shuf is not None:
        if raw > NOISE_FLOOR:
            if raw / shuf <= 1.1:
                print("\nVERDICT: raw inflation tracks the shuffle "
                      "calibration row — box bandwidth mode, chase nothing.")
            elif abs(shuf - 1.0) < 0.1:
                print("\nVERDICT: raw inflation with calib_shuffle FLAT — "
                      "this is a REGRESSION HUNT, not box state "
                      "(NOTES_r13 rule).")
            else:
                print(f"\nVERDICT: raw inflation x{raw:.2f} of which the "
                      f"shuffle row explains only x{shuf:.2f} "
                      f"(residual x{raw / shuf:.2f}) — treat the residual "
                      "as a REGRESSION HUNT.")
        elif movers:
            print("\nVERDICT: totals within noise but per-query movers exceed "
                  "both divisors — reproduce each interleaved median-of-3.")
        else:
            print("\nVERDICT: no drift beyond what the calibration rows "
                  "explain.")
    return 0


if __name__ == "__main__":
    try:
        raise SystemExit(main())
    except BrokenPipeError:  # piped into head — not an error
        raise SystemExit(0)

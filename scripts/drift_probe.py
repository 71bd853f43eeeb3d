#!/usr/bin/env python3
"""Standalone drift probe: pin down whether per-query bench movement
between rounds is real or box-state noise.

The round-6 bench drifted ~11% slower across the board vs round 5
(median 1.11x, 41/45 queries, uniform, uncorrelated with touched
code).  BENCH numbers are best-of-3 inside one crowded process; this
probe times each suspect query ALONE — warm passes first, then
``--repeats`` timed noop-sink runs — and prints every sample plus the
r5/r6 bench values for context, so the verdict (noise vs regression)
rests on steady-state isolated numbers.

Run on a QUIET machine (no corpus checks / pytest in parallel):
    python3 scripts/drift_probe.py [names ...] [--repeats 4]

Default query set = the round-6 verdict's biggest movers, plus
``dedup_clusters_noprobe`` (the driver query minus its convergence
probe) to isolate the probe's cost from drift.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT = [
    "q_binational_volume",
    "doc_split_assign",
    "dedup_minhash_lsh",
    "doc_curation_funnel",
    "dedup_clusters",
    "dedup_clusters_noprobe",
]


def _dedup_clusters_noprobe(spark, sf_dir):
    from reflinkcep_spark.functions import dedup
    from reflinkcep_spark.queries.pipeline import _docs

    pairs = dedup.ngram_jaccard_pairs(_docs(spark, sf_dir), threshold=0.5, n=3)
    return dedup.duplicate_clusters(pairs, check_convergence=False)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*", default=None)
    ap.add_argument("--repeats", type=int, default=4)
    ap.add_argument(
        "--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    args = ap.parse_args()
    names = args.names or DEFAULT

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    history = {}
    for rnd in ("05", "06"):
        path = os.path.join(repo, f"BENCH_r{rnd}.json")
        if os.path.exists(path):
            with open(path) as f:
                blob = json.load(f)
            # Driver bench records nest the bench.py JSON line under
            # "parsed"; accept a bare bench.py line too.
            history[rnd] = (blob.get("parsed") or blob).get("queries", {})
            if not history[rnd]:
                print(f"warning: no per-query times found in {path}")

    from reflinkcep_spark.queries import all_queries
    from reflinkcep_spark.session import get_spark

    spark = get_spark(app_name="drift-probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    def _warm(pdf_iter):
        yield from pdf_iter

    spark.range(0, 64, 1, 32).mapInPandas(_warm, "id long").collect()

    qs = dict(all_queries())
    qs["dedup_clusters_noprobe"] = _dedup_clusters_noprobe

    print(f"sf_dir={args.sf_dir} repeats={args.repeats} (warm, noop sink)\n")
    verdicts = {}
    for name in names:
        fn = qs.get(name)
        if fn is None:
            print(f"{name}: UNKNOWN query")
            continue
        # two warm passes: classload/JIT on the first, steady plan on
        # the second — the timed repeats then measure execution only
        for _ in range(2):
            fn(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
        samples = []
        for _ in range(max(1, args.repeats)):
            t0 = time.perf_counter()
            fn(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
            samples.append(round(time.perf_counter() - t0, 3))
        med = round(statistics.median(samples), 3)
        r5 = history.get("05", {}).get(name)
        r6 = history.get("06", {}).get(name)
        verdicts[name] = {
            "samples": samples,
            "median": med,
            "min": min(samples),
            "bench_r5": r5,
            "bench_r6": r6,
        }
        ctx = " ".join(
            f"r{r}={v}s" for r, v in (("5", r5), ("6", r6)) if v is not None
        )
        print(f"{name:28s} samples={samples} median={med}s min={min(samples)}s  {ctx}")

    print()
    print(json.dumps(verdicts))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

#!/usr/bin/env python3
"""Paired A/B of dynamic SQL confs on a noisy box: one session, each
query alternates base conf vs variant conf for N cycles, reporting
per-cycle pairs and medians.  Because the box carries external load
(load1 ~10 observed), unpaired runs are uninterpretable; pairing each
variant sample with a base sample seconds apart cancels the weather.

Usage:
    python3 scripts/ab_conf.py --conf k=v [--conf k=v ...] \
        [--cycles N] [--sf-dir DIR] name [name ...]

Only dynamic (SQLConf) keys work — static .config() keys are silently
ignored by spark.conf.set and would invalidate the experiment; the
script verifies each key round-trips.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--cycles", type=int, default=3)
    ap.add_argument("--conf", action="append", required=True)
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    variant = {}
    for kv in args.conf:
        k, _, v = kv.partition("=")
        variant[k] = v

    from reflinkcep_spark.queries import all_queries
    from reflinkcep_spark.session import get_spark

    spark = get_spark(app_name="ab-conf")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    def _warm(pdf_iter):
        yield from pdf_iter

    spark.range(0, 64, 1, 32).mapInPandas(_warm, "id long").collect()

    base = {}
    for k in variant:
        try:
            base[k] = spark.conf.get(k)
        except Exception:
            base[k] = None
        spark.conf.set(k, variant[k])
        got = spark.conf.get(k)
        assert got == variant[k], f"conf {k} did not take: {got!r}"
        if base[k] is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, base[k])

    def set_all(d):
        for k, v in d.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)

    qs = dict(all_queries())
    out = {}
    for name in args.names:
        fn = qs[name]
        # warm both plan variants once (JIT/classload)
        for conf in (base, variant):
            set_all(conf)
            spark.sparkContext.setJobDescription(f"warm:{name}")
            fn(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
        pairs = []
        for c in range(args.cycles):
            cyc = []
            for label, conf in (("A", base), ("B", variant)):
                set_all(conf)
                spark.sparkContext.setJobDescription(f"{label}{c}:{name}")
                t0 = time.perf_counter()
                fn(spark, args.sf_dir).write.format("noop").mode(
                    "overwrite").save()
                cyc.append(round(time.perf_counter() - t0, 3))
            pairs.append(cyc)
        a_med = statistics.median(p[0] for p in pairs)
        b_med = statistics.median(p[1] for p in pairs)
        ratios = [p[1] / p[0] for p in pairs]
        out[name] = {
            "pairs": pairs,
            "A_median": a_med,
            "B_median": b_med,
            "ratio_median": round(statistics.median(ratios), 3),
        }
        print(f"# {name}: A={a_med} B={b_med} "
              f"ratio={out[name]['ratio_median']} pairs={pairs}",
              file=sys.stderr)
    set_all(base)
    print(json.dumps({"variant": variant, "results": out}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

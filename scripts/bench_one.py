#!/usr/bin/env python3
"""Time individual queries through the noop sink (guide §1.4), with
optional extra Spark conf — the A/B harness for optimization work.

Usage:
    python3 scripts/bench_one.py [--reps N] [--conf k=v ...] \
        [--explain] [--sf-dir DIR] name [name ...]

Prints per-query warm + best-of-N timings as one JSON line, and with
--explain dumps each query's .explain("formatted") to
plans/_scratch/<name>.txt.  Uses the same session factory, warmup and
noop-sink methodology as bench.py so numbers are comparable row-for-row.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--conf", action="append", default=[])
    ap.add_argument("--explain", action="store_true")
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    extra = {}
    for kv in args.conf:
        k, _, v = kv.partition("=")
        extra[k] = v

    from reflinkcep_spark.queries import all_queries
    from reflinkcep_spark.session import get_spark

    spark = get_spark(app_name="bench-one", extra_conf=extra)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    def _warm(pdf_iter):
        yield from pdf_iter

    spark.range(0, 64, 1, 32).mapInPandas(_warm, "id long").collect()

    qs = dict(all_queries())
    out: dict[str, dict] = {}
    for name in args.names:
        fn = qs[name]
        spark.sparkContext.setJobDescription(f"warm:{name}")
        t0 = time.perf_counter()
        df = fn(spark, args.sf_dir)
        df.write.format("noop").mode("overwrite").save()
        warm = round(time.perf_counter() - t0, 3)
        if args.explain:
            os.makedirs("plans/_scratch", exist_ok=True)
            with open(f"plans/_scratch/{name}.txt", "w") as f:
                f.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
        best = None
        runs = []
        for i in range(args.reps):
            spark.sparkContext.setJobDescription(f"timed:{name}:{i}")
            t0 = time.perf_counter()
            fn(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
            dt = round(time.perf_counter() - t0, 3)
            runs.append(dt)
            best = dt if best is None or dt < best else best
        out[name] = {"warm": warm, "best": best, "runs": runs}
        print(f"# {name}: warm={warm} best={best} runs={runs}", file=sys.stderr)
    print(json.dumps({"conf": extra, "timings": out}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

#!/usr/bin/env python3
"""Stride-sample the differential grammar corpus through the STREAMING
CEP kernel (applyInPandasWithState) and compare with the reference
engine.

The batch corpus checks (tests/test_differential.py pure-Python,
scripts/kernel_corpus_check.py real batch kernel) leave one surface
uncovered at enumeration scale: cross-micro-batch run-set state.  Here
the fixed 9-event/2-key stream is split into three parquet files
replayed one per micro-batch (maxFilesPerTrigger=1 + availableNow), so
every sampled query's live run-sets must survive the state-store
round trip mid-pattern.  Matches are compared per key as
order-insensitive capture-id sequences, like kernel_corpus_check.

The stream is identical for every case, so the files are written once;
each case still runs its own streaming query + checkpoint.  Cases are
independent, so several streaming queries run concurrently.

Usage: python3 scripts/streaming_corpus_check.py [--stride N]
       [--limit N] [--threads N]
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import tempfile
import time

# Repo root must precede the reference checkout: both have a tests/ dir.
sys.path.insert(0, "/root/reference")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCHEMA = "user_id int, id long, etype string, name long, price long"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--limit", type=int, default=None)
    ap.add_argument(
        "--stride",
        type=int,
        default=60,
        help="take every Nth case of handwritten + four-division corpus "
        "(~14k total); 1 runs all",
    )
    ap.add_argument(
        "--offset",
        type=int,
        default=0,
        help="start the stride sample at this index; --stride 2 --offset 1 "
        "runs the complement of --stride 2 --offset 0",
    )
    ap.add_argument("--threads", type=int, default=4)
    args = ap.parse_args()

    from tests.corpus import DIVISIONS, STRATEGIES, iter_division
    from tests.test_differential import CASES, STREAM, _ref_matches

    from reflinkcep_spark import Query
    from reflinkcep_spark.session import get_spark
    from reflinkcep_spark.streaming import match_pattern_stream

    spark = get_spark(app_name="streaming-corpus-check", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    cases = [(f"hw:{cid}", pat, strat) for cid, pat, strat in CASES]
    cases += [
        (f"{div}:{cid}/{strat}", pat, strat)
        for div in DIVISIONS
        for cid, pat in iter_division(div)
        for strat in STRATEGIES
    ]
    cases = cases[max(0, args.offset) :: max(1, args.stride)]
    if args.limit:
        cases = cases[: args.limit]

    work = tempfile.mkdtemp(prefix="stream_corpus_")
    src = os.path.join(work, "src")
    os.makedirs(src)
    rows = [
        (k, i + 1, t, a["name"], a["price"])
        for k in range(2)
        for i, (t, a) in enumerate(STREAM)
    ]
    # Three micro-batch files in id order; mtimes force replay order.
    by_order = sorted(rows, key=lambda r: r[1])
    n_files = 3
    step = (len(by_order) + n_files - 1) // n_files
    for i in range(0, len(by_order), step):
        part = os.path.join(src, f"part{i}")
        spark.createDataFrame(by_order[i : i + step], SCHEMA).coalesce(
            1
        ).write.parquet(part)
        t = time.time() + i
        for root, _dirs, files in os.walk(part):
            for f in files:
                os.utime(os.path.join(root, f), (t, t))

    def canon(matches):
        return sorted(
            tuple(sorted((n, tuple(ids)) for n, ids in m.items()))
            for m in matches
        )

    def check_case(idx_case):
        idx, (cid, pat, strategy) = idx_case
        want = canon(
            {n: list(ids) for n, ids in m.items()}
            for m in _ref_matches(pat, strategy)
        )
        q = Query.from_dict(
            {
                "patseq": pat,
                "context": {
                    "schema": {
                        "e": ["id", "name", "price"],
                        "f": ["id", "name", "price"],
                    },
                    "strategy": strategy,
                },
            }
        )
        stream = (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(src + "/part*")
        )
        out = match_pattern_stream(
            stream, q, order_by="id", partition_by="user_id", type_col="etype"
        )
        sink = f"sc_{idx}"
        sq = (
            out.writeStream.format("memory")
            .queryName(sink)
            .outputMode("append")
            .option("checkpointLocation", os.path.join(work, f"ckpt_{idx}"))
            .trigger(availableNow=True)
            .start()
        )
        sq.awaitTermination(180)
        got = spark.table(sink).collect()
        spark.catalog.dropTempView(sink)
        failures = []
        for key in (0, 1):
            got_caps = canon(
                {
                    n: [e["id"] for e in (r[n] or [])]
                    for n in q.names
                    if r[n] is not None
                }
                for r in got
                if r["user_id"] == key
            )
            if got_caps != want:
                failures.append((cid, key, got_caps, want))
        return failures

    from concurrent.futures import ThreadPoolExecutor

    t0 = time.time()
    failures = []
    with ThreadPoolExecutor(max_workers=max(1, args.threads)) as pool:
        for i, fs in enumerate(pool.map(check_case, enumerate(cases))):
            failures.extend(fs)
            if (i + 1) % 25 == 0:
                print(
                    f"  {i + 1}/{len(cases)} checked, {len(failures)} "
                    f"failures, {time.time() - t0:.0f}s",
                    flush=True,
                )

    print(
        f"{len(cases)} streaming cases x 2 keys in {time.time() - t0:.0f}s; "
        f"{len(failures)} failures"
    )
    for cid, key, got, want in failures[:5]:
        print("FAIL", cid, "key", key)
        print("  got ", got)
        print("  want", want)
    shutil.rmtree(work, ignore_errors=True)
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())

#!/usr/bin/env python3
"""Live streaming CEP demo: rate source → match_pattern_stream → memory
sink, with the result ASSERTED against the batch kernel.

What it shows
-------------
* a real unbounded source (Spark's ``rate`` source) feeding the
  streaming NFA kernel (`applyInPandasWithState` state store, matches
  emitted at the micro-batch their completing event arrives in);
* events synthesized deterministically from the rate source's
  monotonically increasing ``value`` — so after stopping the stream we
  can regenerate exactly what the NFA saw and replay it through the
  BATCH kernel (`match_pattern`) for a value-level equality check.

The assertion logic: every emitted match ends at its completing event,
so with V = max(end_ord) over the streamed matches, the streamed match
set must equal the batch match set restricted to end_ord <= V — the
stream consumed at least the events up to V, in order, and extra
already-consumed events can only complete matches ending after V.

Usage: python3 scripts/streaming_demo.py [--rows-per-sec N] [--min-matches N]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_KEYS = 8
TYPES = ("view", "click", "purchase", "error", "signup")

QUERY_YAML = """
type: query
patseq:
  type: combine
  contiguity: relaxed
  left:
    type: spat
    name: v
    event: view
    cndt: {expr: value >= 20}
  right:
    type: spat
    name: p
    event: purchase
    cndt: {expr: value >= 50}
context:
  schema: {view: [], click: [], purchase: [], error: [], signup: []}
"""


def derive_events_sql(rate_df):
    """rate (timestamp, value) → deterministic event stream.  Keyed by
    value % N_KEYS (rate delivers values in order, so each key's
    substream arrives in event_id order — the arrival-order contract)."""
    from pyspark.sql import functions as F

    return rate_df.select(
        (F.col("value") % N_KEYS).cast("int").alias("user_id"),
        F.col("value").alias("event_id"),
        F.element_at(
            F.array(*[F.lit(t) for t in TYPES]),
            (F.col("value") % len(TYPES) + 1).cast("int"),
        ).alias("event_type"),
        (F.col("value") * 37 % 100).alias("value"),
    )


def derive_events_py(n):
    """The same derivation in plain Python, for the batch replay."""
    return [
        (v % N_KEYS, v, TYPES[v % len(TYPES)], v * 37 % 100)
        for v in range(n)
    ]


def canon(rows):
    return sorted(
        (
            r["user_id"],
            tuple(e["event_id"] for e in (r["v"] or [])),
            tuple(e["event_id"] for e in (r["p"] or [])),
        )
        for r in rows
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows-per-sec", type=int, default=400)
    ap.add_argument("--min-matches", type=int, default=25)
    ap.add_argument("--timeout-s", type=int, default=120)
    args = ap.parse_args()

    from reflinkcep_spark import Query
    from reflinkcep_spark.operators import match_pattern
    from reflinkcep_spark.session import get_spark
    from reflinkcep_spark.streaming import match_pattern_stream

    spark = get_spark(app_name="streaming-cep-demo", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    query = Query.from_yaml(QUERY_YAML)

    rate = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", args.rows_per_sec)
        .load()
    )
    events = derive_events_sql(rate)
    matches = match_pattern_stream(
        events, query, order_by="event_id", partition_by="user_id",
        type_col="event_type",
    )
    sink = f"cep_demo_{os.getpid()}"
    sq = (
        matches.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .start()
    )

    deadline = time.time() + args.timeout_s
    n = 0
    while time.time() < deadline:
        n = spark.table(sink).count()
        if n >= args.min_matches:
            break
        time.sleep(2)
    sq.stop()
    sq.awaitTermination(60)

    got_rows = spark.table(sink).collect()
    if len(got_rows) < args.min_matches:
        print(f"FAIL: only {len(got_rows)} matches arrived before timeout")
        spark.stop()
        return 1
    got = canon(got_rows)
    v_max = max(r["end_ord"] for r in got_rows)

    # Batch replay of exactly the prefix the stream must have consumed.
    batch_df = spark.createDataFrame(
        derive_events_py(v_max + 1),
        "user_id int, event_id long, event_type string, value long",
    )
    want_rows = match_pattern(
        batch_df, query, order_by="event_id", partition_by="user_id",
        type_col="event_type", allow_fastpath=False,
    ).collect()
    want = canon(r for r in want_rows if r["end_ord"] <= v_max)

    ok = got == want
    print(
        f"{'PASS' if ok else 'FAIL'}: {len(got)} streamed matches over "
        f"{v_max + 1} rate-source events across {N_KEYS} keys "
        f"{'==' if ok else '!='} batch-kernel replay"
    )
    if not ok:
        extra = [m for m in got if m not in want]
        missing = [m for m in want if m not in got]
        print(f"  extra in stream: {extra[:5]}")
        print(f"  missing from stream: {missing[:5]}")
    spark.stop()
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())

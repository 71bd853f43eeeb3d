"""Streaming widening: sliding windows, session windows, exact dedup
within watermark, stream-stream interval join.

Each test replays the sf0.001 events table chronologically as
file-per-micro-batch and asserts the availableNow append output
against the batch computation of the same plan — the same
closed-window methodology as test_streaming_agg.py.
"""

import os
import time

from pyspark.sql import functions as F

from reflinkcep_spark.sources import load_table
from reflinkcep_spark.streaming.aggregations import (
    interval_join,
    session_agg,
    sliding_agg,
    streaming_dedup,
)

from tests.conftest import SF_DIR


def _events(spark, cols=("ts", "event_type", "value")):
    return load_table(spark, SF_DIR, "events").select(*cols)


def _replay_dir(spark, df, tmp_path, name="src", parts=3):
    """Write df as `parts` chronological parquet chunks with strictly
    increasing mtimes so maxFilesPerTrigger=1 replays them in order."""
    src = tmp_path / name
    src.mkdir()
    ordered = df.orderBy("ts").collect()
    n = len(ordered) // parts + 1
    for i in range(parts):
        chunk = ordered[i * n : (i + 1) * n]
        spark.createDataFrame(chunk, df.schema).coalesce(1).write.parquet(
            str(src / f"part{i}")
        )
        t = time.time() + i
        for root, _dirs, files in os.walk(src / f"part{i}"):
            for f in files:
                os.utime(os.path.join(root, f), (t, t))
    return (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/part*")
    )


def _run_append(out, tmp_path, name):
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_sliding_append_matches_batch_closed_windows(spark, tmp_path):
    ev = _events(spark)
    batch_all = sliding_agg(ev).collect()
    max_ts = ev.agg(F.max(F.unix_timestamp("ts"))).collect()[0][0]
    horizon = max_ts - 30 * 60
    want = sorted(
        tuple(r) for r in batch_all if r["window_start_s"] + 3600 <= horizon
    )
    assert want

    out = sliding_agg(_replay_dir(spark, ev, tmp_path))
    sink = f"stream_slide_{os.getpid()}"
    _run_append(out, tmp_path, sink)
    got = sorted(tuple(r) for r in spark.table(sink).collect())
    assert got == want


def test_session_append_matches_batch_closed_sessions(spark, tmp_path):
    ev = _events(spark, ("ts", "user_id", "value"))
    batch_all = session_agg(ev).collect()
    max_ts = ev.agg(F.max(F.unix_timestamp("ts"))).collect()[0][0]
    horizon = max_ts - 30 * 60
    # A session closes when the watermark passes last-event + gap; use
    # a one-second margin to dodge the sub-second truncation of end_s.
    want = sorted(tuple(r) for r in batch_all if r["end_s"] + 600 + 1 < horizon)
    assert want

    out = session_agg(_replay_dir(spark, ev, tmp_path))
    sink = f"stream_sess_{os.getpid()}"
    _run_append(out, tmp_path, sink)
    got = sorted(tuple(r) for r in spark.table(sink).collect())
    # Streaming may additionally emit sessions right at the horizon
    # boundary; every safely-closed session appears exactly once, and
    # nothing outside the batch answer ever appears.
    assert set(want) <= set(got)
    assert len(got) == len(set(got))
    assert set(got) <= {tuple(r) for r in batch_all}


def test_streaming_dedup_within_watermark(spark, tmp_path):
    ev = _events(spark, ("ts", "event_id", "event_type", "value"))
    # Duplicate ~10% of rows (same event_id, same payload); sorting by
    # ts in _replay_dir interleaves each duplicate next to its
    # original, well inside the watermark horizon.
    dups = ev.filter(F.col("event_id") % 10 == 0)
    want = sorted(tuple(r) for r in ev.collect())

    out = streaming_dedup(_replay_dir(spark, ev.unionAll(dups), tmp_path))
    sink = f"stream_dedup_{os.getpid()}"
    _run_append(out, tmp_path, sink)
    got = sorted(tuple(r) for r in spark.table(sink).collect())
    assert got == want


def test_interval_join_matches_batch(spark, tmp_path):
    ev = _events(spark, ("ts", "user_id", "event_type", "value"))
    views = ev.filter(F.col("event_type") == "view").select("ts", "user_id")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "ts", "user_id", "value"
    )

    def plan(views_df, clicks_df):
        return interval_join(
            views_df, clicks_df, on="user_id", upper="15 minutes"
        ).select(
            F.col("l.user_id").alias("user_id"),
            F.unix_timestamp("l.ts").alias("view_s"),
            F.unix_timestamp("r.ts").alias("click_s"),
            F.col("r.value").alias("click_value"),
        )

    want = sorted(tuple(r) for r in plan(views, clicks).collect())
    assert want

    lstream = _replay_dir(spark, views, tmp_path, name="left")
    rstream = _replay_dir(spark, clicks, tmp_path, name="right")
    out = plan(lstream, rstream)
    sink = f"stream_ij_{os.getpid()}"
    _run_append(out, tmp_path, sink)
    got = sorted(tuple(r) for r in spark.table(sink).collect())
    assert got == want

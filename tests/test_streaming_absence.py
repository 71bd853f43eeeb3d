"""Streaming absence (not_followed_by_stream): append emissions equal
the batch not_followed_by for every left row whose span the final
watermark closed.

Chronological file-per-micro-batch replay of the sf0.001 events table:
signups with no purchase within 30 minutes.  At availableNow
termination the final watermark is max(ts) - delay, so the sink must
hold exactly the batch absences with signup_us + within < watermark_us
(later signups are still open — undecidable — and not emitted).
"""

import os
import time

from pyspark.sql import functions as F

from reflinkcep_spark.operators import not_followed_by
from reflinkcep_spark.sources import load_table
from reflinkcep_spark.streaming.absence import not_followed_by_stream

from tests.conftest import SF_DIR

WITHIN_US = 30 * 60 * 1_000_000


def test_streaming_absence_matches_batch_closed_spans(spark, tmp_path):
    ev = load_table(spark, SF_DIR, "events").select(
        "user_id",
        "event_id",
        "event_type",
        "ts",
        F.unix_micros("ts").alias("us"),
    )

    # batch truth
    signups = ev.filter(F.col("event_type") == "signup").select(
        "user_id", "event_id", "us"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select("user_id", "us")
    batch = not_followed_by(
        signups, purchases, on="us", by="user_id", within=WITHIN_US
    )

    max_us = ev.agg(F.max("us")).collect()[0][0]
    wm_us = max_us - 10 * 60 * 1_000_000  # 10-minute watermark delay
    want = sorted(
        (r["user_id"], r["event_id"])
        for r in batch.collect()
        if r["us"] + WITHIN_US < wm_us
    )
    assert want  # sf0.001 has plenty of abandoned signups

    # chronological replay in 3 micro-batches
    src = tmp_path / "src"
    src.mkdir()
    ordered = ev.orderBy("ts").collect()
    third = len(ordered) // 3 + 1
    for i in range(3):
        chunk = ordered[i * third : (i + 1) * third]
        spark.createDataFrame(chunk, ev.schema).coalesce(1).write.parquet(
            str(src / f"part{i}")
        )
        t = time.time() + i
        for root, _dirs, files in os.walk(src / f"part{i}"):
            for f in files:
                os.utime(os.path.join(root, f), (t, t))

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/part*")
        .withWatermark("ts", "10 minutes")
    )
    out = not_followed_by_stream(
        stream,
        left_filter="event_type = 'signup'",
        right_filter="event_type = 'purchase'",
        on="us",
        by="user_id",
        within=WITHIN_US,
    )
    sink = f"stream_absence_{os.getpid()}"
    q = (
        out.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = sorted(
        (r["user_id"], r["event_id"]) for r in spark.table(sink).collect()
    )
    assert got == want


def test_streaming_not_next_matches_batch_closed_candidates(spark, tmp_path):
    """Streaming notNext: append emissions equal the batch not_next
    survivors whose next event exists and is watermark-final (a probe
    with no following event is undecidable on a stream and never
    emitted — the closed-candidate analogue of closed spans)."""
    from reflinkcep_spark.operators import not_next
    from reflinkcep_spark.streaming import not_next_stream

    ev = load_table(spark, SF_DIR, "events").select(
        "user_id",
        "event_id",
        "event_type",
        "value",
        "ts",
        F.unix_micros("ts").alias("us"),
    )

    # batch truth on the SAME micros order key the stream resolves on
    probes = ev.filter(
        (F.col("event_type") == "purchase") & (F.col("value") > 100)
    ).select("user_id", "event_id", "us")
    batch = not_next(
        probes,
        ev.select("user_id", "event_type", "us"),
        on="us",
        by="user_id",
        cond=F.col("event_type") == "error",
    )

    max_us = ev.agg(F.max("us")).collect()[0][0]
    wm_us = max_us - 10 * 60 * 1_000_000
    want = sorted(
        (r["user_id"], r["event_id"], r["next_on"])
        for r in batch.collect()
        if r["next_on"] is not None and r["next_on"] <= wm_us
    )
    assert want  # sf0.001 has plenty of surviving purchases

    src = tmp_path / "src"
    src.mkdir()
    ordered = ev.orderBy("ts").collect()
    third = len(ordered) // 3 + 1
    for i in range(3):
        chunk = ordered[i * third : (i + 1) * third]
        spark.createDataFrame(chunk, ev.schema).coalesce(1).write.parquet(
            str(src / f"part{i}")
        )
        t = time.time() + i
        for root, _dirs, files in os.walk(src / f"part{i}"):
            for f in files:
                os.utime(os.path.join(root, f), (t, t))

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/part*")
        .withWatermark("ts", "10 minutes")
    )
    out = not_next_stream(
        stream,
        left_filter="event_type = 'purchase' AND value > 100",
        neg_filter="event_type = 'error'",
        on="us",
        by="user_id",
    )
    sink = f"stream_not_next_{os.getpid()}"
    q = (
        out.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_nn"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = sorted(
        (r["user_id"], r["event_id"], r["next_on"])
        for r in spark.table(sink).collect()
    )
    assert got == want


def test_not_next_stream_rejects_colliding_columns(spark):
    import pytest

    from reflinkcep_spark.streaming import not_next_stream

    # validation is eager (before any stream starts), so a plain
    # frame with the colliding column exercises it
    ev = load_table(spark, SF_DIR, "events").select(
        "user_id", "event_id", F.unix_micros("ts").alias("next_on"), "ts"
    )
    with pytest.raises(ValueError, match="next_on"):
        not_next_stream(
            ev,
            left_filter="event_id > 0",
            neg_filter="event_id < 0",
            on="next_on",
            by="user_id",
        )

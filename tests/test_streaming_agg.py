"""Watermarked tumbling aggregation: append-mode emission equals the
batch computation for every window the watermark finalized.

Chronological file-per-micro-batch replay of the sf0.001 events table;
at availableNow termination the final watermark = max(ts) - 30min, so
the append sink must hold exactly the batch windows whose end is at or
before that watermark (the still-open tail windows are not emitted).
"""

import os
import time

from pyspark.sql import functions as F

from reflinkcep_spark.sources import load_table
from reflinkcep_spark.streaming.aggregations import tumbling_agg

from tests.conftest import SF_DIR


def test_append_emissions_match_batch_closed_windows(spark, tmp_path):
    ev = load_table(spark, SF_DIR, "events").select(
        "ts", "event_type", "value"
    )

    batch_all = tumbling_agg(ev).collect()
    max_ts = ev.agg(F.max(F.unix_timestamp("ts"))).collect()[0][0]
    horizon = max_ts - 30 * 60
    want = sorted(
        tuple(r) for r in batch_all if r["window_start_s"] + 3600 <= horizon
    )
    assert want  # several days of data → plenty of closed windows

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
    )
    out = tumbling_agg(stream)
    sink = f"stream_agg_{os.getpid()}"
    q = (
        out.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(tuple(r) for r in spark.table(sink).collect())
    assert got == want

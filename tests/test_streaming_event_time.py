"""Event-time streaming CEP: the watermark-gated reorder buffer must
repair out-of-order arrival.

Rows are dealt round-robin across micro-batch files, so each key's
events arrive INTERLEAVED and out of ts order — the arrival-order mode
would produce garbage.  Expected output = the batch kernel on exactly
the events the final watermark released: with availableNow, the
watermark while processing batch N is max(ts of batches < N) − delay,
so events later than that stay parked in state and never feed.
"""

import datetime
import os
import time

from reflinkcep_spark import Query
from reflinkcep_spark.operators import match_pattern
from reflinkcep_spark.streaming import match_pattern_stream

Q_SEQ = """
type: query
patseq:
  type: combine
  contiguity: relaxed
  left: {type: spat, name: a, event: e, cndt: {expr: name == 1}}
  right: {type: spat, name: b, event: e, cndt: {expr: name == 9}}
context:
  schema: {e: [id, name]}
"""

SCHEMA = "user_id int, id long, ts timestamp, type string, name long"
BASE = datetime.datetime(2024, 1, 1)
DELAY_S = 60


def _rows():
    pattern = [1, 7, 1, 9, 7, 1, 9, 1, 9, 7, 1, 9]
    return [
        (k, i + 1, BASE + datetime.timedelta(seconds=30 * i), "e", n)
        for k in range(2)
        for i, n in enumerate(pattern)
    ]


def _canon(rows):
    return sorted(
        (
            r["user_id"],
            tuple(e["id"] for e in (r["a"] or [])),
            tuple(e["id"] for e in (r["b"] or [])),
        )
        for r in rows
    )


def test_event_time_reorder_buffer(spark, tmp_path):
    query = Query.from_yaml(Q_SEQ)
    rows = _rows()

    # 3 files, rows dealt round-robin: ts-interleaved arrival per key.
    src = tmp_path / "src"
    src.mkdir()
    files = [rows[0::3], rows[1::3], rows[2::3]]
    for i, chunk in enumerate(files):
        spark.createDataFrame(chunk, SCHEMA).coalesce(1).write.parquet(
            str(src / f"part{i}")
        )
        t = time.time() + i
        for root, _dirs, fs in os.walk(src / f"part{i}"):
            for f in fs:
                os.utime(os.path.join(root, f), (t, t))

    # Replay the watermark protocol: while processing batch i the
    # watermark is max(ts of batches < i) - delay.  A row later than
    # the watermark at its arrival is dropped (late); a surviving row
    # feeds once the watermark reaches its ts — i.e. by the last batch
    # iff ts <= final watermark.
    delay = datetime.timedelta(seconds=DELAY_S)
    wm = datetime.datetime.min  # no watermark before the first batch
    kept: list = []
    for i, chunk in enumerate(files):
        if i > 0:
            wm = max(r[2] for c in files[:i] for r in c) - delay
        kept.extend(r for r in chunk if r[2] >= wm)
    final_wm = max(r[2] for c in files[:-1] for r in c) - delay
    fed = [r for r in kept if r[2] <= final_wm]
    assert fed and len(fed) < len(rows)
    want = _canon(
        match_pattern(
            spark.createDataFrame(fed, SCHEMA), query, order_by="id",
            partition_by="user_id", type_col="type", allow_fastpath=False,
        ).collect()
    )
    assert want

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/part*")
        .withWatermark("ts", f"{DELAY_S} seconds")
    )
    out = match_pattern_stream(
        stream, query, order_by="id", partition_by="user_id",
        type_col="type", event_time_col="ts",
    )
    sink = f"stream_evt_{os.getpid()}"
    q = (
        out.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert _canon(spark.table(sink).collect()) == want

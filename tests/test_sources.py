"""read_events: format-agnostic event source with schema rails."""

import pytest

from reflinkcep_spark.sources import load_table, read_events, read_events_stream

from tests.conftest import SF_DIR

SCHEMA = "event_id bigint, user_id bigint, event_type string, value double"


@pytest.fixture(scope="module")
def sample(spark):
    return (
        load_table(spark, SF_DIR, "events")
        .select("event_id", "user_id", "event_type", "value")
        .orderBy("event_id")
        .limit(200)
    )


def _rows(df):
    return sorted(
        tuple(r)
        for r in df.select("event_id", "user_id", "event_type", "value").collect()
    )


def test_csv_json_orc_round_trip(spark, tmp_path, sample):
    want = _rows(sample)
    sample.write.option("header", "true").csv(str(tmp_path / "csv"))
    sample.write.json(str(tmp_path / "json"))
    sample.write.orc(str(tmp_path / "orc"))

    got_csv = read_events(spark, str(tmp_path / "csv"), format="csv", schema=SCHEMA)
    got_json = read_events(spark, str(tmp_path / "json"), format="json", schema=SCHEMA)
    got_orc = read_events(spark, str(tmp_path / "orc"), format="orc")
    assert _rows(got_csv) == want
    assert _rows(got_json) == want
    assert _rows(got_orc) == want


def test_text_formats_require_schema(spark, tmp_path):
    with pytest.raises(ValueError, match="schema"):
        read_events(spark, str(tmp_path), format="csv")
    with pytest.raises(ValueError, match="schema"):
        read_events(spark, str(tmp_path), format="json")
    with pytest.raises(ValueError, match="format"):
        read_events(spark, str(tmp_path), format="avro")


def test_read_events_stream_round_trip(spark, tmp_path, sample):
    """The streaming twin delivers the same rows as the batch reader
    (file source, one file per micro-batch) and enforces its schema
    requirement for every format."""
    import os

    want = _rows(sample)
    sample.coalesce(2).write.parquet(str(tmp_path / "pq"))

    stream = read_events_stream(
        spark, str(tmp_path / "pq"), schema=SCHEMA, max_files_per_trigger=1
    )
    assert stream.isStreaming
    sink = f"rev_stream_{os.getpid()}"
    q = (
        stream.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert _rows(spark.table(sink)) == want

    with pytest.raises(ValueError, match="schema"):
        read_events_stream(spark, str(tmp_path / "pq"))


def test_corrupt_json_rows_are_quarantined(spark, tmp_path):
    p = tmp_path / "bad"
    p.mkdir()
    (p / "part.json").write_text(
        '{"event_id": 1, "user_id": 2, "event_type": "view", "value": 1.5}\n'
        "this is not json\n"
        '{"event_id": 3, "user_id": 4, "event_type": "click", "value": 2.0}\n'
    )
    df = read_events(
        spark, str(p), format="json",
        schema=SCHEMA + ", _corrupt_record string",
    )
    # collect() references every column: Spark disallows queries that
    # touch ONLY the internal corrupt-record column.
    rows = df.collect()
    ok = [r for r in rows if r["_corrupt_record"] is None]
    bad = [r for r in rows if r["_corrupt_record"] is not None]
    assert len(ok) == 2 and {r["event_id"] for r in ok} == {1, 3}
    assert len(bad) == 1

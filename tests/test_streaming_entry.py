"""The pre-wired streaming driver entry (__spark_entry__.py
``queries_streaming()``): runs the signup→purchase stream end-to-end
over the sf0.001 event log (file source → streaming NFA kernel →
memory sink) and asserts value equality with the batch driver query
``cep_signup_to_purchase`` on the same data.  Exists so that if the
driver contract ever admits streaming entries, the wiring is already
tested — VERDICT r5 stretch item 7.
"""

import os

SF_DIR = "/root/testdata/sf0.001"


def test_streaming_entry_matches_batch_query(spark, tmp_path):
    import __spark_entry__ as entrymod

    qs = entrymod.queries_streaming()
    assert "cep_signup_to_purchase_stream" in qs

    out = qs["cep_signup_to_purchase_stream"](spark, SF_DIR)
    assert out.isStreaming

    sink = f"stream_entry_{os.getpid()}"
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
        (r["user_id"], r["signup_id"], r["purchase_id"])
        for r in spark.table(sink).collect()
    )
    want = sorted(
        (r["user_id"], r["signup_id"], r["purchase_id"])
        for r in entrymod.queries()["cep_signup_to_purchase"](spark, SF_DIR).collect()
    )
    assert got == want and got


def test_streaming_entry_replaces_regular_file_at_link_path(spark):
    """A REGULAR file parked at the link path (older layout, a copy
    instead of a link) must be replaced with the symlink, not fed to
    os.readlink — which raises EINVAL on non-links — and not silently
    reused as potentially stale data."""
    import hashlib
    import tempfile

    import __spark_entry__ as entrymod

    path = os.path.join(SF_DIR, "events.parquet")
    d = os.path.join(
        tempfile.gettempdir(),
        "stream_events_" + hashlib.md5(path.encode()).hexdigest()[:12],
    )
    os.makedirs(d, exist_ok=True)
    link = os.path.join(d, "events.parquet")
    if os.path.lexists(link):
        os.remove(link)
    with open(link, "w") as f:
        f.write("not a symlink")

    out = entrymod.queries_streaming()["cep_signup_to_purchase_stream"](
        spark, SF_DIR
    )
    assert out.isStreaming
    assert os.path.islink(link) and os.readlink(link) == path

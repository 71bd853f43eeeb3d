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


def test_streaming_entries_match_batch_twins_on_closed_state(spark, tmp_path):
    """The four round-8 additions to ``queries_streaming()`` (windowed
    aggregations ×3 + absence): each runs end-to-end through the file
    source and equals its already-oracled BATCH DRIVER TWIN on the
    watermark-CLOSED subset — append mode holds windows/spans the
    final watermark never passes, so the closed subset is the defined
    equality (STREAMING_READY.md).  Arithmetic is shared (exact cent
    sums), so equality is exact, not approximate."""
    import __spark_entry__ as entrymod
    from pyspark.sql import functions as F

    from reflinkcep_spark.sources import load_table

    qs = entrymod.queries_streaming()
    batch = entrymod.queries()
    # q_events_tumbling was RETIRED from the driver contract in round
    # 12 (near-dup of q_events_sliding's plan shape) but its function
    # stays in the module precisely so this batch-equality pin keeps
    # covering the streaming twin.
    from reflinkcep_spark.queries.temporal import q_events_tumbling

    batch.setdefault("q_events_tumbling", q_events_tumbling)
    ev = load_table(spark, SF_DIR, "events")
    # Spark tracks event-time stats in MILLISECONDS: the final
    # watermark is floor(max_us / 1000) − delay_ms.  Compute the
    # horizon exactly in that unit — second-truncated arithmetic
    # disagrees with engine eviction in a sub-second boundary band
    # and flakes whenever testdata lands an event there.
    max_us = ev.agg(F.max(F.unix_micros("ts"))).collect()[0][0]
    wm_ms = max_us // 1000 - 30 * 60 * 1000  # every wrapper: 30-min delay
    wm_us = wm_ms * 1000

    signup_us = {
        r["event_id"]: r["us"]
        for r in ev.filter(F.col("event_type") == "signup")
        .select("event_id", F.unix_micros("ts").alias("us"))
        .collect()
    }

    def closed(name, row):
        if name.startswith("q_events_"):  # tumbling/sliding windows
            # window end is an exact whole second → exact in ms
            return (row["window_start_s"] + 3600) * 1000 <= wm_ms
        if name == "q_session_windows_stream":
            # end_s is SECOND-truncated while the engine evicts on the
            # microsecond-precision session end — undecidable from the
            # output inside a 1-second band around the horizon; those
            # rows are excluded from BOTH sides below.
            return (row["end_s"] + 600) * 1000 + 1000 <= wm_ms
        # absence: span closes when the watermark passes us + within
        # (exact integer microseconds, same comparison as the engine)
        return signup_us[row["signup_id"]] + 30 * 60 * 1_000_000 < wm_us

    def ambiguous(name, row):
        """Session rows whose eviction is undecidable from the
        second-truncated output: drop from got AND want."""
        if name != "q_session_windows_stream":
            return False
        end_ms = (row["end_s"] + 600) * 1000
        return end_ms <= wm_ms < end_ms + 1000

    pairs = [
        ("q_events_tumbling_stream", "q_events_tumbling"),
        ("q_events_sliding_stream", "q_events_sliding"),
        ("q_session_windows_stream", "q_session_windows"),
        ("cep_signup_abandoned_stream", "cep_signup_abandoned"),
    ]
    for sname, bname in pairs:
        out = qs[sname](spark, SF_DIR)
        assert out.isStreaming, sname
        sink = f"entry_{sname}_{os.getpid()}"
        q = (
            out.writeStream.format("memory")
            .queryName(sink)
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / f"ckpt_{sname}"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        got = sorted(
            tuple(r)
            for r in spark.table(sink).collect()
            if not ambiguous(sname, r)
        )
        want = sorted(
            tuple(r)
            for r in batch[bname](spark, SF_DIR).collect()
            if closed(sname, r) and not ambiguous(sname, r)
        )
        assert got == want and got, sname


def test_streaming_entry_dedup_exact_matches_batch(spark, tmp_path):
    """The seventh entry (streaming exact dedup via native
    dropDuplicates): the emitted digest multiset equals the batch
    twin's (dedup_exact_groups) digest set EXACTLY — one row per
    distinct content digest, no duplicates, nothing withheld (no
    watermark: every batch of an availableNow run flushes its
    first-seen digests in append mode)."""
    import __spark_entry__ as entrymod

    from reflinkcep_spark.queries.pipeline import dedup_exact_groups

    out = entrymod.queries_streaming()["dedup_exact_docs_stream"](
        spark, SF_DIR
    )
    assert out.isStreaming
    sink = f"entry_dedup_exact_{os.getpid()}"
    q = (
        out.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_dedup_exact"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = sorted(r["text_hash"] for r in spark.table(sink).collect())
    want = sorted(
        r["text_hash"] for r in dedup_exact_groups(spark, SF_DIR).collect()
    )
    assert got == want and got


def test_streaming_entry_funnel_within_matches_batch(spark, tmp_path):
    """The eighth entry (round 11): the span-bounded 3-step funnel —
    ``within`` is the flagship beyond-reference CEP feature, and on a
    stream it doubles as the run-state bound.  Kernel entries need no
    watermark closure (event_id order, no event time), so the match
    set equals the batch driver query ``cep_funnel_within`` EXACTLY —
    which also pins the streaming kernel's span pruning against the
    batch fast path's emission-equivalent span filter on real data."""
    import __spark_entry__ as entrymod

    out = entrymod.queries_streaming()["cep_funnel_within_stream"](spark, SF_DIR)
    assert out.isStreaming
    sink = f"entry_funnel_within_{os.getpid()}"
    q = (
        out.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_funnel_within"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = sorted(
        (r["user_id"], r["signup_id"], r["purchase_id"], r["error_id"])
        for r in spark.table(sink).collect()
    )
    want = sorted(
        (r["user_id"], r["signup_id"], r["purchase_id"], r["error_id"])
        for r in entrymod.queries()["cep_funnel_within"](spark, SF_DIR).collect()
    )
    assert got == want and got


def test_streaming_entry_url_dedup_matches_batch(spark, tmp_path):
    """The ninth entry (round 11): streaming URL-level dedup — the
    emitted canonical-URL multiset equals the round-12 pre-staged
    batch twin's canonical-URL set EXACTLY (one row per distinct
    resource, no duplicates, nothing withheld; no watermark), which
    also pins the shared raw-URL builder and canonical_url projection
    across the batch and streaming surfaces."""
    import __spark_entry__ as entrymod

    from reflinkcep_spark.queries.pipeline import dedup_url_canonical

    out = entrymod.queries_streaming()["dedup_url_canonical_stream"](
        spark, SF_DIR
    )
    assert out.isStreaming
    sink = f"entry_url_dedup_{os.getpid()}"
    q = (
        out.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_url_dedup"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = sorted(r["canonical_url"] for r in spark.table(sink).collect())
    want = sorted(
        r["canonical_url"] for r in dedup_url_canonical(spark, SF_DIR).collect()
    )
    assert got == want and got


def test_streaming_entry_not_next_matches_batch_closed(spark, tmp_path):
    """The round-9 sixth entry (strict negation / notNext): equals the
    batch twin ``cep_purchase_no_immediate_error`` (round-10 queue) on
    probes whose NEXT EVENT exists and is watermark-final — a probe
    with no follower is undecidable on a stream and never emitted.
    The batch twin orders by event_id and the stream resolves on
    micros; the sf event log is strictly ts-increasing per user, so
    the two orders agree and (user_id, purchase_id) compares exactly."""
    import __spark_entry__ as entrymod
    from pyspark.sql import functions as F

    from reflinkcep_spark.queries.cep_queries import (
        cep_purchase_no_immediate_error,
    )
    from reflinkcep_spark.sources import load_table

    ev = load_table(spark, SF_DIR, "events")

    # not_next_stream's contract requires `on` (micros) unique per key,
    # and the batch twin resolves "next" on event_id — ASSERT the order
    # keys coincide (us strictly increasing in event_id order per user,
    # which implies per-(user_id, us) uniqueness) instead of trusting
    # the generator; a same-microsecond pair would make the streaming
    # result silently diverge from the batch twin.
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("event_id")
    order_violations = (
        ev.select("user_id", "event_id", F.unix_micros("ts").alias("us"))
        .withColumn("prev_us", F.lag("us").over(w))
        .filter(F.col("prev_us").isNotNull() & (F.col("us") <= F.col("prev_us")))
        .count()
    )
    assert order_violations == 0, (
        "events.ts is not strictly increasing in event_id order per "
        "user — stream (micros) and batch (event_id) 'next' diverge"
    )

    max_us = ev.agg(F.max(F.unix_micros("ts"))).collect()[0][0]
    wm_us = (max_us // 1000 - 30 * 60 * 1000) * 1000
    ev_us = {
        r["event_id"]: r["us"]
        for r in ev.select("event_id", F.unix_micros("ts").alias("us")).collect()
    }

    out = entrymod.queries_streaming()["cep_purchase_no_immediate_error_stream"](
        spark, SF_DIR
    )
    assert out.isStreaming
    sink = f"entry_not_next_{os.getpid()}"
    q = (
        out.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_not_next"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = sorted(
        (r["user_id"], r["purchase_id"]) for r in spark.table(sink).collect()
    )
    want = sorted(
        (r["user_id"], r["purchase_id"])
        for r in cep_purchase_no_immediate_error(spark, SF_DIR).collect()
        if r["next_event_id"] is not None and ev_us[r["next_event_id"]] <= wm_us
    )
    assert got == want and got


def test_streaming_entry_bloom_gate_matches_batch(spark, tmp_path):
    """The tenth entry (round 11): the STATELESS ingest decontamination
    gate — Bloom bits inlined as a plan literal, per-row projection,
    no state, no watermark — equals the round-13 pre-staged batch twin
    ``doc_bloom_decontam`` EXACTLY, false positives included (both
    surfaces hash with md5 into the same 4096 bits)."""
    import __spark_entry__ as entrymod

    from reflinkcep_spark.queries.pipeline import doc_bloom_decontam

    out = entrymod.queries_streaming()["doc_bloom_decontam_stream"](spark, SF_DIR)
    assert out.isStreaming
    sink = f"entry_bloom_gate_{os.getpid()}"
    q = (
        out.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_bloom_gate"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = sorted(
        (r["doc_id"], r["n_flagged_grams"]) for r in spark.table(sink).collect()
    )
    want = sorted(
        (r["doc_id"], r["n_flagged_grams"])
        for r in doc_bloom_decontam(spark, SF_DIR).collect()
    )
    assert got == want and got


def test_streaming_entry_hll_registers_matches_batch(spark, tmp_path):
    """The eleventh entry (round 11): per-source HLL registers over
    the document stream — fixed-size state, complete output mode —
    equal the batch twin ``doc_hll_registers``' per-source rows
    EXACTLY (the batch '(all)' rollup stays downstream: streaming
    allows one aggregation, and max-merge mergeability makes the
    rollup a consumer-side fold, which is the sketch's point)."""
    import __spark_entry__ as entrymod

    from reflinkcep_spark.queries.pipeline import doc_hll_registers

    out = entrymod.queries_streaming()["doc_hll_registers_stream"](spark, SF_DIR)
    assert out.isStreaming
    sink = f"entry_hll_{os.getpid()}"
    q = (
        out.writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt_hll"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = sorted(tuple(r) for r in spark.table(sink).collect())
    want = sorted(
        (r["source"], r["bucket"], r["register"], r["n_tokens"])
        for r in doc_hll_registers(spark, SF_DIR).collect()
        if r["source"] != "(all)"
    )
    assert got == want and got


def test_streaming_entry_span_merge_matches_batch(spark, tmp_path):
    """The twelfth entry (round 12): annotation-span consolidation at
    ingest — merge_spans as a STATELESS per-row fold (no state, no
    watermark) — equals the round-13 pre-staged batch twin
    ``doc_span_merge`` EXACTLY and TOTALLY: both surfaces run the same
    shared projection (pipeline._span_merge_projection), and a
    stateless projection has no watermark-closure band to exclude."""
    import __spark_entry__ as entrymod

    from reflinkcep_spark.queries.pipeline import doc_span_merge

    out = entrymod.queries_streaming()["doc_span_merge_stream"](spark, SF_DIR)
    assert out.isStreaming
    sink = f"entry_span_merge_{os.getpid()}"
    q = (
        out.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_span_merge"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = sorted(tuple(r) for r in spark.table(sink).collect())
    want = sorted(
        (r["doc_id"], r["n_spans"], r["n_merged"], r["covered_chars"])
        for r in doc_span_merge(spark, SF_DIR).collect()
    )
    assert got == want and got


def test_streaming_entry_cms_registers_matches_batch(spark, tmp_path):
    """The thirteenth entry (round 12): per-source Count-Min register
    cells over the document stream — the second fixed-size-state
    sketch aggregation, complete output mode — equal the batch
    ``sketch.cms_registers`` helper EXACTLY (both surfaces share the
    cell-placement projection, sketch._cms_hashed)."""
    import __spark_entry__ as entrymod

    from reflinkcep_spark.functions import sketch
    from reflinkcep_spark.queries.pipeline import _CMS_DEPTH, _CMS_WIDTH
    from reflinkcep_spark.sources import load_table

    out = entrymod.queries_streaming()["doc_cms_registers_stream"](spark, SF_DIR)
    assert out.isStreaming
    sink = f"entry_cms_{os.getpid()}"
    q = (
        out.writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt_cms"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = sorted(tuple(r) for r in spark.table(sink).collect())
    want = sorted(
        (r["source"], r["row"], r["pos"], r["cnt"])
        for r in sketch.cms_registers(
            load_table(spark, SF_DIR, "documents"),
            width=_CMS_WIDTH,
            depth=_CMS_DEPTH,
        ).collect()
    )
    assert got == want and got


def test_streaming_entry_funnel_within_time_matches_batch(spark, tmp_path):
    """The fourteenth entry (round 13): the TIME-based ``within()`` —
    48-hour bound stamped by ``within_col=unix_micros(ts)`` while
    ``event_id`` stays the order column — equals the round-15
    queue-staged batch twin ``cep_funnel_within_time`` EXACTLY.
    Kernel entries need no watermark closure (event_id order), and the
    batch side bypasses the fast path by construction (its span
    post-filter sees only order values), so this pins the kernel's
    TIME-stamp pruning identically on both surfaces."""
    import __spark_entry__ as entrymod

    from reflinkcep_spark.queries.cep_queries import cep_funnel_within_time

    out = entrymod.queries_streaming()["cep_funnel_within_time_stream"](
        spark, SF_DIR
    )
    assert out.isStreaming
    sink = f"entry_funnel_within_time_{os.getpid()}"
    q = (
        out.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_funnel_within_time"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = sorted(
        (r["user_id"], r["signup_id"], r["purchase_id"], r["error_id"])
        for r in spark.table(sink).collect()
    )
    want = sorted(
        (r["user_id"], r["signup_id"], r["purchase_id"], r["error_id"])
        for r in cep_funnel_within_time(spark, SF_DIR).collect()
    )
    assert got == want and got
    # The time bound must actually bite: strictly fewer matches than
    # the unbounded funnel (otherwise the test pins nothing).
    unbounded = entrymod.queries()["cep_funnel_3step"](spark, SF_DIR).count()
    assert len(got) < unbounded


def test_streaming_entry_boilerplate_matches_batch(spark, tmp_path):
    """The fifteenth entry (round 13): jusText-style boilerplate
    classification at ingest — a STATELESS zero-exchange projection
    (no state, no watermark; the doc_span_merge_stream recipe) —
    equals the round-15 queue-staged batch twin ``text_boilerplate``
    EXACTLY and TOTALLY: both surfaces call the same
    ``boilerplate_profile`` function, so they cannot disagree."""
    import __spark_entry__ as entrymod

    from reflinkcep_spark.queries.pipeline import text_boilerplate

    out = entrymod.queries_streaming()["text_boilerplate_stream"](spark, SF_DIR)
    assert out.isStreaming
    sink = f"entry_boilerplate_{os.getpid()}"
    q = (
        out.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_boilerplate"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = sorted(tuple(r) for r in spark.table(sink).collect())
    batch = text_boilerplate(spark, SF_DIR)
    cols = batch.columns
    want = sorted(tuple(r[c] for c in cols) for r in batch.collect())
    assert got == want and got


def test_streaming_entry_sql_funnel_matches_batch(spark, tmp_path):
    """The sixteenth entry (round 14): SQL:2016 MATCH_RECOGNIZE on a
    STREAM.  (reluctant, SKIP TO NEXT ROW) is the finalization-free
    selection combination — a start's winner is its first-completing
    candidate — so the stream's match SET equals the queue-staged
    batch twin ``cep_sql_funnel`` exactly; ``match_seq`` is dropped on
    both sides (completion-ordered on the stream, start-ordered in
    batch — the one documented difference)."""
    import __spark_entry__ as entrymod

    from reflinkcep_spark.queries.cep_queries import cep_sql_funnel

    out = entrymod.queries_streaming()["cep_sql_funnel_stream"](spark, SF_DIR)
    assert out.isStreaming
    assert "match_seq" not in out.columns
    sink = f"entry_sql_funnel_{os.getpid()}"
    q = (
        out.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_sql_funnel"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = sorted(
        (r["user_id"], r["signup_id"], r["purchase_id"], r["gap_len"])
        for r in spark.table(sink).collect()
    )
    want = sorted(
        (r["user_id"], r["signup_id"], r["purchase_id"], r["gap_len"])
        for r in cep_sql_funnel(spark, SF_DIR).collect()
    )
    assert got == want and got


def test_streaming_sql_within_interval_matches_batch(spark, tmp_path):
    """``PATTERN (...) WITHIN INTERVAL`` (round 14) on a STREAM: the
    shared ``_attach_within_stamp`` helper threads the event-time
    bound into ``match_pattern_stream``'s within/within_col path, so
    on a stream the 48-hour bound is ALSO the per-key state bound.
    The finalization-free funnel spec with the time bound appended
    must produce exactly the batch front end's match set (modulo
    ``match_seq``, completion- vs start-ordered)."""
    import __spark_entry__ as entrymod

    from reflinkcep_spark.cep.match_recognize import (
        match_recognize,
        match_recognize_stream,
    )
    from reflinkcep_spark.queries.cep_queries import MR_FUNNEL_SPEC

    spec = MR_FUNNEL_SPEC.replace(
        "PATTERN (S G*? P)", "PATTERN (S G*? P) WITHIN INTERVAL '48' HOUR"
    )
    assert "WITHIN INTERVAL" in spec
    cols = ["user_id", "event_id", "event_type", "value", "ts"]
    stream = entrymod._stream_events(spark, SF_DIR).select(*cols)
    out = match_recognize_stream(stream, spec, time_col="ts").drop("match_seq")
    assert out.isStreaming
    sink = f"entry_sql_within_{os.getpid()}"
    q = (
        out.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_sql_within"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = sorted(
        (r["user_id"], r["signup_id"], r["purchase_id"], r["gap_len"])
        for r in spark.table(sink).collect()
    )
    batch = match_recognize(
        spark.read.parquet(f"{SF_DIR}/events.parquet").select(*cols),
        spec,
        time_col="ts",
    )
    want = sorted(
        (r["user_id"], r["signup_id"], r["purchase_id"], r["gap_len"])
        for r in batch.collect()
    )
    assert got == want and got
    # the time bound bites: strictly fewer matches than the unbounded spec
    unbounded = match_recognize(
        spark.read.parquet(f"{SF_DIR}/events.parquet").select(*cols),
        MR_FUNNEL_SPEC,
    )
    assert len(want) < unbounded.count()
    # ALL ROWS PER MATCH on the stream must not leak the internal
    # __mr_stamp column (review finding: orig_columns captured before
    # the stamp attach) — schema equals the batch surface's
    all_rows_spec = spec.replace(
        "AFTER MATCH", "ALL ROWS PER MATCH AFTER MATCH"
    )
    stream_cols = match_recognize_stream(
        entrymod._stream_events(spark, SF_DIR).select(*cols),
        all_rows_spec,
        time_col="ts",
    ).columns
    batch_cols = match_recognize(
        spark.read.parquet(f"{SF_DIR}/events.parquet").select(*cols),
        all_rows_spec,
        time_col="ts",
    ).columns
    assert "__mr_stamp" not in stream_cols
    assert stream_cols == batch_cols


def test_streaming_sql_selection_rejects_greedy_and_ordered_modes(spark):
    """The streaming kernel's SQL selection is fenced to the
    finalization-free combination — greedy preference / ordered skip
    modes raise with the explanation, never silently hold back or
    drop matches."""
    import pytest as _pytest

    import __spark_entry__ as entrymod
    from reflinkcep_spark.cep.match_recognize import match_recognize_stream

    stream = entrymod._stream_events(spark, SF_DIR).select(
        "user_id", "event_id", "event_type", "value"
    )
    with _pytest.raises(Exception, match="finalization"):
        match_recognize_stream(
            stream,
            """PARTITION BY user_id ORDER BY event_id
               MEASURES COUNT(E.*) AS n PATTERN (E+)
               DEFINE E AS E.event_type = 'error'""",
        )
    with _pytest.raises(Exception, match="lag/lead"):
        match_recognize_stream(
            stream,
            """PARTITION BY user_id ORDER BY event_id
               MEASURES COUNT(B.*) AS n PATTERN (A B+?)
               AFTER MATCH SKIP TO NEXT ROW
               DEFINE B AS PREV(value) < B.value""",
        )

"""Streaming windowed aggregation with watermarked late-data handling.

The reference engine has no notion of time at all (SURVEY.md §1.1), so
this is beyond-the-reference surface: the standard Structured
Streaming shape — event-time tumbling windows + watermark — that any
production stream pipeline pairs with CEP output.

State story at scale: the watermark bounds aggregation state to the
windows still open within the lateness horizon; everything older is
finalized, emitted (append mode), and evicted.  Without the watermark,
window state grows with stream lifetime — never ship that.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from reflinkcep_spark.queries.exact import exact_sum2

__all__ = [
    "tumbling_agg",
    "sliding_agg",
    "session_agg",
    "streaming_dedup",
    "interval_join",
]


def tumbling_agg(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "30 minutes",
    keys: Sequence[str] = ("event_type",),
    value_col: str = "value",
) -> DataFrame:
    """Tumbling event-time windows over a (streaming or batch) frame.

    Returns ``window_start_s | keys… | n_events | total_value``.  On a
    streaming input with append output, a window row is emitted exactly
    once — when the watermark (max event time − ``watermark``) passes
    the window end; rows later than the horizon are dropped.  The same
    plan runs on a batch frame (watermark is a no-op there), which is
    what the parity test exploits.
    """
    agged = (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"), *keys)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            # exact integer-cent accumulator (queries/exact.py): the
            # streaming output must be BIT-equal to its batch driver
            # twin, which sums in exact cents
            exact_sum2(value_col).alias("total_value"),
        )
    )
    return agged.select(
        F.unix_timestamp(F.col("w.start")).alias("window_start_s"),
        *keys,
        "n_events",
        "total_value",
    )


def sliding_agg(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    window: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "30 minutes",
    keys: Sequence[str] = ("event_type",),
    value_col: str = "value",
) -> DataFrame:
    """Sliding event-time windows (each event belongs to
    window÷slide overlapping windows), watermark-finalized like
    :func:`tumbling_agg`.

    State scales with windows-open-within-horizon × key cardinality —
    the slide ratio multiplies open-window count, not event state, so
    a 4:1 overlap costs 4× window rows, never 4× the input."""
    agged = (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window, slide).alias("w"), *keys)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            # exact integer-cent accumulator (queries/exact.py): the
            # streaming output must be BIT-equal to its batch driver
            # twin, which sums in exact cents
            exact_sum2(value_col).alias("total_value"),
        )
    )
    return agged.select(
        F.unix_timestamp(F.col("w.start")).alias("window_start_s"),
        *keys,
        "n_events",
        "total_value",
    )


def session_agg(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    gap: str = "10 minutes",
    watermark: str = "30 minutes",
    keys: Sequence[str] = ("user_id",),
    value_col: str = "value",
) -> DataFrame:
    """Gap-based session windows via native ``F.session_window``.

    In streaming mode sessions merge incrementally inside the state
    store and a session row is emitted (append mode) once the
    watermark passes its end (last event + gap) — the streaming form
    of the batch ``q_session_windows`` query.  ``end_s`` reports the
    last event's second (gap subtracted back out) so streaming, batch
    and the DuckDB islands oracle all speak the same schema.
    """
    agged = (
        events.withWatermark(ts_col, watermark)
        .groupBy(*keys, F.session_window(ts_col, gap).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            exact_sum2(value_col).alias("session_value"),
        )
    )
    return agged.select(
        *keys,
        F.unix_timestamp(F.col("w.start")).alias("start_s"),
        F.unix_timestamp(F.col("w.end") - F.expr(f"INTERVAL '{gap}'")).alias("end_s"),
        "n_events",
        "session_value",
    )


def streaming_dedup(
    events: DataFrame,
    *,
    keys: Sequence[str] = ("event_id",),
    ts_col: str = "ts",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Exact streaming deduplication with bounded state.

    ``dropDuplicatesWithinWatermark`` keeps a key in state only until
    the watermark passes its event time + horizon, so state is bounded
    by keys-per-horizon instead of growing with stream lifetime (plain
    ``dropDuplicates`` on a stream never evicts).  Duplicates arriving
    within the watermark window are suppressed; a replay arriving
    later than the horizon is out-of-contract (same contract as any
    watermarked operator).  On a batch frame this is plain
    ``dropDuplicates`` — the parity the test exploits."""
    if events.isStreaming:
        return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            list(keys)
        )
    return events.dropDuplicates(list(keys))


def interval_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    lower: str = "0 seconds",
    upper: str = "15 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Stream-stream inner equi-join with an event-time interval bound:
    ``right.ts ∈ [left.ts + lower, left.ts + upper]``.

    Both sides are watermarked so the join state for a row is dropped
    once no future match can arrive (watermark + interval bound — the
    two conditions Structured Streaming needs to reason about state
    eviction).  Unbounded stream-stream joins keep both sides forever;
    never ship that."""
    lw = left.withWatermark(left_ts, watermark).alias("l")
    rw = right.withWatermark(right_ts, watermark).alias("r")
    cond = (
        (F.col(f"l.{on}") == F.col(f"r.{on}"))
        & (
            F.col(f"r.{right_ts}")
            >= F.col(f"l.{left_ts}") + F.expr(f"INTERVAL '{lower}'")
        )
        & (
            F.col(f"r.{right_ts}")
            <= F.col(f"l.{left_ts}") + F.expr(f"INTERVAL '{upper}'")
        )
    )
    return lw.join(rw, cond, "inner")

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

__all__ = ["tumbling_agg"]


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
            F.round(F.sum(value_col), 2).alias("total_value"),
        )
    )
    return agged.select(
        F.unix_timestamp(F.col("w.start")).alias("window_start_s"),
        *keys,
        "n_events",
        "total_value",
    )

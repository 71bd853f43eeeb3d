"""Range (interval) join: match point rows to the interval rows that
contain them, per key — the third temporal-join primitive next to
as-of (operators/asof.py) and session windows (operators/sessions.py).

Physical strategy — bucketed equi-join: Catalyst has no range-join
operator, so a raw ``l.k = r.k AND r.start <= l.on <= r.end`` plan
degenerates to a per-key cross product (BroadcastNestedLoopJoin or a
sort-merge join that re-scans every overlapping run) — quadratic in
key density, dead at 100 TB.  Instead both sides are mapped onto
fixed-width time buckets:

* a point belongs to exactly ONE bucket (``on div width``);
* an interval is exploded to EVERY bucket it covers
  (``sequence(start div width, end div width)``) — a narrow,
  shuffle-free row expansion of ``len/width + 1`` rows per interval;
* the join is then a plain hash equi-join on ``(key, bucket)`` with
  the exact containment predicate as a post-join filter.

Each (point, interval) pair meets in exactly one bucket — the point's
— so there are no duplicates to dedup.  Cost: one hash shuffle per
side on ``(key, bucket)`` (broadcastable when the interval side is
small), plus the bounded explode.  Pick ``bucket_width`` near the
typical interval length: explode factor stays O(1) while each bucket
pairs only temporally-near rows.  Skewed hot buckets fall out of AQE
skew-join handling because the join is a plain equi-join.

No reference analog (the reference engine has no joins at all); the
driver oracle is DuckDB's native ``BETWEEN`` range join, which
implements the same inclusive-bounds semantics with an IEJoin.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["interval_join"]


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    *,
    on: str,
    start: str,
    end: str,
    by: str | Sequence[str] | None = None,
    bucket_width: int,
) -> DataFrame:
    """Inner-join ``points`` to every ``intervals`` row with
    ``start <= on <= end`` (inclusive both ends) and equal ``by``
    keys.  Output = all columns of both inputs; each qualifying
    (point, interval) pair appears exactly once, arbitrary order.

    ``on``/``start``/``end`` must be integer columns in the same unit
    (e.g. ``unix_micros`` timestamps), non-negative (``div``
    truncates toward zero, so negative values would bucket wrong).
    Intervals with ``start > end`` are empty and dropped.
    ``bucket_width`` is in the same unit; explode factor is
    ``(end-start)/bucket_width + 1`` rows per interval.
    """
    if bucket_width <= 0:
        raise ValueError("bucket_width must be positive")
    keys = [by] if isinstance(by, str) else list(by or [])
    overlap = (set(points.columns) & set(intervals.columns)) - set(keys)
    if overlap:
        raise ValueError(
            f"column collision between points and intervals: {sorted(overlap)}; "
            "rename one side (join keys excepted)"
        )
    missing = [c for c in keys if c not in points.columns or c not in intervals.columns]
    if missing:
        raise ValueError(f"join key(s) {missing} must exist on both sides")

    w = int(bucket_width)
    pts = points.withColumn("__bucket", F.expr(f"`{on}` div {w}"))
    ivs = (
        intervals.filter(F.col(start) <= F.col(end))
        .withColumn(
            "__bucket",
            F.explode(
                F.sequence(F.expr(f"`{start}` div {w}"), F.expr(f"`{end}` div {w}"))
            ),
        )
    )
    out = pts.join(ivs, keys + ["__bucket"], "inner").filter(
        (F.col(on) >= F.col(start)) & (F.col(on) <= F.col(end))
    )
    return out.drop("__bucket")

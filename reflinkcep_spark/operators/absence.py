"""Absence (negation) patterns: left events NOT followed by a right
event within a span — Flink CEP's ``notFollowedBy`` for the ubiquitous
two-step case (reference has no negation operator at all; Flink's is
the public spec: a pattern A¬B matches an A with no B after it inside
the match window).

Physical strategy mirrors :mod:`reflinkcep_spark.operators.asof` —
tag + union + ONE ordered window pass per key.  Each left row learns
the order-key of the first right row strictly after it
(``first(right_on) over (rows following)``); the absence test is then a
pure per-row filter.  Cost = one shuffle on the key + one sort: the
floor for any per-key order-sensitive operator, and the same shape
whether the span is 30 seconds or unbounded.

The naive forms do not survive scale: ``LEFT ANTI JOIN ON l.k = r.k
AND r.on > l.on AND r.on <= l.on + within`` is an inequality join
(per-key cross product); a correlated NOT EXISTS decorrelates to the
same thing.  That anti-join IS what the driver oracle runs in DuckDB —
small-scale truth, not the plan we'd deploy.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["not_followed_by"]


def not_followed_by(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    by: str | Sequence[str],
    within=None,
    next_col: str = "next_right_on",
) -> DataFrame:
    """Left rows with NO right row in ``(l.on, l.on + within]`` per key.

    ``on`` must be a numeric order column present in both frames
    (convert timestamps to epoch micros upstream — exact integer
    arithmetic, no interval/timezone semantics to disagree on).
    ``within=None`` means "never followed": no right row after the left
    row at all.  A right row at exactly the same ``on`` is NOT a
    follower (strictly-after semantics, matching Flink's notFollowedBy
    between two pattern steps).

    Returns all left rows/columns plus ``next_col`` — the first right
    ``on`` strictly after the row (NULL if none) — already filtered to
    the absence survivors.  Keep ``next_col`` for auditability or drop
    it.
    """
    keys = [by] if isinstance(by, str) else list(by)
    if next_col in left.columns:
        raise ValueError(f"next_col {next_col!r} already exists in left frame")

    lhs = left.withColumn("__side", F.lit(1))
    rhs = right.select(*keys, on).withColumn("__side", F.lit(0))
    for c in lhs.columns:
        if c not in rhs.columns:
            rhs = rhs.withColumn(c, F.lit(None).cast(dict(lhs.dtypes)[c]))
    unioned = lhs.unionByName(rhs)

    # Right rows sort BEFORE left rows at equal `on` (__side 0 < 1), so
    # the strictly-following frame (1, unbounded) never contains a
    # same-instant right row — that's the strictly-after contract.
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col(on).asc(), F.col("__side").asc())
        .rowsBetween(1, Window.unboundedFollowing)
    )
    nxt: Column = F.first(
        F.when(F.col("__side") == 0, F.col(on)), ignorenulls=True
    ).over(w)

    out = unioned.select(*left.columns, "__side", nxt.alias(next_col)).filter(
        F.col("__side") == 1
    )
    absent = F.col(next_col).isNull()
    if within is not None:
        absent = absent | (F.col(next_col) > F.col(on) + F.lit(within))
    return out.filter(absent).drop("__side")

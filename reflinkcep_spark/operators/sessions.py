"""Gap-based sessionization as a reusable operator.

The gaps-and-islands construction: lag → new-session flag → running
sum = per-key session sequence number.  ONE shuffle on the key; both
window passes and any downstream per-session aggregation reuse that
partitioning — the floor for an order-sensitive per-key operator, the
same shape as the as-of join and the CEP kernel.

Complementary to Spark's native ``F.session_window`` (which buckets
into an aggregation directly): this form keeps every event row,
annotated with its session, so per-event enrichment and custom
session-level logic stay expressible.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["sessionize"]


def sessionize(
    df: DataFrame,
    *,
    gap,
    by: str | Sequence[str],
    on: str,
    session_col: str = "session_seq",
) -> DataFrame:
    """Annotate each row with a per-key session number.

    A new session starts when the gap to the previous row's ``on``
    (numeric order column, e.g. epoch micros) exceeds ``gap``
    (strictly: ``delta > gap`` continues Flink/Spark session-gap
    semantics where an event at exactly ``last + gap`` still belongs
    to the session — pass ``gap - 1`` for half-open behavior).
    Sessions number from 1 in ``on`` order per key.
    """
    keys = [by] if isinstance(by, str) else list(by)
    if session_col in df.columns:
        raise ValueError(f"session_col {session_col!r} already exists")
    w = Window.partitionBy(*keys).orderBy(on)
    new_session = (
        F.coalesce((F.col(on) - F.lag(on).over(w)) > gap, F.lit(True))
    ).cast("long")
    return df.withColumn(
        session_col,
        F.sum(new_session).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )

"""Skew-safe equi-join via key salting.

AQE's skew-join split (`spark.sql.adaptive.skewJoin`) already repairs
most sort-merge skew at runtime; reach for explicit salting when the
hot side of a shuffled join concentrates a handful of keys so hard that
even split partitions bottleneck a task, or when the engine picks a
shuffled-hash join AQE can't split.

``salted_join`` spreads each hot key of the LEFT frame over
``salt`` sub-keys (uniform random salt column) and replicates every
RIGHT row ``salt`` times, joining on (key, salt).  Row-level results are
identical to the plain join; the left shuffle now spreads hot keys over
``salt`` reducers at the cost of a ``salt``× blow-up of the right side —
so keep the right side the small one (dimension-sized, but too big or
too dynamic to broadcast).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_join"]


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    *,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the left side's hot keys spread over ``salt``
    sub-partitions.  Supports inner and left joins (the salted right
    replication preserves exactly those semantics)."""
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    keys = [on] if isinstance(on, str) else list(on)

    lhs = left.withColumn("__salt", (F.rand(seed=42) * salt).cast("int"))
    rhs = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    out = lhs.join(rhs, keys + ["__salt"], how)
    return out.drop("__salt")

"""Deterministic, engine-portable sampling / splitting / shuffling
primitives.

Everything keys off ``md5_bucket``: a 60-bit integer derived from the
md5 of a key column.  Unlike ``rand()`` / ``TABLESAMPLE`` (engine- and
plan-dependent) or ``xxhash64`` (Spark-only), the md5 path computes the
same value on any engine, any partitioning, any run — which is what a
training-data pipeline needs for reproducible subsets, frozen
train/valid/test splits, and a global shuffle order that survives
re-runs.  All expressions are JVM-side Catalyst (whole-stage codegen);
no UDFs, no shuffle introduced by the functions themselves.

The DuckDB equivalent of ``md5_hash60(k)`` used by the query oracles:
``('0x' || substr(md5(k::VARCHAR), 1, 15))::BIGINT``.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["md5_hash60", "md5_bucket", "assign_split"]


def md5_hash60(col: Column) -> Column:
    """First 15 hex digits of ``md5(string(col))`` as a non-negative
    60-bit long — small enough to park in a BIGINT on every engine
    (a full 64-bit parse would overflow DuckDB's signed ::BIGINT)."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast(
        "long"
    )


def md5_bucket(col: Column, n: int = 100) -> Column:
    """Uniform deterministic bucket in ``[0, n)`` of the key column."""
    return md5_hash60(col) % n


def assign_split(col: Column, splits: Mapping[str, int]) -> Column:
    """Frozen split assignment: map the key's percent-bucket onto named
    ranges, e.g. ``{"train": 96, "valid": 2, "test": 2}`` (must sum to
    100).  A document's split NEVER changes as the corpus grows —
    membership depends only on the key — which is the property that
    keeps eval sets uncontaminated across dataset versions.

    ORDER-SENSITIVE: bucket ranges are carved out in the mapping's
    iteration order, so ``{"train": 96, "valid": 2, "test": 2}`` puts
    buckets [0,96) in train, [96,98) in valid, [98,100) in test, while
    the same percentages in a different order yield a different (still
    valid and still frozen) assignment.  Pass an ``OrderedDict`` /
    3.7+ dict in the order you mean and keep that order forever — the
    driver oracles for ``doc_split_assign`` hard-code
    train→valid→test."""
    total = sum(splits.values())
    if total != 100:
        raise ValueError(f"split percentages must sum to 100, got {total}")
    bucket = md5_bucket(col, 100)
    expr = None
    upper = 0
    *head, (last_name, _) = list(splits.items())
    for name, pct in head:
        upper += pct
        cond = bucket < F.lit(upper)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(
            cond, F.lit(name)
        )
    return F.lit(last_name) if expr is None else expr.otherwise(F.lit(last_name))

"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Engine: ``reflinkcep_spark`` — CEP pattern matching (the reference's
full operator surface) as a grouped-map NFA kernel with Catalyst fast
paths, plus the relational operator set and training-data-pipeline
operators (dedup / similarity search / text analysis / multimodal
plumbing).  See SURVEY.md §2 for the inventory and
reflinkcep_spark/queries/ for every query definition.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _shipped(fn: Callable[[SparkSession, str], DataFrame]):
    """The harness calls us with ITS SparkSession; make sure the
    package is importable on that session's Python workers before any
    kernel (applyInPandas) plan executes."""

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        from reflinkcep_spark.session import ensure_package_shipped

        ensure_package_shipped(spark)
        return fn(spark, sf_dir)

    return run


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: signup → first
    qualifying purchase per user (relaxed-contiguity CEP sequence;
    the planner dispatches it to the pure-Catalyst window fast path)."""
    from reflinkcep_spark.queries.cep_queries import cep_signup_to_purchase

    return _shipped(cep_signup_to_purchase)(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (CEP,
    relational, pipeline)."""
    from reflinkcep_spark.queries import all_queries

    return {name: _shipped(fn) for name, fn in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """Equivalent DuckDB SQL for every SQL-expressible query; names
    absent here (iterative-condition CEP, skip strategies, sketching
    dedup/ANN) are non-SQL-expressible → rows-only checks."""
    from reflinkcep_spark.queries import all_oracles

    return all_oracles()

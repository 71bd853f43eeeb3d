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


def queries_streaming() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Streaming counterpart of ``queries()``, pre-wired for the day
    the driver contract admits streaming entries (it does not today —
    nothing calls this but tests/test_streaming_entry.py).  Each entry
    takes (spark, sf_dir) and returns an UNSTARTED streaming DataFrame
    reading ``sf_dir/events.parquet`` as a file stream through
    ``match_pattern_stream``; the caller starts it with
    ``.writeStream`` (e.g. memory sink + ``processAllAvailable``).
    Batch-vs-stream equality for this query is asserted in the test."""

    def cep_signup_to_purchase_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pyspark.sql import functions as F

        from reflinkcep_spark.cep.query import Query
        from reflinkcep_spark.session import ensure_package_shipped
        from reflinkcep_spark.streaming import match_pattern_stream

        ensure_package_shipped(spark)
        path = os.path.join(sf_dir, "events.parquet")
        schema = spark.read.parquet(path).schema
        # The file stream source requires a DIRECTORY; the testdata
        # tables are single parquet files, so expose the file through
        # a per-sf_dir temp directory symlink (stable path → the
        # source's file-tracking log stays consistent across calls).
        import hashlib
        import tempfile

        d = os.path.join(
            tempfile.gettempdir(),
            "stream_events_" + hashlib.md5(path.encode()).hexdigest()[:12],
        )
        os.makedirs(d, exist_ok=True)
        link = os.path.join(d, "events.parquet")
        # lexists, not exists: a dangling symlink (testdata regenerated)
        # reports exists=False but still blocks os.symlink; likewise a
        # live link pointing at stale data must be re-made, not reused.
        # islink before readlink: a REGULAR file at this path (older
        # layout, a copy instead of a link) would make readlink raise.
        if os.path.lexists(link):
            if (
                not os.path.islink(link)
                or not os.path.exists(link)
                or os.readlink(link) != path
            ):
                os.remove(link)
        if not os.path.lexists(link):
            os.symlink(path, link)
        stream = (
            spark.readStream.schema(schema)
            .parquet(d)
            .select("user_id", "event_id", "event_type", "value")
        )
        out = match_pattern_stream(
            stream,
            Query.from_yaml(
                """
type: query
patseq:
  type: combine
  contiguity: relaxed
  left:  {type: spat, name: reg, event: signup,   cndt: {expr: "True"}}
  right: {type: spat, name: buy, event: purchase, cndt: {expr: value > 50}}
context:
  schema: {signup: [], purchase: [], error: [], click: [], view: []}
"""
            ),
            order_by="event_id",
            partition_by="user_id",
        )
        return out.select(
            "user_id",
            F.element_at(F.col("reg"), 1)["event_id"].alias("signup_id"),
            F.element_at(F.col("buy"), 1)["event_id"].alias("purchase_id"),
        )

    return {"cep_signup_to_purchase_stream": cep_signup_to_purchase_stream}

"""Result sinks.

The reference engine's only sink is rendered text: matches written as
``name: type(attr,…), …; name2: …`` lines (reference exp/run.py:70-80
via Event.__repr__, event.py:19-22).  :func:`render_matches` reproduces
that format byte-for-byte so existing reference result files diff
cleanly against ours — the golden tests compare through it.

For data-scale output, :func:`write_matches` lands a match DataFrame as
partitioned parquet — matches are just rows here, so every Spark sink
(parquet/json/kafka/delta) works; this helper only standardizes layout.
"""

from __future__ import annotations

from typing import Iterable, Mapping, Optional, Sequence

__all__ = [
    "render_match",
    "render_matches",
    "write_matches",
    "write_training_shards",
    "write_bucketed",
]


def render_match(match: Mapping[str, list], type_of=None) -> str:
    """One match → the reference's one-line format.

    ``match`` maps capture name → list of attr dicts (the shape
    ``run_pattern``/``run_testcase`` return).  ``type_of`` optionally
    maps an event's attrs to its type tag; defaults to the constant
    ``'e'`` used by the whole reference corpus.
    """

    def ev(attrs: Mapping) -> str:
        t = type_of(attrs) if type_of else "e"
        return "{}({})".format(t, ",".join(str(v) for v in attrs.values()))

    return "; ".join(
        "{}: {}".format(name, ", ".join(ev(a) for a in evs))
        for name, evs in match.items()
    )


def render_matches(matches: Iterable[Mapping[str, list]], type_of=None) -> str:
    return "\n".join(render_match(m, type_of) for m in matches)


def write_matches(
    df,
    path: str,
    *,
    partition_by: Optional[Sequence[str]] = None,
    mode: str = "overwrite",
) -> None:
    """Write a match DataFrame as parquet, partitioned by the match key
    columns (a 100 TB match stream is read back by key, so colocate
    it).  Thin by design: any Spark sink works on match frames."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_training_shards(
    df,
    path: str,
    *,
    n_shards: int = 64,
    id_col: str = "doc_id",
    order_col: Optional[str] = None,
    mode: str = "overwrite",
) -> None:
    """Write a dataset as deterministic training shards:
    ``{path}/shard=K/`` parquet directories, K = md5-bucket(id) mod
    ``n_shards``.

    The row→shard mapping depends only on the id (the same md5-bucket
    trick as the sampling queries), NOT on input partitioning, task
    scheduling, or cluster size — so an incremental rebuild rewrites a
    shard byte-stably, downstream loaders can address shards by key,
    and a resharded read never sees a row move between runs.  One
    shuffle (the repartition on shard) aligns tasks with shards, so
    each shard directory holds one file; ``order_col`` additionally
    sorts rows within the shard (deterministic row order for training
    replay).  Size ``n_shards`` so a shard fits a loader worker —
    at 100 TB that means thousands of shards, which is exactly what
    the hash spreads uniformly."""
    from pyspark.sql import functions as F

    bucket = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 15), 16, 10)
        .cast("long")
    )
    out = df.withColumn("shard", F.pmod(bucket, F.lit(n_shards)).cast("int"))
    out = out.repartition(n_shards, F.col("shard"))
    if order_col is not None:
        out = out.sortWithinPartitions("shard", order_col)
    out.write.mode(mode).partitionBy("shard").parquet(path)


def write_bucketed(
    df,
    table: str,
    key: str | Sequence[str],
    *,
    buckets: int = 256,
    path: Optional[str] = None,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist a DataFrame as a BUCKETED parquet table on its join /
    aggregation key, so every future equi-join or groupBy on that key
    reads back exchange-free.

    Bucketing is the standing answer to the repeated-shuffle problem
    at 100 TB: a fact table that joins on the same key in every
    pipeline run pays its hash exchange ONCE at write time; afterwards
    two tables bucketed on the same key with the same bucket count
    sort-merge-join with ZERO Exchange on either side (Spark trusts
    the on-disk hash distribution), and a groupBy on the key is
    map-side only.  ``sort=True`` additionally sorts each bucket file
    by the key so the merge phase needs no sort either.

    Implementation notes: bucketed output must go through the catalog
    (``saveAsTable`` — Spark's bucket metadata lives there, plain
    ``.parquet(path)`` silently drops it); pass ``path`` to keep the
    data external at a location of your choosing.  Read back with
    ``spark.table(table)``, NOT ``spark.read.parquet`` (a path read
    sees plain files and re-shuffles).  Size ``buckets`` so one bucket
    of the LARGER table fits an executor's scan partition (~128-256 MB
    compressed at 100 TB scale → thousands of buckets)."""
    keys = [key] if isinstance(key, str) else list(key)
    writer = df.write.format("parquet").mode(mode).bucketBy(buckets, *keys)
    if sort:
        writer = writer.sortBy(*keys)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)

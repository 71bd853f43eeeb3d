"""Sequence packing for LLM training pipelines: assign documents to
fixed-token-budget training sequences.

Models the standard concat-and-chunk packing used to build training
batches: documents are concatenated in a deterministic order and sliced
into ``capacity``-token sequences; a document belongs to the sequence
its first token lands in.  The deterministic order is an md5-derived
key of the document id — reproducible on any engine, any partitioning,
any run (same rationale as the md5-bucket sampling in
queries/pipeline.py).

Scale design: a prefix-sum per stratum is inherently sequential, so
parallelism comes from sharding — each ``(source, shard)`` packs
independently (shard = hash-bucket of the doc id), giving
``n_sources × n_shards`` independent window partitions instead of one
giant per-source scan.  One shuffle total (the window partitioning);
the cumulative sum, sequence assignment, and rollup all reuse it.  At
100 TB raise ``n_shards`` until each shard's token volume fits a task
comfortably; packing quality is unaffected because sequences never
cross shards anyway.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from reflinkcep_spark.functions import text

__all__ = ["pack_sequences", "pack_sequences_ffd", "pack_stats", "zorder_key"]


def _order_key(id_col: str):
    """Deterministic 60-bit order key (md5 of the id, as in
    doc_hash_sample) — engine-portable, uniform, reproducible."""
    return (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 15), 16, 10)
        .cast("long")
    )


def pack_sequences(
    df: DataFrame,
    capacity: int = 256,
    *,
    n_shards: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """Per-document sequence assignment:
    ``(source, shard, seq_id, doc_id, n_tok)``.

    ``seq_id = tokens_before_this_doc div capacity`` within the
    document's ``(source, shard)`` stratum under the deterministic
    order — i.e. the index of the capacity-sized slice the document
    starts in.  The integer division stays in exact LONG arithmetic
    (``div``), not a double divide, so assignments are stable at any
    cumulative token count.
    """
    ok = _order_key(id_col)
    staged = df.select(
        F.col(id_col),
        F.col(source_col).alias("source"),
        text.token_count(F.col(text_col)).cast("long").alias("n_tok"),
        ok.alias("__ok"),
        F.pmod(ok, F.lit(n_shards)).cast("long").alias("shard"),
    )
    w = (
        Window.partitionBy("source", "shard")
        .orderBy("__ok", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    staged = staged.withColumn(
        "__cum_before", F.sum("n_tok").over(w) - F.col("n_tok")
    )
    return staged.select(
        "source",
        "shard",
        F.expr(f"__cum_before div {int(capacity)}").alias("seq_id"),
        F.col(id_col),
        "n_tok",
    )


def pack_stats(assignments: DataFrame) -> DataFrame:
    """Rollup per training sequence: how many documents and tokens each
    sequence holds.  Reuses the window partitioning — the groupBy keys
    are a superset prefix of the window keys, so no extra shuffle."""
    return assignments.groupBy("source", "shard", "seq_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").alias("n_tokens"),
    )


def pack_sequences_ffd(
    df: DataFrame,
    capacity: int = 256,
    *,
    n_shards: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """WHOLE-DOCUMENT packing via first-fit-decreasing bin packing —
    the complement of :func:`pack_sequences`: concat-and-chunk slices
    documents across sequence boundaries (no wasted tokens, but
    cross-document attention or mid-document truncation), while FFD
    keeps every document intact in exactly one sequence and minimizes
    the padding waste instead (FFD uses at most 11/9·OPT + 6/9 bins —
    the classic Johnson bound).

    Per ``(source, shard)`` stratum: documents sorted by token count
    descending (ties broken by the deterministic md5 order key, then
    id — fully reproducible), each placed into the FIRST sequence with
    room.  A document longer than ``capacity`` gets a sequence of its
    own, flagged ``overflow = true`` (truncate or re-chunk those
    upstream; silently dropping them would bias the corpus against
    long documents).

    Output: ``(source, shard, seq_id, doc_id, n_tok, overflow)``.
    ``seq_id`` numbers bins in creation order within the stratum.
    :func:`pack_stats` works on this output unchanged.

    Scale shape: same single shuffle as :func:`pack_sequences` (hash
    by the stratum key into ``applyInPandas``), but the packing loop
    is Python per stratum — bin packing is inherently sequential, so
    parallelism again comes from sharding, and packing quality is per
    shard by construction.  The first-fit scan is O(n·bins) per
    stratum; raise ``n_shards`` until a stratum's documents fit a
    task.
    """
    import pandas as pd

    ok = _order_key(id_col)
    staged = df.select(
        F.col(id_col),
        F.col(source_col).cast("string").alias("source"),
        text.token_count(F.col(text_col)).cast("long").alias("n_tok"),
        ok.alias("__ok"),
        F.pmod(ok, F.lit(n_shards)).cast("long").alias("shard"),
    )

    cap = int(capacity)

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["n_tok", "__ok", id_col], ascending=[False, True, True]
        )
        remaining: list[int] = []  # free tokens per open sequence
        seq_ids, overflow = [], []
        for tok in pdf["n_tok"]:
            if tok > cap:
                seq_ids.append(len(remaining))
                # -1 sentinel, not 0: an overflow sequence must never
                # accept another document, and a zero-token document
                # would satisfy ``free >= tok`` against a 0.
                remaining.append(-1)
                overflow.append(True)
                continue
            for b, free in enumerate(remaining):
                if free >= tok:
                    seq_ids.append(b)
                    remaining[b] = free - tok
                    break
            else:
                seq_ids.append(len(remaining))
                remaining.append(cap - tok)
            overflow.append(False)
        out = pdf[["source", "shard", id_col, "n_tok"]].copy()
        out["seq_id"] = seq_ids
        out["overflow"] = overflow
        return out[["source", "shard", "seq_id", id_col, "n_tok", "overflow"]]

    return staged.groupBy("source", "shard").applyInPandas(
        pack,
        schema=(
            f"source string, shard long, seq_id long, {id_col} long, "
            "n_tok long, overflow boolean"
        ),
    )


def zorder_key(a, b, bits: int = 21) -> "F.Column":
    """Morton / Z-order interleave of two non-negative integers into
    one ``2·bits``-wide key — the data-LAYOUT primitive: sort (or
    range-partition) a table by this key before writing and rows close
    in BOTH dimensions land in the same files, so min/max file
    statistics prune multidimensional predicates (the Delta/Iceberg
    ``ZORDER BY`` idea, expressed as an engine-portable integer
    formula).  Bit ``2i`` of the key is bit ``i`` of ``a``, bit
    ``2i+1`` is bit ``i`` of ``b``.

    Pure codegen column algebra — ``2·bits`` shift/mask/or terms, no
    UDF, no shuffle; an external engine reproduces the key from the
    same formula (the oracle does).  The domain (``0 ≤ x < 2^bits``)
    is enforced IN-PLAN: out-of-range inputs would silently alias
    distant rows into the same tile, so they raise instead (the
    merge_spans rail discipline).

    ``bits`` defaults to 21 so the key fits comfortably in a BIGINT
    (42 bits) with room for a third dimension if extended.
    """
    if not (1 <= bits <= 31):
        raise ValueError(f"bits must be in [1, 31], got {bits}")
    lim = 1 << bits

    def checked(c, name):
        # Cast to long BEFORE the bit loop: Spark's shiftleft/shiftright
        # wrap the shift distance mod 32 for INT inputs, so an int32
        # column with an in-domain value ≥ 2^16 would alias bits once
        # 2·i+1 reaches 32 (e.g. zorder_key(2^20, 0) came back 256, not
        # 2^40).  64-bit shift semantics regardless of input type keep
        # the no-silent-aliasing guarantee the rail promises.
        return F.when(
            c.isNull() | (c < 0) | (c >= lim),
            F.raise_error(
                f"zorder_key: {name} must be in [0, 2^{bits}) — "
                "rescale or bucket the dimension first"
            ),
        ).otherwise(c.cast("long"))

    a = checked(a, "a")
    b = checked(b, "b")
    key = F.lit(0).cast("long")
    for i in range(bits):
        key = key + F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i)
        key = key + F.shiftleft(
            F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1
        )
    return key.cast("long")

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

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "md5_hash60",
    "md5_bucket",
    "assign_split",
    "token_budget_sample",
    "mixture_token_rebalance",
    "importance_weights",
]


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


def token_budget_sample(
    df: DataFrame,
    budget: int,
    *,
    n_shards: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """Per-source TOKEN-budget quota sample: the deterministic
    hash-ordered prefix of each source's documents whose cumulative
    token count stays within ``budget``.

    Mixture recipes are usually stated in tokens ("50 B tokens of web,
    5 B of code"), not document counts — ``doc_mixture_sample`` (doc
    fractions) can't express them because document lengths vary by
    orders of magnitude.  Selection is by the frozen md5 order of the
    doc id, so the sample is reproducible on any engine and GROWS
    MONOTONICALLY: new corpus docs append to the end of the hash order
    only if budget remains, and a re-run after corpus growth keeps
    every previously selected document whose prefix position survived.

    Scale design: a per-source cumulative sum is inherently sequential,
    so the corpus never flows through one total-order window.  The
    60-bit order key is RANGE-sharded on its top bits (shard boundaries
    align with the hash order, unlike ``pmod`` bucketing), giving:
    (1) one aggregate per (source, shard) — tiny frame; (2) running
    shard offsets via a window over that aggregate (rows = sources ×
    shards, driver-scale); (3) offsets broadcast back, and shards whose
    offset already exceeds the budget are dropped BEFORE the detail
    window — at 100 TB with a budget selecting 1% of a source, ~99% of
    its rows never reach the big window's shuffle; (4) the per-row
    cumulative sum runs per (source, shard) in parallel.  Raise
    ``n_shards`` until a shard's rows fit a task.

    Returns ``(doc_id, source, n_tok, cum_tok)`` — ``cum_tok`` is the
    document's inclusive global prefix total within its source, always
    ``<= budget``.
    """
    from reflinkcep_spark.functions import text

    if budget < 0:
        raise ValueError(f"budget must be non-negative, got {budget}")
    return _hash_prefix_by_budget(
        df, F.lit(int(budget)), n_shards, text_col, id_col, source_col
    )


def _hash_prefix_by_budget(
    df: DataFrame,
    budget: Column,
    n_shards: int,
    text_col: str,
    id_col: str,
    source_col: str,
) -> DataFrame:
    """The shared range-sharded prefix machinery of
    :func:`token_budget_sample` and :func:`mixture_token_rebalance`.
    ``budget`` is a Column resolvable against a frame that has a
    ``source`` column — a constant for the flat sampler, a per-source
    literal map lookup for the rebalancer."""
    if n_shards < 1:
        # A negative shard count would silently REVERSE the shard
        # order (negative ids ascend backwards through the hash
        # ranges) and return the wrong end of the prefix.
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    from reflinkcep_spark.functions import text

    # 60-bit key space split into n_shards contiguous ranges; ceil so
    # shard ids stay < n_shards even when 2**60 % n_shards != 0.
    width = -(-(1 << 60) // n_shards)
    staged = df.select(
        F.col(id_col),
        F.col(source_col).alias("source"),
        text.token_count(F.col(text_col)).cast("long").alias("n_tok"),
        md5_hash60(F.col(id_col)).alias("__ok"),
    ).withColumn("__shard", F.expr(f"__ok div {width}"))
    # The staged frame feeds BOTH the shard totals and the detail
    # window; without a cut Catalyst plans two full text scans (and
    # tokenizes the corpus twice).  The lazy localCheckpoint (the
    # dedup-module pattern) materializes the NARROW text-free frame
    # once instead.
    staged = staged.localCheckpoint(eager=False)
    totals = staged.groupBy("source", "__shard").agg(
        F.sum("n_tok").alias("__tok")
    )
    w_off = (
        Window.partitionBy("source")
        .orderBy("__shard")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offsets = totals.select(
        "source",
        "__shard",
        (F.sum("__tok").over(w_off) - F.col("__tok")).alias("__offset"),
    ).filter(F.col("__offset") <= budget)
    w_in = (
        Window.partitionBy("source", "__shard")
        .orderBy("__ok", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        staged.join(F.broadcast(offsets), ["source", "__shard"])
        .withColumn(
            "cum_tok", F.col("__offset") + F.sum("n_tok").over(w_in)
        )
        .filter(F.col("cum_tok") <= budget)
        .select(id_col, "source", "n_tok", "cum_tok")
    )


def mixture_token_rebalance(
    df: DataFrame,
    weights: Mapping[str, int],
    budget: int,
    *,
    n_shards: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """Token-count-EXACT mixture rebalancing: select, per source, the
    deterministic md5-ordered document prefix whose cumulative token
    count fits that source's share ``⌊budget·wₛ/Σw⌋`` of a total token
    budget — the "rebalance the crawl to 60 % web / 30 % books / 10 %
    code BY TOKENS" step of a training-mix recipe, which neither the
    doc-fraction samplers nor the flat :func:`token_budget_sample`
    (one budget for every source) can express.

    ``weights`` are integers, so every per-source budget is an exact
    floor division — no float share ever decides a document's fate,
    and the same recipe reproduces bit-identically on any engine.
    Sources absent from ``weights``, sources listed with weight 0,
    and sources whose positive weight FLOORS to a 0-token share
    (``budget·wₛ // Σw == 0``) are excluded identically (none is ever
    scanned — a source allotted zero tokens gets zero documents, not
    a free ride for its zero-token documents); a listed source whose
    corpus underfills its share simply contributes what it has (the
    standard mixture-recipe behavior — upsample with
    ``doc_mixture_upsample`` if repetition is wanted).

    Scale shape: sources not in the recipe are filtered BEFORE the
    text scan (predicate pushdown — a dropped source never tokenizes),
    the per-source budget is a LITERAL map lookup (no join, no
    broadcast), and everything else is :func:`token_budget_sample`'s
    range-sharded prefix machinery: shard subtotals → driver-scale
    offset frame → past-budget shards dropped before the detail
    window → per-(source, shard) parallel cumulative sums.

    Returns ``(doc_id, source, n_tok, cum_tok, src_budget)``, with
    ``cum_tok ≤ src_budget`` on every row.
    """
    if budget < 0:
        raise ValueError(f"budget must be non-negative, got {budget}")
    if not weights:
        raise ValueError("weights must name at least one source")
    if any(w < 0 for w in weights.values()):
        raise ValueError(f"weights must be non-negative, got {weights}")
    total_w = sum(weights.values())
    if total_w == 0:
        raise ValueError("at least one weight must be positive")
    # weight 0 == absent: drop the source BEFORE the scan filter, or
    # it would be tokenized for a 0 budget (and its zero-token docs
    # would ride the prefix "for free", cum_tok 0 <= 0).
    weights = {s: w for s, w in weights.items() if w > 0}
    budgets = {
        s: int(budget) * int(w) // total_w for s, w in weights.items()
    }
    # A POSITIVE weight whose share floors to 0 (budget·w // Σw == 0)
    # is the same exclusion: without this, the source passes the scan
    # filter and its zero-token documents ride the prefix "for free"
    # (cum_tok 0 <= 0) — the exact edge the weight-0 pre-filter above
    # guards against, resurfacing through small budgets.  A floored-
    # to-zero share means "this source gets no tokens", so it gets no
    # documents either (zero-token ones included).
    budgets = {s: b for s, b in budgets.items() if b > 0}
    weights = {s: w for s, w in weights.items() if s in budgets}
    if budgets:
        # cast: F.lit(int) types by magnitude (int vs bigint), and the
        # degenerate branch below must match — src_budget is ALWAYS long
        budget_col = F.element_at(
            F.create_map(
                *[F.lit(x) for kv in budgets.items() for x in kv]
            ),
            F.col("source"),
        ).cast("long")
    else:
        # every share floored to 0: an argless create_map() would type
        # as map<string,string> and flip src_budget's dtype to STRING
        # on this one degenerate path — keep the schema stable instead
        budget_col = F.lit(None).cast("long")
    out = _hash_prefix_by_budget(
        df.filter(F.col(source_col).isin(list(weights))),
        budget_col,
        n_shards,
        text_col,
        id_col,
        source_col,
    )
    return out.withColumn("src_budget", budget_col)


def importance_weights(
    df: DataFrame,
    target: Column,
    *,
    n: int = 2,
    buckets: int = 1024,
    alpha: int = 1,
    threshold: float = 1.0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Data Selection via Importance Resampling (DSIR — Xie et al.
    2023, "Data Selection for Language Models via Importance
    Resampling"): score every document by how much more probable its
    hashed n-gram profile is under the TARGET distribution (the rows
    matching ``target``, e.g. a trusted high-quality source) than
    under the raw corpus, then keep the documents whose importance
    ratio clears ``threshold`` — the standard recipe for tilting a web
    crawl toward a reference corpus without training a classifier.

    Adaptation for exact cross-engine replay: DSIR's per-gram
    log-ratio sum needs ``ln()``, whose last-ulp drift across engines
    a value-hash gate cannot tolerate, so the score is the RATIO OF
    MEANS rather than the mean of log-ratios — with ``alpha``
    pseudocount smoothing,

        score = (Σ tgt_c[b] + α·G) · (raw_total + α·B)
              / ((Σ raw_c[b] + α·G) · (tgt_total + α·B))

    over the document's G gram-buckets b: > 1 iff the document's
    buckets are on average relatively more frequent in the target
    than in the raw corpus.  Both operands are exact integers
    (decimal(38,0) — the products overflow a 64-bit long at corpus
    scale), converted once to double for the single division, so
    scores and keep flags are bit-stable on every engine — the same
    log-free trick as :func:`reflinkcep_spark.functions.text
    .lm_quality`.

    Headroom: decimal(38,0) holds the products up to ~1e38 — a corpus
    would need ≳1e19 total grams against a ≳1e19-gram document before
    a product could overflow.  Past that, Spark's default
    precision-loss mode turns the product NULL (where DuckDB's HUGEINT
    raises), so rather than let ``keep`` silently coalesce to false,
    the score column raises at evaluation time if either operand of
    the division went NULL for a document that has grams.

    Hashing is the module's engine-portable md5 bucket (DSIR's own
    hashed n-gram variant quantizes exactly like this, ~10k buckets);
    ``buckets`` bounds the stats table regardless of corpus size.

    Scale shape: explode to gram-buckets once (checkpointed — feeds
    the stats aggregate and the scoring join), ONE bucket-keyed
    aggregate whose output is ≤ ``buckets`` rows, stats broadcast
    back, one doc-keyed aggregate.  No vocabulary-sized table, no
    driver collect.  Documents with fewer than ``n`` tokens have no
    grams: score NULL, ``keep`` false (never silently kept).

    Returns ``(id_col, n_grams, score, keep)``, one row per input
    document.
    """
    from reflinkcep_spark.functions import text

    if buckets < 1:
        raise ValueError(f"buckets must be >= 1, got {buckets}")
    if alpha < 1:
        # alpha = 0 would let an empty target source divide by zero
        # (and make never-seen buckets minus-infinitely unlikely,
        # which a ratio-of-means cannot represent anyway).
        raise ValueError(f"alpha must be >= 1, got {alpha}")
    g = df.select(
        F.col(id_col),
        target.alias("__tgt"),
        F.explode(text.ngrams(text.tokens(F.col(text_col)), n)).alias("g"),
    ).select(
        id_col, "__tgt", (md5_hash60(F.col("g")) % buckets).alias("b")
    )
    # Referenced twice (bucket stats + scoring join): compute once.
    # localCheckpoint, NOT persist — persist was tried (round 10) and
    # rejected empirically: DataFrame.persist registers the subtree
    # with the session CacheManager, which then SILENTLY substitutes
    # the cached relation into every later plan with a matching
    # subtree — a second importance_weights() call on the same input
    # reads InMemoryTableScan instead of recomputing (verified against
    # a live session), corrupting any repeat-timing harness and
    # leaking an entry the function has no safe point to unpersist
    # (the returned frame is lazy).  localCheckpoint's blocks are
    # scoped to this plan alone.  The accepted trade, here and at
    # every other lazy-localCheckpoint site in this package: lineage
    # is destroyed, so on a real cluster an executor loss during the
    # consuming job fails the stage instead of recomputing — a
    # retry-the-job cost, paid only on failure, vs a wrong-measurement
    # + unbounded-cache cost paid on every reuse.
    g = g.localCheckpoint(eager=False)
    cnt = g.groupBy("b").agg(
        F.sum(F.when(F.col("__tgt"), F.lit(1)).otherwise(F.lit(0))).alias("tgt_c"),
        F.count(F.lit(1)).alias("raw_c"),
    )
    # cnt is referenced twice (the 1-row totals + the scoring
    # broadcast), and each reference re-aggregates the GRAM-level
    # frame — a corpus-scale duplicate pass.  Pin the ≤`buckets`-row
    # stats table so the bucket aggregate runs once (round 14).
    cnt = cnt.localCheckpoint(eager=False)
    tot = cnt.agg(
        F.sum("tgt_c").alias("__tgt_total"), F.sum("raw_c").alias("__raw_total")
    )
    dec = "decimal(38,0)"
    ab = F.lit(int(alpha) * int(buckets)).cast(dec)
    ag = (F.lit(int(alpha)) * F.col("n_grams")).cast(dec)
    num = (F.col("__sum_tgt") + ag) * (F.col("__raw_total") + ab)
    den = (F.col("__sum_raw") + ag) * (F.col("__tgt_total") + ab)
    # Every scored row has n_grams ≥ 1, so a NULL operand here can
    # only be decimal(38,0) overflow-to-NULL (precision-loss mode) —
    # fail loudly like the DuckDB oracle's HUGEINT would, instead of
    # letting `keep` silently coalesce to false past ~1e38.
    score = F.when(
        num.isNull() | den.isNull(),
        F.raise_error(
            F.lit(
                "importance_weights: decimal(38,0) overflow in the "
                "score product (corpus beyond ~1e38-gram headroom)"
            )
        ).cast("double"),
    ).otherwise(num.cast("double") / den.cast("double"))
    scored = (
        g.join(F.broadcast(cnt), "b")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            # decimal sums, not long: per-doc Σ raw_c reaches
            # grams_per_doc × corpus/buckets — a 1e13-gram corpus at
            # buckets=256 wraps a 64-bit long on any >~2e5-gram doc,
            # silently, while DuckDB's HUGEINT stays exact
            F.sum(F.col("tgt_c").cast(dec)).alias("__sum_tgt"),
            F.sum(F.col("raw_c").cast(dec)).alias("__sum_raw"),
        )
        .crossJoin(F.broadcast(tot))
        .select(id_col, "n_grams", score.alias("score"))
    )
    # LEFT join back so sub-n-token documents keep a row (score NULL).
    # Take the pre-`spread` scan for the id projection (round 14): the
    # left side is row-set-invariant to partitioning (its ids feed a
    # keyed join, not CPU-heavy per-row work), so reading the bare scan
    # drops the round-robin exchange of the corpus id column that
    # otherwise sits under this join's hash exchange.
    base = getattr(df, "_pre_spread", df)
    return (
        base.select(F.col(id_col)).join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_grams"), F.lit(0)).cast("long").alias("n_grams"),
            "score",
            F.coalesce(
                F.col("score") >= F.lit(float(threshold)), F.lit(False)
            ).alias("keep"),
        )
    )

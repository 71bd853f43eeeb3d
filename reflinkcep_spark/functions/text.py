"""Text analysis for document pipelines: tokenization, counting,
quality scoring, language ID, fingerprinting.

All hot-path functions are Catalyst expressions (split / regexp /
aggregate / md5), so they pipeline inside whole-stage codegen and scale
with the scan — no shuffle, no Python.  Language ID is the one
heuristic that aggregates per-row token sets; it is still expressed
with higher-order array functions, not a UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "tokens",
    "distinct_tokens",
    "token_count",
    "bpe_ish_count",
    "punct_count",
    "fingerprint_md5",
    "rolling_fingerprint",
    "winnow_fingerprints",
    "quality_score",
    "language_scores",
    "ngrams",
    "max_multiplicity",
    "repetition_profile",
    "text_profile",
    "dedup_paragraphs",
    "dedup_paragraphs_fuzzy",
    "pii_counts",
    "scrub_pii",
    "merge_spans",
    "tfidf_topk",
    "gopher_format_flags",
    "boilerplate_profile",
    "BPE_ISH_PATTERN",
    "PII_PATTERNS",
    "STOPWORDS",
]

# Word-ish pieces, digit runs, and single punctuation marks — a cheap
# approximation of a byte-pair tokenizer's pre-tokenization split.  The
# pattern is RE2-safe so the same string works in Spark and DuckDB.
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

PUNCT_PATTERN = r"[^A-Za-z0-9\s]"

STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "for", "on", "with"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit", "auf"],
    "fr": ["le", "la", "les", "et", "est", "pas", "un", "une", "dans", "pour"],
    "es": ["el", "la", "los", "y", "es", "no", "un", "una", "en", "por"],
}


def bind1(value: Column, fn) -> Column:
    """Evaluate ``value`` ONCE per row and pass it to ``fn`` as a bound
    lambda variable (a poor man's ``let``): ``transform`` over a
    1-element array binds its element to a ``NamedLambdaVariable``, so
    every reference inside ``fn`` is a variable lookup instead of a
    re-evaluation of the expression tree.

    Why this exists (round 14): a higher-order function whose lambda
    body references a non-trivial OUTER expression — e.g.
    ``transform(idx, i -> slice(tokens(text), i, n))`` — re-evaluates
    that expression per ELEMENT, not per row (measured: the inline
    form of :func:`ngrams` over split-derived tokens ran the tokenizer
    once per gram position, 3.1 s vs 0.35 s for 266k grams at sf0.1,
    bit-identical output).  Wrapping the expensive input in ``bind1``
    restores once-per-row evaluation while staying a pure Column
    function usable in any projection."""
    return F.element_at(F.transform(F.array(value), fn), 1)


def tokens(col: Column) -> Column:
    """Whitespace tokens with empties dropped (split-semantics-proof).

    ``array_remove(.., '')`` instead of a ``filter`` lambda (round 14):
    identical semantics — ``split`` after ``trim`` yields ``""``
    entries only at edges bounded by non-space whitespace and never
    yields NULL elements, and ``array_remove`` drops every ``""``
    wherever it sits — but ``ArrayRemove`` is whole-stage-codegen'd
    while higher-order ``ArrayFilter`` is CodegenFallback (a per-
    element interpreted lambda dispatch on every document)."""
    return F.array_remove(F.split(F.trim(col), r"\s+"), "")


def distinct_tokens(col: Column) -> Column:
    return F.array_distinct(tokens(col))


def token_count(col: Column) -> Column:
    return F.size(tokens(col))


def bpe_ish_count(col: Column) -> Column:
    # regexp_count, not size(regexp_extract_all(...)): same
    # non-overlapping match count, but no per-row match-array
    # allocation — measurably faster on long documents.
    return F.regexp_count(col, F.lit(BPE_ISH_PATTERN))


# Exactly the complement of PUNCT_PATTERN's char class: ASCII alnum
# plus Java regex \s = [ \t\n\x0B\f\r].  (Non-ASCII whitespace is NOT
# in \s without UNICODE_CHARACTER_CLASS, so both formulations count it
# as punctuation — the equivalence holds for every character.)
_NON_PUNCT_CHARS = (
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789"
    " \t\n\x0b\f\r"
)


def punct_count(col: Column) -> Column:
    # length(translate(text, <non-punct chars>, '')): delete every
    # non-punct character and count what's left.  A char-map scan —
    # measured ~2x faster than regexp-counting `[^A-Za-z0-9\s]` and
    # match-for-match identical (single-char class, no overlap rules).
    return F.length(F.translate(col, _NON_PUNCT_CHARS, ""))


def fingerprint_md5(col: Column) -> Column:
    """Order-insensitive content fingerprint: md5 over the sorted
    distinct token set.  Identical in Spark and DuckDB, so it serves as
    both a dedup key and an oracle-checkable value."""
    return F.md5(F.array_join(F.array_sort(distinct_tokens(col)), " "))


def rolling_fingerprint(col: Column) -> Column:
    """Polynomial rolling hash over the token sequence (order-sensitive):
    h = (h * 31 + token_hash) mod 2^31, kept modular so ANSI-mode
    arithmetic can't overflow.  token_hash is the first 8 hex chars of
    md5 parsed as an integer — md5 renders identical hex in Spark and
    DuckDB, so the whole fingerprint is oracle-checkable cross-engine
    (unlike xxhash64, which only Spark has)."""
    mod = F.lit(1 << 31).cast("long")
    tok_hash = lambda t: F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long")  # noqa: E731
    return F.aggregate(
        tokens(col),
        F.lit(0).cast("long"),
        lambda acc, t: F.pmod(acc * F.lit(31) + tok_hash(t), mod),
    )


def quality_score(col: Column) -> Column:
    """Cheap document-quality heuristic in [0,1]: reward length up to
    ~100 tokens, penalize punctuation density.  Pure arithmetic on two
    counters → identical SQL runs in the oracle."""
    n_tok = token_count(col).cast("double")
    n_punct = punct_count(col).cast("double")
    n_chars = F.length(col).cast("double")
    length_term = F.least(F.lit(1.0), n_tok / F.lit(100.0))
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0))
    return F.round(length_term * (F.lit(1.0) - punct_ratio), 6)


def language_scores(col: Column, *, tokenized: bool = False) -> list[tuple[str, Column]]:
    """Per-language stopword hit ratio over the distinct token set.

    Pass ``tokenized=True`` when ``col`` is already the lower-cased
    distinct-token array: the scores reference ``col`` ~2× per language,
    so feeding a *materialized* token column (staged through its own
    projection, which Catalyst won't inline for non-cheap expressions)
    keeps the tokenizer out of the duplicated subtrees — measured ~8×
    less codegen on the first run.
    """
    toks = col if tokenized else distinct_tokens(F.lower(col))
    out = []
    for lang, words in STOPWORDS.items():
        hits = F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in words])))
        out.append((lang, hits.cast("double") / F.lit(len(words))))
    return out


def language_id(col: Column, *, tokenized: bool = False) -> Column:
    """argmax over language_scores with 'und' (undetermined) when no
    stopword hits at all."""
    scores = language_scores(col, tokenized=tokenized)
    pairs = F.array(
        *[F.struct(s.alias("score"), F.lit(lang).alias("lang")) for lang, s in scores]
    )
    best = F.array_max(pairs)
    return F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und"))


def ngrams(toks: Column, n: int) -> Column:
    """Adjacent word n-grams (with multiplicity) from a token array.

    The token array is bound once per row (:func:`bind1`) before the
    per-position transform: with ``toks`` inlined in the lambda, the
    HOF re-evaluated the whole tokenizer expression per gram position
    (round 14, measured 9× on the decontam gram pipeline)."""

    def _inner(tk: Column) -> Column:
        idx = F.sequence(F.lit(1), F.greatest(F.size(tk) - (n - 1), F.lit(0)))
        return F.when(
            F.size(tk) >= n,
            F.transform(idx, lambda i: F.array_join(F.slice(tk, i, n), " ")),
        ).otherwise(F.array().cast("array<string>"))

    return bind1(toks, _inner)


def max_multiplicity(arr: Column) -> Column:
    """Highest multiplicity of any element in a string array — computed
    per row as sort + longest-equal-run fold, so repetition statistics
    need no explode/groupBy shuffle (the classic plan would shuffle one
    row per n-gram: at 100 TB that's the whole corpus re-keyed just to
    take a per-document max)."""
    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).alias("run"),
        F.lit(0).alias("best"),
    )

    def step(acc, x):
        run = F.when(acc["prev"].eqNullSafe(x), acc["run"] + 1).otherwise(F.lit(1))
        return F.struct(
            x.alias("prev"), run.alias("run"),
            F.greatest(acc["best"], run).alias("best"),
        )

    return F.aggregate(F.array_sort(arr), init, step, lambda acc: acc["best"])


def repetition_profile(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher/C4-style repetition filters, per document:

    * ``ttr`` — type-token ratio (distinct/total tokens; low = loopy
      degenerate text),
    * ``top_token_frac`` — share of the single most frequent token,
    * ``top_2gram_frac`` — share of the most frequent adjacent 2-gram
      among all 2-gram slots,
    * ``dup_2gram_frac`` — fraction of 2-gram slots that are repeats of
      an earlier 2-gram,
    * ``keep`` — the composite filter verdict.

    All ratios are raw int/int double divisions (correctly-rounded IEEE
    quotients of exact integers — bit-identical on any engine, no
    ROUND() tie-break hazard).  Thresholds follow the published Gopher
    rules in spirit, adapted to token (not character) shares.  The
    whole thing is one shuffle-free projection: sort+fold per row
    instead of explode+groupBy (see :func:`max_multiplicity`).
    """
    toks = tokens(F.col(text_col))
    staged = df.select(
        F.col(id_col),
        toks.alias("__t"),
        ngrams(toks, 2).alias("__g2"),
    )
    n_tok = F.size("__t")
    n_g2 = F.size("__g2")
    ttr = F.size(F.array_distinct("__t")) / n_tok
    top_tok = max_multiplicity(F.col("__t")) / n_tok
    top_g2 = F.when(n_g2 > 0, max_multiplicity(F.col("__g2")) / n_g2).otherwise(
        F.lit(0.0)
    )
    dup_g2 = F.when(
        n_g2 > 0, (n_g2 - F.size(F.array_distinct("__g2"))) / n_g2
    ).otherwise(F.lit(0.0))
    return staged.select(
        F.col(id_col),
        n_tok.cast("long").alias("n_tokens"),
        ttr.alias("ttr"),
        top_tok.alias("top_token_frac"),
        top_g2.alias("top_2gram_frac"),
        dup_g2.alias("dup_2gram_frac"),
        (
            (n_tok >= 10)
            & (ttr >= 0.3)
            & (top_tok <= 0.2)
            & (dup_g2 <= 0.2)
        ).alias("keep"),
    )


# PII detection patterns, most-specific first (emails before phones so
# digits inside an address aren't double-counted after replacement).
# RE2-safe: plain character classes and counted repeats only — no
# backreferences or lookaround — so the same pattern runs in Spark,
# DuckDB, and Python re for oracles and tests.
PII_PATTERNS = (
    ("EMAIL", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("SSN", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b"),
    ("PHONE", r"\b[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\b"),
    ("IPV4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"),
)


def pii_counts(col: Column) -> list[tuple[str, Column]]:
    """Per-kind PII match counts for a text column — the audit numbers
    a pre-training scrub reports.  Pure regexp expressions inside
    whole-stage codegen; counting runs on the ORIGINAL text, so counts
    are independent of scrub order."""
    return [
        (kind, F.regexp_count(col, F.lit(pat))) for kind, pat in PII_PATTERNS
    ]


def scrub_pii(col: Column) -> Column:
    """Redact PII in place: each match becomes ``[KIND]``.  Patterns
    apply in declaration order (most-specific first) — chained
    ``regexp_replace`` stays one codegen projection, no UDF."""
    out = col
    for kind, pat in PII_PATTERNS:
        out = F.regexp_replace(out, pat, f"[{kind}]")
    return out


def winnow_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    w: int = 4,
    robust: bool = False,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
    SIGMOD'03 — the MOSS algorithm): hash every k-gram, slide a window
    of ``w`` consecutive hashes, and select each window's minimum
    (rightmost position on ties).  Guarantees every ≥(w+k−1)-token
    match between documents shares a selected fingerprint, at a
    selection density of ~2/(w+1) — the standard local fingerprinting
    scheme for plagiarism/near-dup detection at corpus scale.

    Returns ``(id_col, pos, fp)`` — the 0-based k-gram position and
    the portable 32-bit md5-prefix hash (cross-engine, like
    :func:`rolling_fingerprint`) of each selected fingerprint.

    Shape: winnowing is per-document local, so it needs NO shuffle at
    all — the selection runs entirely inside array expressions on the
    document row (codegen, embarrassingly parallel with the scan).
    Instead of materializing w-row windows (a w× blowup), selection is
    decided per position from run lengths: position p is some window's
    rightmost minimum iff ``a + b ≥ w−1`` intersected with the
    document's valid window range, where ``a`` = consecutive
    predecessors with hash ≥ h(p) and ``b`` = consecutive successors
    with hash > h(p) (the strict / non-strict asymmetry is exactly the
    rightmost-tie rule).  Both runs are capped at w−1, so 2(w−1)
    bounded ``get`` probes per position compute the whole selection —
    O(n·w) per document, no window operator, no exchange; only the
    (small) selected set is exploded at the end.

    ``robust=True`` switches to ROBUST winnowing (SIGMOD'03 §5.2): a
    window whose minimum equals the hash of the previous selection —
    and whose window still contains that selection — re-selects it
    instead of picking a new rightmost minimum, shrinking the selected
    set on repetitive text (boilerplate-heavy web corpora) at the cost
    of the per-window independence the a+b run-length trick exploits.
    Because the choice depends on the previous selection, robust
    selection is a left-to-right fold (``F.aggregate`` over window
    starts, struct accumulator carrying the previous position) — still
    O(n·w) per document and still shuffle-free, just not expressible
    as an independent per-position predicate.  Note the SIGMOD'03
    caveat: robust winnowing weakens the every-(w+k−1)-match guarantee
    to whp (a selection just before the match region can coincide in
    hash with the window minimum only via a 32-bit collision)."""
    toks = tokens(F.col(text_col))
    hs_expr = F.transform(
        ngrams(toks, k),
        lambda g: F.conv(F.substring(F.md5(g), 1, 8), 16, 10).cast("long"),
    )
    # Materialize the hash array into the row ONCE before any lambda
    # touches it: a Column expression referenced inside a higher-order
    # function is re-evaluated on every reference (no common
    # subexpression elimination across lambda boundaries), which would
    # turn the 2(w−1) probes per position into O(n²·w) md5 work.
    staged = df.select(F.col(id_col), hs_expr.alias("_hs"))
    hs = F.col("_hs")

    if robust:
        def robust_selected(n):
            def step(acc, t):
                m = F.least(*[F.get(hs, t + i) for i in range(w)])
                # Rightmost in-window position holding the minimum.
                rp = t
                for i in range(1, w):
                    rp = F.when(F.get(hs, t + i) == m, t + i).otherwise(rp)
                keep = (acc["prev"] >= t) & (F.get(hs, acc["prev"]) == m)
                return F.struct(
                    F.when(keep, acc["prev"]).otherwise(rp).alias("prev"),
                    F.when(keep, acc["sel"])
                    .otherwise(F.array_append(acc["sel"], rp))
                    .alias("sel"),
                )

            return F.aggregate(
                F.sequence(F.lit(0), n - w),
                F.struct(
                    F.lit(-1).alias("prev"),
                    F.array().cast("array<int>").alias("sel"),
                ),
                step,
                lambda acc: acc["sel"],
            )

        n = F.size(hs)
        sel = F.when(n >= w, robust_selected(n)).otherwise(
            F.array().cast("array<int>")
        )
        return staged.select(
            F.col(id_col), hs.alias("_hs2"), F.explode(sel).alias("p")
        ).select(
            F.col(id_col),
            F.col("p").cast("long").alias("pos"),
            F.get(F.col("_hs2"), F.col("p")).alias("fp"),
        )

    def selected(hs, n):
        def keep(pos):
            h = F.get(hs, pos)
            # First violating offset determines the run length; NULL
            # (document edge, out-of-bounds get) never violates — the
            # boundary clamp below handles edges.
            a = F.lit(w - 1)
            b = F.lit(w - 1)
            for i in range(w - 1, 0, -1):
                a = F.when(F.get(hs, pos - i) < h, F.lit(i - 1)).otherwise(a)
                b = F.when(F.get(hs, pos + i) <= h, F.lit(i - 1)).otherwise(b)
            lo = F.greatest(F.lit(0), pos - a)
            hi = F.least(pos + b - (w - 1), n - w)
            return lo <= hi

        # Filter positions FIRST, then build structs only for the
        # ~2/(w+1) survivors — the rejected majority never pays the
        # struct construction.
        return F.transform(
            F.filter(F.sequence(F.lit(0), n - 1), keep),
            lambda pos: F.struct(
                pos.cast("long").alias("pos"), F.get(hs, pos).alias("fp")
            ),
        )

    n = F.size(hs)
    sel = F.when(n >= w, selected(hs, n)).otherwise(
        F.array().cast("array<struct<pos:bigint,fp:bigint>>")
    )
    return staged.select(F.col(id_col), F.explode(sel).alias("s")).select(
        F.col(id_col), F.col("s.pos").alias("pos"), F.col("s.fp").alias("fp")
    )


def lm_quality(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    order: int = 2,
) -> DataFrame:
    """Per-document quality signals from a corpus-trained bigram
    table — the shape of CCNet-style LM quality filtering with the
    language model replaced by the corpus's own bigram statistics, so
    the whole operator stays in one Spark job with no external model:

    * ``n_bigrams`` — document length in bigrams;
    * ``avg_bigram_df`` — mean corpus frequency of the document's
      bigrams (LOW = unusual text: fresh content or noise);
    * ``unique_fraction`` — share of the document's bigrams that occur
      exactly once in the whole corpus (HIGH = no other document
      phrases anything the same way — gibberish, or genuinely novel).

    Both ratios are one IEEE divide of two exact integer sums (the Q14
    recipe), so scores are bit-stable across engines — the log-free
    analogue of a perplexity score, rankable and thresholdable without
    the cross-engine `ln()` drift that exact value-hash gates cannot
    tolerate.

    Scale shape: explode to bigrams once (checkpointed — feeds both
    the count table and the join back), one shuffle to count bigrams,
    one bigram-keyed join, one doc-keyed aggregate.  The bigram count
    table scales with corpus vocabulary, not corpus size — standard
    LM-scoring shape.  Documents with fewer than ``order`` tokens have
    no n-grams and are absent from the output (no score, not a 0
    score).

    ``order`` picks the n-gram order: 2 (default, CCNet-lite bigrams;
    legacy ``n_bigrams``/``avg_bigram_df`` column names) or higher —
    e.g. ``order=3`` approaches CCNet's 5-gram KenLM shape one step
    further at the cost of a bigger count table (columns become
    ``n_3grams``/``avg_3gram_df``).  The fold, the exact-integer sums,
    and the single IEEE divide are identical at every order.
    """
    if order < 2:
        raise ValueError(f"lm_quality needs order >= 2, got {order}")
    g = "bigram" if order == 2 else f"{order}gram"
    bg = df.select(
        F.col(id_col),
        F.explode(ngrams(tokens(F.col(text_col)), order)).alias("bg"),
    )
    # Referenced twice (count table + per-doc join): compute once.
    bg = bg.localCheckpoint(eager=False)
    # Singleton elision: under Zipf, roughly half of all n-gram TYPES
    # are corpus singletons, and "bdf == 1" is EXACTLY "absent from
    # the bdf >= 2 table" — so a LEFT join against only the repeated
    # types plus coalesce(bdf, 1) computes bit-identical scores while
    # the count-table shuffle and the join build side carry only the
    # repeated vocabulary (the term that grows with corpus vocabulary;
    # the VERDICT-r7 watch item on this row's scaling).
    cnt = (
        bg.groupBy("bg")
        .agg(F.count(F.lit(1)).alias("bdf"))
        .filter(F.col("bdf") >= 2)
    )
    n = F.count(F.lit(1))
    return (
        bg.join(cnt, "bg", "left")
        .groupBy(id_col)
        .agg(
            n.alias(f"n_{g}s"),
            (
                F.sum(F.coalesce(F.col("bdf"), F.lit(1))).cast("double")
                / n.cast("double")
            ).alias(f"avg_{g}_df"),
            (
                F.sum(F.when(F.col("bdf").isNull(), F.lit(1)).otherwise(F.lit(0)))
                .cast("double")
                / n.cast("double")
            ).alias("unique_fraction"),
        )
    )


def quality_buckets(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    order: int = 2,
    tail_ratio: tuple = (1, 2),
) -> DataFrame:
    """CCNet-style head/middle/tail quality bucketing (Wenzek et al.
    2020 §4.3): CCNet splits a crawl into three quality tiers by
    comparing each document's LM perplexity against corpus-derived
    cutoffs.  This is that shape with the external LM replaced by the
    corpus's own n-gram statistics (:func:`lm_quality`'s log-free
    score) and the tercile cutoffs replaced by exact mean-relative
    thresholds, so the tier assignment is bit-stable across engines:

    * ``head``   — doc mean n-gram df ≥ the corpus mean (typical,
      well-phrased text under the corpus's own language model);
    * ``tail``   — doc mean n-gram df < ``tail_ratio`` × the corpus
      mean (default half: unusual phrasing — gibberish, boilerplate
      noise, or genuinely novel content, which is why CCNet keeps
      all three tiers on disk rather than deleting the tail);
    * ``middle`` — everything between.

    ``tail_ratio`` is an exact rational ``(num, den)`` so the cutoff
    stays inside the integer cross-multiply — corpora whose df
    distribution concentrates near the mean (tiny vocabularies) want
    a fraction close to 1.

    Every comparison is an integer cross-multiply in decimal(38,0)
    (``Σbdf_doc · N_corpus  vs  Σbdf_corpus · n_doc`` — the Q11/DSIR
    recipe), never a float divide, so the boundary cases agree with
    any exact engine.  Documents with fewer than ``order`` tokens
    have no n-grams and belong to no tier (absent, not defaulted).

    Returns the tier summary ``(bucket, n_docs, n_<g>s)`` — one row
    per non-empty tier.

    Scale shape: identical to :func:`lm_quality` (explode once —
    checkpointed, one vocabulary-keyed count with singleton elision,
    one doc-keyed aggregate) plus ONE broadcast 1-row global
    aggregate and a 3-group final fold; the corpus never shuffles for
    the cutoffs.  Headroom: the cross-products stay below 1e38
    (decimal(38,0), DuckDB HUGEINT) for any corpus under ~1e18 total
    n-grams with per-doc Σbdf under ~1e18 — far beyond 100 TB.
    """
    g = "bigram" if order == 2 else f"{order}gram"
    doc = quality_bucket_docs(
        df, text_col=text_col, id_col=id_col, order=order,
        tail_ratio=tail_ratio,
    )
    return doc.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_bg").alias(f"n_{g}s"),
    )


def quality_bucket_docs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    order: int = 2,
    tail_ratio: tuple = (1, 2),
    carry_cols: tuple = (),
) -> DataFrame:
    """Per-document tier assignment behind :func:`quality_buckets`
    (same exact-integer cross-multiply contract — see its docstring;
    factored out in round 11 so :func:`quality_tier_calibration` can
    reuse the pipeline without re-deriving the cutoffs).

    Returns one row per document with ≥ 1 n-gram:
    ``(*carry_cols, id_col, bucket, n_bg)``.  ``carry_cols`` are
    passthrough document attributes (e.g. ``source``) carried through
    the document aggregate as extra grouping keys — functionally
    dependent on ``id_col``, so the groups are unchanged and the join
    back to the input that a separate lookup would need is avoided.

    Scale shape: as documented on :func:`quality_buckets` — explode
    once (lazily checkpointed), one vocabulary-keyed count with
    singleton elision, one doc-keyed aggregate, ONE broadcast 1-row
    global aggregate; the corpus never shuffles for the cutoffs.
    """
    if order < 2:
        raise ValueError(f"quality_buckets needs order >= 2, got {order}")
    t_num, t_den = (int(tail_ratio[0]), int(tail_ratio[1]))
    if not (0 < t_num < t_den):
        raise ValueError(
            f"tail_ratio must be a fraction in (0, 1), got {tail_ratio}"
        )
    carry = [F.col(c) for c in carry_cols]
    bg = df.select(
        *carry,
        F.col(id_col),
        F.explode(ngrams(tokens(F.col(text_col)), order)).alias("bg"),
    )
    bg = bg.localCheckpoint(eager=False)
    # Singleton elision, exactly as lm_quality: bdf == 1 ⇔ absent
    # from the bdf >= 2 table.
    cnt = (
        bg.groupBy("bg")
        .agg(F.count(F.lit(1)).alias("bdf"))
        .filter(F.col("bdf") >= 2)
    )
    doc = (
        bg.join(cnt, "bg", "left")
        .groupBy(*carry_cols, id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bg"),
            F.sum(F.coalesce(F.col("bdf"), F.lit(1))).alias("sum_bdf"),
        )
    )
    dec = "decimal(38,0)"
    glob = doc.agg(
        F.sum("n_bg").cast(dec).alias("__g_n"),
        F.sum("sum_bdf").cast(dec).alias("__g_sum"),
    )
    lhs = F.col("sum_bdf").cast(dec) * F.col("__g_n")
    rhs = F.col("__g_sum") * F.col("n_bg").cast(dec)
    bucket = (
        F.when(lhs >= rhs, F.lit("head"))
        .when(lhs * F.lit(t_den) < rhs * F.lit(t_num), F.lit("tail"))
        .otherwise(F.lit("middle"))
    )
    return doc.crossJoin(F.broadcast(glob)).select(
        *carry_cols, id_col, bucket.alias("bucket"), F.col("n_bg")
    )


def quality_tier_calibration(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    order: int = 2,
    tail_ratio: tuple = (1, 2),
) -> DataFrame:
    """Per-source quality-tier calibration: how each source's tier
    mix compares to the corpus — the dataset-card table behind "is
    the new crawl snapshot dragging the tail tier?" and the input to
    per-source quality quotas.  Tiers come from the CORPUS-level
    cutoffs (:func:`quality_bucket_docs` — one global ruler), so the
    per-source rows are directly comparable; a per-source cutoff
    would define away exactly the skew this measures.

    Returns one row per (group, bucket) with ≥ 1 document:
    ``(group_col, bucket, n_docs, share_ppm, lift_ppm)`` where
    ``share_ppm = ⌊10⁶·n_docs / n_group⌋`` (the tier's share within
    the source) and ``lift_ppm = ⌊10⁶·n_docs·n_all / (n_group·
    n_bucket)⌋`` (share relative to the tier's corpus-wide share;
    1_000_000 = exactly proportional).  Both are exact INTEGRAL
    divisions (SQL ``div``) on decimal(38,0) operands — never a float
    divide, whose scale-capped rounding could differ from an exact
    engine's floor by one — so the table hashes identically on any
    exact engine (the ``text_bigram_lift`` determinism recipe; all
    quantities positive, so truncation ≡ floor).

    Scale shape: :func:`quality_bucket_docs`' pipeline (the group
    column rides the doc aggregate as a dependent grouping key — no
    extra join), then a (group, bucket)-keyed count, a group-keyed
    count, a 3-row bucket count and a 1-row total — the last two
    broadcast; at most ``3·|sources|`` output rows.
    """
    docs = quality_bucket_docs(
        df, text_col=text_col, id_col=id_col, order=order,
        tail_ratio=tail_ratio, carry_cols=(group_col,),
    )
    cell = docs.groupBy(group_col, "bucket").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    # one row per group / per bucket / overall — derived from the
    # cell table, so the doc pipeline runs once
    cell = cell.localCheckpoint(eager=False)
    grp = cell.groupBy(group_col).agg(F.sum("n_docs").alias("n_group"))
    bkt = cell.groupBy("bucket").agg(F.sum("n_docs").alias("n_bucket"))
    tot = cell.agg(F.sum("n_docs").alias("n_all"))
    dec = "CAST({} AS DECIMAL(38,0))"
    m, nd, ng, nb, na = (
        dec.format(1_000_000),
        dec.format("n_docs"),
        dec.format("n_group"),
        dec.format("n_bucket"),
        dec.format("n_all"),
    )
    return (
        cell.join(grp, group_col)
        .join(F.broadcast(bkt), "bucket")
        .crossJoin(F.broadcast(tot))
        .select(
            group_col,
            "bucket",
            "n_docs",
            F.expr(f"({m} * {nd}) div {ng}")
            .cast("long")
            .alias("share_ppm"),
            F.expr(f"({m} * {nd} * {na}) div ({ng} * {nb})")
            .cast("long")
            .alias("lift_ppm"),
        )
    )


def dedup_paragraphs(
    df: DataFrame,
    sep: str = "\n",
    unit_tokens: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Intra-document repetition removal — the exact-duplicate
    paragraph/line filter of the RefinedWeb (Penedo et al. 2023) and
    MassiveText/Gopher (Rae et al. 2021) curation recipes: within each
    document, every paragraph equal to an EARLIER paragraph of the
    same document is dropped, and the survivors are reassembled in
    their original order.  The intra-doc complement of the cross-doc
    ExactSubstr scrub (:func:`reflinkcep_spark.functions.dedup
    .scrub_spans`): boilerplate repeated INSIDE a page (cookie
    banners, nav blocks pasted per-section) never leaves the row.

    Two unit modes: by default paragraphs are ``sep``-separated
    segments (newline for line-dedup, ``"\\n\\n"`` for
    paragraph-dedup), preserved verbatim — including empty segments,
    which dedup like any other, matching the exact-match recipes.
    ``unit_tokens=k`` instead treats each run of k whitespace tokens
    as the unit (for corpora with no line structure); reassembly then
    single-space-normalizes, identically on both engine and oracle.

    Scale shape: ZERO exchanges — a narrow per-row array fold
    (split → ``array_distinct``, which keeps first occurrences in
    order → join), whole-stage codegen end to end, the same contract
    as ``doc_winnow_robust``.  Row width is the only cost driver.

    Returns (id_col, text_clean, n_removed) with one row per input
    document.
    """
    units, joiner = _split_units(F.col(text_col), sep, unit_tokens)
    kept = F.array_distinct(units)
    return df.select(
        F.col(id_col),
        F.array_join(kept, joiner).alias("text_clean"),
        (F.size(units) - F.size(kept)).cast("long").alias("n_removed"),
    )


def dedup_paragraphs_global(
    df: DataFrame,
    sep: str = "\n",
    unit_tokens: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """CROSS-document paragraph/line dedup — the corpus-wide sibling
    of :func:`dedup_paragraphs` and the other half of the
    RefinedWeb / CCNet recipe: a paragraph that appears in MANY
    documents (cookie banners, licence footers, navigation blocks,
    syndicated ledes) keeps exactly ONE occurrence in the whole
    corpus — its first, by ``(doc_id, position)`` — and every other
    occurrence in every other document is removed before the
    survivors are reassembled in original order.  CCNet runs exactly
    this as per-paragraph hash dedup across each snapshot; intra-doc
    dedup cannot see it because each document contains the paragraph
    once.

    Unit modes and reassembly are shared with :func:`dedup_paragraphs`
    (``sep`` segments verbatim, or ``unit_tokens=k`` whitespace
    chunks, single-space normalized) — with ONE cross-doc difference:
    EMPTY segments are exempt.  Intra-doc they dedup like any other
    (a doc's own blank-line runs are repetition); corpus-wide they
    are document STRUCTURE, and letting the corpus-first blank line
    win would strip the blank-line structure of every later document
    and mark empty documents as "removed" content.  So empty units
    are always kept and never counted in ``n_removed``.  Canonical
    order for non-empty units is the lexicographic
    ``(doc_id, position)`` MIN — ids must be orderable; with numeric
    ids that is "earliest document wins", the recipes' usual
    arbitrary-but-deterministic choice.  Documents that lose every
    unit (and empty documents) are kept with ``text_clean = ''``.

    Returns ``(id_col, text_clean, n_removed)``, one row per input
    document.

    Scale shape — three keyed exchanges over the unit-occurrence
    table, none corpus²:

    1. unit-keyed ``MIN(struct(doc_id, pos))`` — map-side combinable,
       so a boilerplate unit occurring 10⁸ times partial-aggregates
       to one candidate per map partition BEFORE the shuffle;
    2. unit-keyed join of occurrences against that first-occurrence
       table (both sides hash-partitioned on the unit; the same hot
       unit is the classic AQE skew-join case and splits cleanly
       because the dimension side is one row per unit);
    3. doc-keyed reassembly (collect + in-row sort + join), the same
       shape as every reassembly in this module.

    The unit STRING itself is the shuffle key; for long paragraphs a
    production run would key on ``xxhash64(unit)`` instead — kept as
    the raw string here so the oracle comparison stays exact, the
    same trade documented on the md5/xxhash64 sketch twins.
    """
    units, joiner = _split_units(F.col(text_col), sep, unit_tokens)
    occ = df.select(
        F.col(id_col), F.posexplode(units).alias("pos", "unit")
    )
    # The occurrence table feeds TWO consumers — the first-occurrence
    # aggregate and the mark join — keyed differently, so Catalyst
    # re-runs the scan → split → posexplode subtree for each (round
    # 14: the audited plan held 6 parquet scans of the corpus).  A
    # lazy localCheckpoint computes the explode once; both consumers
    # read the materialized frame (one corpus pass instead of two,
    # the dedup_clusters/tfidf_topk recipe).
    occ = occ.localCheckpoint(eager=False)
    first = occ.groupBy("unit").agg(
        F.min(F.struct(F.col(id_col), F.col("pos"))).alias("__first")
    )
    kept_flag = (
        (F.col("unit") == "")  # structure, not content — see docstring
        | (
            (F.col(id_col) == F.col("__first")[id_col])
            & (F.col("pos") == F.col("__first")["pos"])
        )
    ).alias("__kept")
    marked = occ.join(first, "unit").select(
        id_col, "pos", "unit", kept_flag
    )
    agg = marked.groupBy(id_col).agg(
        F.array_sort(
            F.collect_list(
                F.when(
                    F.col("__kept"), F.struct(F.col("pos"), F.col("unit"))
                )
            )
        ).alias("__kept_units"),
        F.sum(F.when(F.col("__kept"), 0).otherwise(1))
        .cast("long")
        .alias("n_removed"),
    )
    # empty documents never reach posexplode — restore them via the
    # pruning-friendly id-only left join (same contract as the
    # intra-doc oracle's COALESCE branch).  Pre-`spread` scan for the
    # id projection (round 14): row-set-invariant to partitioning, so
    # the bare scan skips the round-robin exchange of the id column.
    return (
        getattr(df, "_pre_spread", df).select(id_col)
        .join(agg, id_col, "left")
        .select(
            id_col,
            F.coalesce(
                F.array_join(
                    F.transform("__kept_units", lambda s: s["unit"]), joiner
                ),
                F.lit(""),
            ).alias("text_clean"),
            F.coalesce(F.col("n_removed"), F.lit(0)).alias("n_removed"),
        )
    )


def _unit_shingles(u: Column, shingle_n: int) -> Column:
    """Distinct ``shingle_n``-gram shingle set of one unit's token run
    (the similarity alphabet of the fuzzy dedup pair).  A unit shorter
    than ``shingle_n`` tokens contributes its whole run as a single
    shingle, so short exact repeats are still caught — and an empty
    unit only ever matches another empty unit."""
    def _inner(ut: Column) -> Column:
        return F.when(
            F.size(ut) >= shingle_n,
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), F.size(ut) - F.lit(shingle_n - 1)),
                    lambda i: F.array_join(F.slice(ut, i, shingle_n), " "),
                )
            ),
        ).otherwise(F.array(F.array_join(ut, " ")))

    # bind the tokenizer once per unit (bind1): inlined in the lambda
    # it would re-run per shingle position (round 14, see ngrams)
    return bind1(F.array_remove(F.split(F.trim(u), r"\s+"), ""), _inner)


def dedup_paragraphs_global_fuzzy(
    df: DataFrame,
    sep: str = "\n",
    unit_tokens: int | None = None,
    threshold: tuple[int, int] = (1, 2),
    shingle_n: int = 2,
    max_df: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """CROSS-document NEAR-duplicate paragraph/line removal — the
    remaining cell of the paragraph-dedup 2×2 (intra/cross ×
    exact/fuzzy): syndicated boilerplate repeated ACROSS pages with
    small mutations (dates, bylines, counters swapped per site),
    which the cross-doc exact pass misses and the intra-doc fuzzy
    pass cannot see.  A unit occurrence is removed iff SOME earlier
    occurrence — ``(doc_id, pos)`` lexicographic, corpus-wide, same
    document included, so this SUBSUMES the intra-doc any-earlier
    rule — is near-duplicate: Jaccard over distinct ``shingle_n``-gram
    sets ≥ ``threshold``, the same exact ``den·|A∩B| ≥ num·|A∪B|``
    cross-multiply as :func:`dedup_paragraphs_fuzzy`.  Survivors are
    reassembled in original order; empty units are exempt structure,
    exactly as :func:`dedup_paragraphs_global`.

    All-pairs across a corpus is corpus², so candidates come from a
    shingle-keyed INVERTED INDEX with an ABSOLUTE posting cap:
    shingles occurring in more than ``max_df`` unit occurrences are
    dropped from the index (the :func:`reflinkcep_spark.functions
    .dedup.ngram_jaccard_pairs` recall-for-cost trade — a unit ALL of
    whose shingles are that hot never generates candidates; raise the
    cap to trade cost for recall).  The cap is absolute, not a corpus
    fraction, so replication probes measure like for like.

    Scale shape — keyed exchanges over unit/posting tables only,
    never corpus²: one combinable posting count (hot-shingle
    detection), one anti join dropping hot postings, one shingle-
    keyed self-join whose per-shingle fan-out is ≤ ``max_df``² by
    construction (each side carries the unit's small shingle array,
    ~``unit_tokens`` entries, so verification happens in the join
    projection — no lookup joins), one distinct over removed
    occurrences, one occurrence-keyed mark join, one doc-keyed
    reassembly.  A same-pair match via several shared shingles
    collapses in the removed-distinct, not in a pair-level dedup.

    Returns ``(id_col, text_clean, n_removed)``, one row per input
    document.
    """
    num, den = threshold
    if not (0 < num <= den):
        raise ValueError(
            f"threshold must be a rational in (0, 1], got {num}/{den}"
        )
    if shingle_n < 1:
        raise ValueError(f"shingle_n must be >= 1, got {shingle_n}")
    if max_df < 1:
        raise ValueError(f"max_df must be >= 1, got {max_df}")
    units, joiner = _split_units(F.col(text_col), sep, unit_tokens)
    occ = df.select(
        F.col(id_col), F.posexplode(units).alias("pos", "unit")
    )
    # Four consumers reference the unit/posting pipeline — the hot-
    # shingle count, BOTH sides of the candidate self-join, and the
    # reassembly — and Catalyst re-runs the scan → split → shingle →
    # explode subtree for each (round 14: the audited plan held 12
    # parquet scans of the corpus).  Two lazy localCheckpoints collapse
    # that to ONE corpus pass: `occ` (unit explode — shared by the
    # posting pipeline and the reassembly join) and `cold` (the capped
    # posting index — shared by both self-join sides, so the shingle
    # computation AND the hot-anti-join run once, not twice).
    occ = occ.localCheckpoint(eager=False)
    post = (
        occ.filter(F.col("unit") != "")  # empty units: structure, exempt
        .select(
            id_col,
            "pos",
            _unit_shingles(F.col("unit"), shingle_n).alias("__sh"),
        )
        .select(id_col, "pos", "__sh", F.explode("__sh").alias("__g"))
        # hot-count AND the anti-join's left side both consume the
        # posting pipeline; pin it so shingling runs exactly once
        .localCheckpoint(eager=False)
    )
    hot = (
        post.groupBy("__g")
        .agg(F.count(F.lit(1)).alias("__df"))
        .filter(F.col("__df") > max_df)
        .select("__g")
    )
    cold = post.join(hot, "__g", "left_anti").localCheckpoint(eager=False)
    a = cold.select(
        F.col("__g"),
        F.col(id_col).alias("__ida"),
        F.col("pos").alias("__posa"),
        F.col("__sh").alias("__sha"),
    )
    b = cold.select(
        F.col("__g"),
        F.col(id_col).alias("__idb"),
        F.col("pos").alias("__posb"),
        F.col("__sh").alias("__shb"),
    )
    earlier = (F.col("__ida") < F.col("__idb")) | (
        (F.col("__ida") == F.col("__idb")) & (F.col("__posa") < F.col("__posb"))
    )
    near = (
        F.size(F.array_intersect(F.col("__sha"), F.col("__shb")))
        * F.lit(int(den))
        >= F.size(F.array_union(F.col("__sha"), F.col("__shb")))
        * F.lit(int(num))
    )
    removed = (
        a.join(b, "__g")
        .filter(earlier & near)
        .select(F.col("__idb").alias(id_col), F.col("__posb").alias("pos"))
        .distinct()
        .withColumn("__removed", F.lit(True))
    )
    agg = (
        occ.join(removed, [id_col, "pos"], "left")
        .groupBy(id_col)
        .agg(
            F.array_sort(
                F.collect_list(
                    F.when(
                        F.col("__removed").isNull(),
                        F.struct(F.col("pos"), F.col("unit")),
                    )
                )
            ).alias("__kept_units"),
            F.sum(F.when(F.col("__removed").isNull(), 0).otherwise(1))
            .cast("long")
            .alias("n_removed"),
        )
    )
    # Pre-`spread` scan for the id projection (round 14): same
    # rationale as dedup_paragraphs_global above.
    return (
        getattr(df, "_pre_spread", df).select(id_col)
        .join(agg, id_col, "left")
        .select(
            id_col,
            F.coalesce(
                F.array_join(
                    F.transform("__kept_units", lambda s: s["unit"]), joiner
                ),
                F.lit(""),
            ).alias("text_clean"),
            F.coalesce(F.col("n_removed"), F.lit(0)).alias("n_removed"),
        )
    )


def _split_units(
    c: Column, sep: str, unit_tokens: int | None
) -> tuple[Column, str]:
    """The shared unit splitter of the intra-doc dedup pair: ``sep``
    mode keeps segments verbatim; ``unit_tokens=k`` mode chunks the
    whitespace token stream into k-token runs (single-space
    normalized).  Returns (units array column, reassembly joiner)."""
    import re as _re

    if unit_tokens is None:
        # sep is a LITERAL separator (the docstring contract), but
        # F.split takes a Java regex — escape it.
        return F.split(c, _re.escape(sep)), sep
    if unit_tokens < 1:
        raise ValueError(f"unit_tokens must be >= 1, got {unit_tokens}")
    def _units(toks: Column) -> Column:
        n = F.size(toks)
        # chunk starts 0, k, 2k, …; sequence(0, -1) would DESCEND, so
        # the empty document needs an explicit empty-array branch
        starts = F.when(n > 0, F.sequence(
            F.lit(0), F.floor((n - F.lit(1)) / F.lit(unit_tokens)).cast("int")
        )).otherwise(F.array().cast("array<int>"))
        return F.transform(
            starts,
            lambda i: F.array_join(
                F.slice(toks, i * unit_tokens + 1, unit_tokens), " "
            ),
        )

    # bind the tokenizer once per row (bind1): inlined in the lambda it
    # would re-run per chunk start (round 14, see ngrams)
    return bind1(tokens(c), _units), " "


def dedup_paragraphs_fuzzy(
    df: DataFrame,
    sep: str = "\n",
    unit_tokens: int | None = None,
    threshold: tuple[int, int] = (1, 2),
    shingle_n: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """NEAR-duplicate intra-document repetition removal — the fuzzy
    sibling of :func:`dedup_paragraphs`, covering the case the exact
    filter misses: boilerplate repeated inside a page with small
    mutations (dates, counters, names swapped per section), the
    Gopher (Rae et al. 2021) duplicate-line family extended from
    equality to n-gram Jaccard, per the RefinedWeb/Dolma curation
    recipes.

    Within each document, unit j is dropped iff SOME EARLIER unit
    i < j is near-duplicate: Jaccard over the units' distinct
    ``shingle_n``-gram sets ≥ ``threshold`` (a ``(num, den)`` rational
    compared by exact integer cross-multiply —
    ``den·|A∩B| ≥ num·|A∪B|`` — so the boundary is bit-stable across
    engines, the same trick as ``quality_buckets``).  "Any earlier
    unit", not "earlier KEPT unit": unlike exact equality, near-dup
    is not transitive, and the any-earlier rule is both the more
    aggressive scrub and the one a set-based engine (or the SQL
    oracle's plain i<j self-join) can express without a sequential
    fold.  A unit shorter than ``shingle_n`` tokens contributes its
    whole token run as a single shingle, so short exact repeats are
    still caught (and an empty unit only ever matches another empty
    unit).

    Unit modes and reassembly are shared with :func:`dedup_paragraphs`
    (``sep`` segments verbatim, or ``unit_tokens=k`` token runs).

    Scale shape: ZERO exchanges — a narrow per-row fold, whole-stage
    codegen end to end.  Per-row cost is O(P²·s) for P units of s
    shingles (the i<j comparison matrix), so the cost driver is ROW
    WIDTH SQUARED: fine for paragraph-scale P (a 1 000-paragraph page
    is ~500k in-row set intersections, all row-local), and a
    pathological single row can never stall a neighbour — but for
    book-length inputs, chunk first or use the cross-doc MinHash path
    (functions/dedup.py), which this operator complements, not
    replaces.

    Returns (id_col, text_clean, n_removed), one row per document.
    """
    num, den = threshold
    if not (0 < num <= den):
        raise ValueError(
            f"threshold must be a rational in (0, 1], got {num}/{den}"
        )
    if shingle_n < 1:
        raise ValueError(f"shingle_n must be >= 1, got {shingle_n}")
    units, joiner = _split_units(F.col(text_col), sep, unit_tokens)

    def _shingles(u: Column) -> Column:
        return _unit_shingles(u, shingle_n)

    def _near(a: Column, b: Column) -> Column:
        return (
            F.size(F.array_intersect(a, b)) * F.lit(int(den))
            >= F.size(F.array_union(a, b)) * F.lit(int(num))
        )

    sh = F.col("__sh")
    dup = F.transform(
        sh,
        lambda s, j: F.exists(
            F.slice(sh, F.lit(1), j), lambda t: _near(t, s)
        ),
    )
    kept = F.filter(
        F.zip_with(
            F.col("__units"), F.col("__dup"), lambda u, d: F.when(~d, u)
        ),
        lambda x: x.isNotNull(),
    )
    return (
        df.select(F.col(id_col), units.alias("__units"))
        .select(
            id_col, "__units", F.transform(F.col("__units"), _shingles).alias("__sh")
        )
        .select(id_col, "__units", dup.alias("__dup"))
        .select(
            F.col(id_col),
            F.array_join(kept, joiner).alias("text_clean"),
            F.size(F.filter(F.col("__dup"), lambda d: d))
            .cast("long")
            .alias("n_removed"),
        )
    )


def text_profile(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document stats frame: counts, quality, fingerprint."""
    c = F.col(text_col)
    return df.select(
        F.col(id_col),
        token_count(c).alias("n_tokens"),
        bpe_ish_count(c).alias("n_bpe_tokens"),
        F.length(c).alias("n_chars_actual"),
        punct_count(c).alias("n_punct"),
        quality_score(c).alias("quality"),
        fingerprint_md5(c).alias("fingerprint"),
    )


def merge_spans(spans: Column) -> Column:
    """Union of half-open integer intervals — consolidate annotation
    spans (array<struct<s, e>>) into their minimal disjoint cover,
    sorted by start.

    The Dolma-style attribute pipeline emits one span list per tagger
    (PII hits, quality slices, scrub targets); before any text surgery
    the spans must be unioned, or overlapping edits double-fire.  Two
    spans merge iff they overlap OR touch (``s <= cur_e`` under
    half-open [s, e) — [0,5) + [5,8) = [0,8)); ties sort by (s, e).

    Scale shape: a per-row ``array_sort`` + ``aggregate`` fold — ZERO
    exchanges, whole-stage codegen, O(P log P) per row for P spans.
    The SQL-engine equivalent is the gaps-and-islands window idiom
    (running MAX(e) partition-wide); the in-row fold avoids even that
    per-doc window shuffle, because a span list lives inside its row.

    Idempotent (merging a merged list is the identity) and
    order-insensitive (input permutation cannot change the output) —
    both property-tested.
    """
    acc_t = (
        "STRUCT<arr: ARRAY<STRUCT<s: BIGINT, e: BIGINT>>, cs: BIGINT, ce: BIGINT>"
    )
    init = F.expr(
        "CAST(struct(CAST(array() AS ARRAY<STRUCT<s: BIGINT, e: BIGINT>>), "
        f"CAST(-1 AS BIGINT), CAST(-1 AS BIGINT)) AS {acc_t})"
    )
    # ce = -1 flags "no open interval yet", which makes the fold
    # DEPEND on the stated domain (0 <= s <= e): a negative-coordinate
    # span would read as "no open interval" and silently corrupt the
    # union.  So the precondition is enforced in-plan (the kmeans/JL
    # guard discipline), not just stated: any span with s < 0 or
    # e < s raises before the fold ever runs.
    checked = F.when(
        F.exists(spans, lambda sp: (sp["s"] < 0) | (sp["e"] < sp["s"])),
        F.raise_error(
            "merge_spans: spans must satisfy 0 <= s <= e (half-open "
            "[s, e) integer intervals)"
        ),
    ).otherwise(F.array_sort(spans))
    return F.aggregate(
        checked,
        init,
        lambda acc, sp: F.when(
            acc["ce"] < 0,
            F.struct(acc["arr"].alias("arr"), sp["s"].alias("cs"), sp["e"].alias("ce")),
        )
        .when(
            sp["s"] <= acc["ce"],
            F.struct(
                acc["arr"].alias("arr"),
                acc["cs"].alias("cs"),
                F.greatest(acc["ce"], sp["e"]).alias("ce"),
            ),
        )
        .otherwise(
            F.struct(
                F.concat(
                    acc["arr"],
                    F.array(F.struct(acc["cs"].alias("s"), acc["ce"].alias("e"))),
                ).alias("arr"),
                sp["s"].alias("cs"),
                sp["e"].alias("ce"),
            )
        ),
        lambda acc: F.when(acc["ce"] < 0, acc["arr"]).otherwise(
            F.concat(
                acc["arr"], F.array(F.struct(acc["cs"].alias("s"), acc["ce"].alias("e")))
            )
        ),
    )


def tfidf_topk(
    df: DataFrame,
    queries: dict[int, tuple[str, ...]],
    k: int = 10,
    shards: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact-rational tf·idf ranked retrieval: top-``k`` documents per
    query, scored ``Σ_t tf(d,t) · N/df(t)`` — the classical keyword
    search primitive (the BM25 family's ancestor), kept EXACT instead
    of floating: per query the common denominator is ``Π df(t)``, so
    the numerator ``N · Σ_t tf·(Π_{t'≠t} df)`` is an integer, ranking
    within a query needs the numerator alone (the denominator is
    query-constant), and no ``log``/float ever enters — the DSIR
    recipe (no cross-engine ``ln()`` drift), here taken all the way to
    the rank.  Smoothed/log idf variants reweight but rarely reorder
    at these df spreads; what matters for the oracle contract is that
    this ranking is bit-stable.

    Query terms absent from the corpus are ignored (inner df join);
    a query whose terms are all absent produces no rows.  Duplicate
    terms within a query are rejected (they would double-count tf).

    Scale shape: the token explode is filtered to the query vocabulary
    IMMEDIATELY (a literal ``isin`` — at 100 TB this is the difference
    between shuffling the corpus's tokens and shuffling its query-term
    hits), one (doc, term) tf aggregate, df/weights computed on the
    tiny (query, term) frame and BROADCAST back, then a TWO-PHASE
    top-k: rank within (query, doc_id mod ``shards``) shards first,
    then rank the ≤ queries·shards·k survivors — a single window
    partitioned only by query_id would funnel every scored document
    of a query through one task.  Phase 1 keeps the global top-k
    exactly (every global winner wins its shard).

    Overflow rail, BOTH stages: (1) if the decimal(38,0) arithmetic
    itself overflows (``den = Π df`` or ``num = s·N`` past 38 digits),
    non-ANSI Spark yields NULL — guarded in-plan, raising instead of
    ranking garbage rows (the inputs are never NULL, so a NULL decimal
    result can only be overflow); (2) the final BIGINT cast raises
    (like the oracle's HUGEINT→BIGINT cast would error) rather than
    silently nulling.  ``N·tf·df^(|Q|-1)`` stays under 2⁶³ up to
    ~3·10⁵-doc corpora for 3-term queries; widen the output to
    decimal for more.

    Returns (query_id, rank, doc_id, tfidf_num, tfidf_den), rank 1..k
    by (score desc, doc_id asc).
    """
    from pyspark.sql import Window

    for qid, ts in queries.items():
        if not ts:
            raise ValueError(f"query {qid} has no terms")
        if len(set(ts)) != len(ts):
            raise ValueError(f"query {qid} has duplicate terms")
    spark = df.sparkSession
    terms = spark.createDataFrame(
        [(int(qid), t) for qid, ts in sorted(queries.items()) for t in ts],
        "query_id long, term string",
    )
    vocab = sorted({t for ts in queries.values() for t in ts})
    tf = (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.explode(tokens(F.col(text_col))).alias("term"),
        )
        .filter(F.col("term").isin(vocab))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    # Referenced twice (df derivation + the scoring join): compute the
    # corpus-side explode+aggregate once (the lm_quality recipe).
    tf = tf.localCheckpoint(eager=False)
    dft = tf.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))
    tdf = terms.join(dft, "term")
    one = F.lit(1).cast("decimal(38,0)")
    den = tdf.groupBy("query_id").agg(
        F.aggregate(
            F.collect_list(F.col("df").cast("decimal(38,0)")),
            one,
            lambda a, x: (a * x).cast("decimal(38,0)"),
        ).alias("den")
    )
    # Overflow rail, stage 1 of 2: every decimal input above is
    # non-null (inner joins over non-null df counts), so a NULL decimal
    # RESULT can only mean the (38,0) arithmetic itself overflowed —
    # non-ANSI Spark nulls instead of raising, and a NULL den would
    # otherwise sail through the BIGINT-cast guard at the end (which
    # only fires on non-null decimals that don't fit a long).
    def _dec_or_raise(c, name):
        return F.when(
            c.isNull(),
            F.raise_error(
                f"{name} overflows DECIMAL(38,0) — fewer/rarer query "
                "terms or a wider scoring type required"
            ),
        ).otherwise(c)

    # den is ≤ |queries| rows; broadcast so the tiny weight frame never
    # sort-merge-joins.
    wt = tdf.join(F.broadcast(den), "query_id").select(
        "query_id",
        "term",
        # den is divisible by df by construction, so the decimal
        # quotient is integral and the (38,0) cast exact.
        (_dec_or_raise(F.col("den"), "tfidf den = prod(df)") / F.col("df"))
        .cast("decimal(38,0)")
        .alias("wt"),
        "den",
    )
    n_docs = df.agg(F.count(F.lit(1)).cast("decimal(38,0)").alias("n_docs"))
    scored = (
        tf.join(F.broadcast(wt), "term")
        .groupBy("query_id", "doc_id")
        .agg(
            F.sum(F.col("tf") * F.col("wt")).alias("s"),
            F.min("den").alias("den"),  # query-constant; min is just "the value"
        )
        .crossJoin(F.broadcast(n_docs))
        .select(
            "query_id",
            "doc_id",
            # Overflow rail, stage 2: s (decimal sum) and s·n_docs both
            # null only on (38,0) overflow — raise, don't rank garbage.
            _dec_or_raise(
                (F.col("s") * F.col("n_docs")).cast("decimal(38,0)"),
                "tfidf num = sum(tf·wt)·n_docs",
            ).alias("num"),
            "den",
        )
    )
    w1 = Window.partitionBy("query_id", F.pmod("doc_id", F.lit(shards))).orderBy(
        F.col("num").desc(), "doc_id"
    )
    w2 = Window.partitionBy("query_id").orderBy(F.col("num").desc(), "doc_id")
    out = (
        scored.withColumn("r1", F.row_number().over(w1))
        .filter(F.col("r1") <= k)
        .withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
    )

    def _long_or_raise(c, name):
        as_long = c.cast("long")
        return F.when(
            as_long.isNull() & c.isNotNull(),
            F.raise_error(f"{name} overflows BIGINT — widen the output type"),
        ).otherwise(as_long)

    return out.select(
        "query_id",
        F.col("rank").cast("long").alias("rank"),
        "doc_id",
        _long_or_raise(F.col("num"), "tfidf_num").alias("tfidf_num"),
        _long_or_raise(F.col("den"), "tfidf_den").alias("tfidf_den"),
    )


def gopher_format_flags(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style FORMAT quality rules (Rae et al. 2021, Appendix A
    — the document-format half; the repetition half is
    :func:`repetition_profile`): per document, the raw integer counters
    and the pass/fail flag of each rule, all in exact integer
    arithmetic (cross-multiplied thresholds — ``a/b >= p/q`` is
    ``a·q >= p·b`` — so no float ratio can tie-break differently
    across engines):

    * word count in [50, 100 000]
    * mean word length in [3, 10] characters
    * ≥ 80 % of words contain an alphabetic character
    * ≤ 90 % of lines start with a bullet (``-``, ``*``, ``•``)
    * ≤ 30 % of lines end with an ellipsis (``...`` or ``…``)
    * symbol-to-word ratio (``#`` and ellipses) ≤ 10 %

    Output: (doc_id, n_words, sum_word_chars, n_alpha_words, n_lines,
    n_bullet_lines, n_ellipsis_lines, n_symbols, ok_words, ok_mean_len,
    ok_alpha, ok_bullets, ok_ellipsis, ok_symbols, passes_format).
    Counters AND flags both emitted: the flags are the operator, the
    counters make an engine-independent oracle check the arithmetic
    behind every flag instead of 14 booleans that could all be
    trivially true on clean data.

    Scale shape: pure per-row column algebra (split + filter + fold),
    ZERO exchanges, whole-stage codegen — pipelines with the scan like
    every other text filter here.
    """
    toks = tokens(F.col(text_col))
    lines = F.filter(
        F.split(F.col(text_col), r"\n"), lambda x: F.trim(x) != ""
    )
    n_words = F.size(toks).cast("long")
    sum_chars = F.aggregate(
        toks, F.lit(0).cast("long"), lambda a, t: a + F.length(t)
    )
    n_alpha = F.size(
        F.filter(toks, lambda t: t.rlike("[A-Za-z]"))
    ).cast("long")
    n_lines = F.size(lines).cast("long")
    n_bullet = F.size(
        F.filter(
            lines,
            lambda x: F.substring(F.trim(x), 1, 1).isin("-", "*", "•"),
        )
    ).cast("long")
    n_ellipsis = F.size(
        F.filter(
            lines,
            lambda x: F.trim(x).endswith("...") | F.trim(x).endswith("…"),
        )
    ).cast("long")
    txt = F.col(text_col)
    n_symbols = (
        (F.length(txt) - F.length(F.replace(txt, F.lit("#"), F.lit(""))))
        + (F.length(txt) - F.length(F.replace(txt, F.lit("..."), F.lit("")))) / 3
        + (F.length(txt) - F.length(F.replace(txt, F.lit("…"), F.lit(""))))
    ).cast("long")
    out = df.select(
        "doc_id",
        n_words.alias("n_words"),
        sum_chars.alias("sum_word_chars"),
        n_alpha.alias("n_alpha_words"),
        n_lines.alias("n_lines"),
        n_bullet.alias("n_bullet_lines"),
        n_ellipsis.alias("n_ellipsis_lines"),
        n_symbols.alias("n_symbols"),
    )
    ok_words = (F.col("n_words") >= 50) & (F.col("n_words") <= 100_000)
    ok_mean_len = (
        (F.col("sum_word_chars") >= 3 * F.col("n_words"))
        & (F.col("sum_word_chars") <= 10 * F.col("n_words"))
    )
    ok_alpha = F.col("n_alpha_words") * 10 >= F.col("n_words") * 8
    ok_bullets = F.col("n_bullet_lines") * 10 <= F.col("n_lines") * 9
    ok_ellipsis = F.col("n_ellipsis_lines") * 10 <= F.col("n_lines") * 3
    ok_symbols = F.col("n_symbols") * 10 <= F.col("n_words")
    return out.select(
        "*",
        ok_words.alias("ok_words"),
        ok_mean_len.alias("ok_mean_len"),
        ok_alpha.alias("ok_alpha"),
        ok_bullets.alias("ok_bullets"),
        ok_ellipsis.alias("ok_ellipsis"),
        ok_symbols.alias("ok_symbols"),
        (
            ok_words & ok_mean_len & ok_alpha
            & ok_bullets & ok_ellipsis & ok_symbols
        ).alias("passes_format"),
    )


def boilerplate_profile(
    df: DataFrame,
    unit_tokens: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """jusText-style boilerplate classification (Pomikálek 2011; the
    unit-level complement of the document-level
    :func:`gopher_format_flags`): each document is split into units
    (the :func:`_split_units` fixed-token mode — this corpus has no
    line structure, same convention as the paragraph-dedup family)
    and every unit is classified CONTENT iff it clears all three
    jusText-shaped gates, each an exact-integer comparison:

    * length: ≥ 4 tokens AND ≥ 20 characters (short fragments are
      boilerplate regardless of wording — nav items, buttons),
    * stopword density: ``stop_hits·5 ≥ n_tokens`` (≥ 20 % of tokens
      from the English stopword list — jusText's core signal: real
      prose is function-word-dense, link/menu text is not).

    Output per document: (id, n_units, n_content, n_boilerplate,
    content_chars, total_chars) — the counters a curation pipeline
    thresholds on (e.g. drop pages whose content share is tiny), all
    BIGINT so an external oracle recomputes them exactly.

    Scale shape: ZERO exchanges — unit split, per-unit classification,
    and the per-document counters are one in-row fold pipeline
    (whole-stage codegen), the same contract as the paragraph-dedup
    and format-rule siblings.
    """
    units, _ = _split_units(F.col(text_col), "\n", unit_tokens)
    stop = F.array(*[F.lit(w) for w in STOPWORDS["en"]])

    def is_content(u):
        toks_u = F.split(u, " ")
        n_tok = F.size(toks_u)
        stop_hits = F.size(F.filter(toks_u, lambda t: F.array_contains(stop, F.lower(t))))
        return (n_tok >= 4) & (F.length(u) >= 20) & (stop_hits * 5 >= n_tok)

    content = F.filter(units, is_content)
    return df.select(
        F.col(id_col),
        F.size(units).cast("long").alias("n_units"),
        F.size(content).cast("long").alias("n_content"),
        (F.size(units) - F.size(content)).cast("long").alias("n_boilerplate"),
        F.aggregate(
            content, F.lit(0).cast("long"), lambda a, u: a + F.length(u)
        ).alias("content_chars"),
        F.aggregate(
            units, F.lit(0).cast("long"), lambda a, u: a + F.length(u)
        ).alias("total_chars"),
    )

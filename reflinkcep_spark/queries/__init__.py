"""Query registry: every operator exposed through the driver contract.

Each sub-module defines ``QUERIES`` (name → fn(spark, sf_dir) → DF) and
``ORACLES`` (name → equivalent ANSI SQL for DuckDB).  Names without an
oracle are non-SQL-expressible operators checked rows-only.

Ordering matters: the driver's correctness gate checks the FIRST 50
entries of ``queries()`` per round (82 declared).  ``_PRIORITY`` pins
the queries that most need a fresh driver row to the front — newly
added queries first, then the pipeline/similarity/text family whose
rows rotated out of (or never entered) earlier rounds' windows — and
the long-green relational/CEP stalwarts (all with green r3 rows)
absorb the overflow at the tail.
"""

from reflinkcep_spark.queries import cep_queries, pipeline, relational, temporal

_MODULES = (pipeline, temporal, cep_queries, relational)

# Front of the driver's 50-entry check window.  First the four queries
# never driver-checked in any round, then the family whose last green
# rows are stale (r1/r2), then the freshly-fixed session oracle.
_PRIORITY = (
    "doc_split_assign",
    "doc_global_shuffle",
    "doc_split_leakage",
    "text_token_histogram",
    "q_running_order_totals",
    "q_balance_quartiles",
    "cep_error_runs_skiptolast",
    "cep_signup_purchase_skipfirst",
    "q_skew_salted_events",
    "doc_pack_sequences",
    "doc_length_outliers",
    "doc_pii_scrub",
    "doc_mixture_upsample",
    "q_range_join_clicks",
    "doc_curation_funnel",
    "doc_chunk_overlap",
    "doc_vocab_coverage",
    "text_repetition",
    "doc_decontam",
    "doc_mixture_sample",
    "doc_source_stats",
    "sim_ann_lsh",
    "sim_ann_ivf",
    "sim_embedding_neardup",
    "multimodal_bytes",
    "dedup_simhash_md5",
    "doc_rolling_fingerprint",
    "doc_top_terms",
    "doc_hash_sample",
    "sim_cosine_topk",
    "text_profile",
    "text_language",
    "q_user_sessions",
)


def _ordered(merged):
    out = {name: merged[name] for name in _PRIORITY if name in merged}
    out.update((k, v) for k, v in merged.items() if k not in out)
    return out


def all_queries():
    merged = {}
    for mod in _MODULES:
        merged.update(mod.QUERIES)
    return _ordered(merged)


# Lazily-built oracle SQL, cached by query name: an ORACLES value may
# be a zero-arg callable (e.g. pipeline's IVF oracle, which reads the
# oracle-scale parquet and fits a quantizer) that is only invoked — and
# its cost only paid — when the driver actually asks for oracle_sql().
_ORACLE_CACHE: dict[str, str] = {}


def all_oracles():
    merged = {}
    for mod in _MODULES:
        for name, sql in mod.ORACLES.items():
            if callable(sql):
                if name not in _ORACLE_CACHE:
                    _ORACLE_CACHE[name] = sql()
                sql = _ORACLE_CACHE[name]
            merged[name] = sql
    return _ordered(merged)

"""Query registry: every operator exposed through the driver contract.

Each sub-module defines ``QUERIES`` (name → fn(spark, sf_dir) → DF) and
``ORACLES`` (name → equivalent ANSI SQL for DuckDB).  Names without an
oracle are non-SQL-expressible operators checked rows-only.

Ordering matters: the driver's correctness gate checks the FIRST 50
entries of ``queries()`` per round (the registry holds more — run
``len(all_queries())`` for the live total; don't trust hard-coded
counts).  ``_PRIORITY`` pins the queries that most need a fresh driver
row to the front — newly added queries first, then the family whose
latest green rows are one round stale — and the freshly-confirmed
queries absorb the overflow at the tail.
"""

from reflinkcep_spark.queries import cep_queries, pipeline, relational, temporal

_MODULES = (pipeline, temporal, cep_queries, relational)

# Round-7 queue: functions/text.py:lm_quality is implemented and
# tested but deliberately NOT registered this round — the window is
# at its 5-new-queries cap and a 51st entry would either evict a
# stale query or sit driver-unchecked ("NEVER" row).  Register
# text_lm_quality (with a bigram-count SQL oracle) in the round-7
# rotation.
#
# Front of the driver's 50-entry check window (round 6 rotation).
# First the queries added this round (never driver-checked), then the
# 45 queries whose latest green rows are r4-vintage (they sat outside
# the r5 window); the 50 freshly r5-confirmed queries absorb the
# overflow at the tail.  Before this rotation every promoted query was
# verified green in CORRECTNESS_r04.json and every demoted query green
# in CORRECTNESS_r05.json.
_PRIORITY = (
    # new in round 6 (never driver-checked)
    "q_waiting_suppliers",
    "q_excess_inventory_suppliers",
    "doc_winnow_robust",
    "q_returned_item_customers",
    "q_nation_market_share",
    # r4-stale: pipeline/text/dedup family
    "dedup_clusters",
    "dedup_minhash_lsh_md5",
    "dedup_simhash_md5",
    "text_profile",
    "text_repetition",
    "text_language",
    "doc_rolling_fingerprint",
    "doc_top_terms",
    "doc_hash_sample",
    "doc_mixture_sample",
    "doc_mixture_upsample",
    "doc_source_stats",
    "doc_decontam",
    "doc_pack_sequences",
    "doc_pii_scrub",
    "doc_curation_funnel",
    "doc_chunk_overlap",
    "doc_vocab_coverage",
    "doc_split_assign",
    "doc_global_shuffle",
    "doc_split_leakage",
    "text_token_histogram",
    # r4-stale: similarity family
    "sim_cosine_topk",
    "sim_ann_lsh",
    "sim_ann_ivf",
    "sim_embedding_neardup",
    "multimodal_bytes",
    # r4-stale: temporal family
    "q_range_join_clicks",
    "q_events_tumbling",
    "q_events_sliding",
    "q_user_sessions",
    "q_session_windows",
    "q_asof_last_click",
    "q_asof_next_error",
    "q_events_props_json",
    "q_running_order_totals",
    # r4-stale: CEP family
    "cep_high_purchases",
    "cep_funnel_3step",
    "cep_funnel_within",
    "cep_error_runs",
    "cep_purchase_then_error",
    "cep_error_runs_skiptolast",
    "cep_signup_purchase_skipfirst",
    # r4-stale: relational family
    "q_balance_quartiles",
    "q_skew_salted_events",
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

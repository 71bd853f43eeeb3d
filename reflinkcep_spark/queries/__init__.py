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

# Round-9 queue (all implemented, locally oracle-verified, and pinned
# green by tests/test_check_oracles.py::
# test_prestaged_round9_queries_match_oracles — registration is a
# QUERIES/ORACLES-dict + _PRIORITY edit):
#   dedup_substring_spans   (pipeline.py — duplicate-span detection)
#   dedup_scrub_spans       (pipeline.py — span REMOVAL / ExactSubstr)
#   dedup_semantic          (pipeline.py — SemDeDup; its oracle is the
#                            LAZY callable _sql_dedup_semantic)
#   cep_nested_funnel_relaxed (cep_queries.py — nested-right combine)
#   q_product_profit        (relational.py — Q9 shape)
#   q_late_lines_by_status  (relational.py — Q12 shape)
#   q_part_supplier_counts  (relational.py — Q16 shape)
# Round-9 window arithmetic: 6 sit-outs from round 8 (2 rounds stale —
# promote FIRST: text_profile, doc_top_terms, doc_hash_sample,
# text_token_histogram, q_events_tumbling, q_running_order_totals) +
# these 7 registrations + 50 r7-stale = 63 candidates for 50 slots →
# ~13 named sit-outs.
#
# Front of the driver's 50-entry check window (round 8 rotation).
# First the two stalwarts that sat out rounds 6-7 (q1_pricing_summary,
# q6_revenue_delta — 2 rounds stale, the audit's only flags), then the
# four queries registered this round (pre-staged + oracle-verified in
# round 7: q_min_cost_suppliers, q_important_parts,
# q_local_supplier_volume, doc_token_budget — never driver-checked),
# then 44 of the 50 queries whose latest green rows are r6-vintage.
# Window arithmetic: 106 registered queries, 2 + 4 + 50 = 56 candidates
# for 50 slots, so SIX r6-green queries sit out and go two rounds stale
# at round 9 — promote these FIRST in the round-9 rotation:
#   text_profile, doc_top_terms, doc_hash_sample, text_token_histogram,
#   q_events_tumbling, q_running_order_totals
# (the six simplest scan/window-aggregate shapes among the r6 set, each
# green every round since registration).  Before this rotation every
# promoted query was verified green in CORRECTNESS_r06.json (stalwarts
# in r05) and every demoted query green in CORRECTNESS_r07.json
# (scripts/window_audit.py run before and after).
_PRIORITY = (
    # 2-rounds-stale stalwarts (last row r5) — first, per round-7 plan
    "q1_pricing_summary",
    "q6_revenue_delta",
    # new in round 8 (never driver-checked; pre-staged round 7)
    "q_min_cost_suppliers",
    "q_important_parts",
    "q_local_supplier_volume",
    "doc_token_budget",
    # r6-stale: dedup/text/pipeline family (text_profile, doc_top_terms,
    # doc_hash_sample, text_token_histogram deliberately absent — they
    # sit out; see note above)
    "dedup_clusters",
    "dedup_minhash_lsh_md5",
    "dedup_simhash_md5",
    "text_repetition",
    "text_language",
    "doc_rolling_fingerprint",
    "doc_winnow_robust",
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
    # r6-stale: similarity/multimodal family
    "sim_cosine_topk",
    "sim_ann_lsh",
    "sim_ann_ivf",
    "sim_embedding_neardup",
    "multimodal_bytes",
    # r6-stale: temporal family (q_events_tumbling deliberately absent
    # — sits out; see note above)
    "q_range_join_clicks",
    "q_events_sliding",
    "q_user_sessions",
    "q_session_windows",
    "q_asof_last_click",
    "q_asof_next_error",
    "q_events_props_json",
    # r6-stale: CEP family
    "cep_high_purchases",
    "cep_funnel_3step",
    "cep_funnel_within",
    "cep_error_runs",
    "cep_purchase_then_error",
    "cep_error_runs_skiptolast",
    "cep_signup_purchase_skipfirst",
    # r6-stale: relational family (q_running_order_totals deliberately
    # absent — sits out; see note above)
    "q_balance_quartiles",
    "q_skew_salted_events",
    "q_waiting_suppliers",
    "q_excess_inventory_suppliers",
    "q_returned_item_customers",
    "q_nation_market_share",
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

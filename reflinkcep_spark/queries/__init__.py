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

# Round-11 queue (implemented, locally oracle-verified at sf0.001 AND
# sf0.01, pinned green by tests/test_check_oracles.py::
# test_prestaged_round11_queries_match_oracles — registration is a
# QUERIES/ORACLES-dict + _PRIORITY edit):
#   text_dedup_paragraphs_fuzzy (pipeline.py — Gopher/RefinedWeb fuzzy
#                           intra-doc unit dedup, zero-exchange in-row
#                           i<j Jaccard fold)
#   doc_contamination_matrix (pipeline.py — per-(source × benchmark)
#                           leak matrix, broadcast bench grams)
#   doc_mixture_rebalance  (pipeline.py — token-count-exact mixture
#                           recipe, per-source floor-division budgets)
# Round-11 window arithmetic: 18 PLANNED_SITOUTS (2 rounds stale at
# r11 — promote FIRST) + these 3 registrations + 50 r9-stale = 71
# candidates for 50 slots → ~21 named sit-outs.
#
# Front of the driver's 50-entry check window (round 10 rotation),
# executed exactly as pre-planned in round 9: FIRST the thirteen
# 2-round-stale sit-outs from the round-9 plan (r7-vintage rows — the
# only staleness the audit flagged), then the five queries registered
# this round (pre-staged + oracle-verified in round 9:
# cep_purchase_no_immediate_error, text_dedup_paragraphs,
# doc_importance_weights, dedup_canonical_quality, text_quality_buckets
# — never driver-checked), then 32 of the 50 queries whose latest green
# rows are r8-vintage.  Window arithmetic: 118 registered queries,
# 13 + 5 + 50 = 68 candidates for 50 slots, so EIGHTEEN r8-green
# queries sit out and go two rounds stale at round 11 — promote
# PLANNED_SITOUTS FIRST in the round-11 rotation.  Before this rotation
# every promoted query was verified green in its latest CORRECTNESS row
# (r7/r9) and every demoted query green in CORRECTNESS_r09.json
# (scripts/window_audit.py run before and after).

# Machine-readable sit-out plan: queries whose latest driver row is
# EXPECTED to be ≥2 rounds stale at the NEXT driver run, because the
# 50-slot window can't hold every candidate.  scripts/window_audit.py
# exits 0 only when observed staleness matches this plan exactly —
# any unplanned-stale query (or a planned one that is stale-and-red)
# is a rotation bug and exits nonzero.  Chosen round 10: the eighteen
# simplest scan/agg shapes among the r8 set — ten pipeline stat/sample
# scans, two text scans, six single-join relational/temporal shapes —
# each green every round since registration; every heavy or
# plan-sensitive r8 query (CEP, dedup, similarity, as-of/session/skew,
# the two star-schema joins) stays in the window.
PLANNED_SITOUTS = (
    "doc_source_stats",
    "doc_token_budget",
    "doc_mixture_sample",
    "doc_mixture_upsample",
    "doc_split_assign",
    "doc_global_shuffle",
    "doc_vocab_coverage",
    "doc_rolling_fingerprint",
    "doc_chunk_overlap",
    "doc_pii_scrub",
    "text_repetition",
    "text_language",
    "q_balance_quartiles",
    "q_events_props_json",
    "q_events_sliding",
    "q_local_supplier_volume",
    "q_returned_item_customers",
    "q_waiting_suppliers",
)

_PRIORITY = (
    # 2-rounds-stale round-9 sit-outs (last row r7) — first, per plan
    "q_big_building_buyers",
    "q_scalar_functions",
    "q_orders_by_month",
    "q_distinct_counts",
    "q_late_ship_priority",
    "q_order_count_distribution",
    "q_promo_revenue_share",
    "q_large_quantity_orders",
    "q_segment_opportunity",
    "q_disjunctive_revenue",
    "q_binational_volume",
    "q_top_supplier",
    "q_small_quantity_revenue",
    # new in round 10 (never driver-checked; pre-staged round 9)
    "cep_purchase_no_immediate_error",
    "text_dedup_paragraphs",
    "doc_importance_weights",
    "dedup_canonical_quality",
    "text_quality_buckets",
    # r8-stale: CEP family
    "cep_high_purchases",
    "cep_funnel_3step",
    "cep_funnel_within",
    "cep_error_runs",
    "cep_purchase_then_error",
    "cep_error_runs_skiptolast",
    "cep_signup_purchase_skipfirst",
    # r8-stale: dedup/similarity family
    "dedup_clusters",
    "dedup_minhash_lsh_md5",
    "dedup_simhash_md5",
    "sim_cosine_topk",
    "sim_ann_lsh",
    "sim_ann_ivf",
    "sim_embedding_neardup",
    "multimodal_bytes",
    # r8-stale: pipeline heavy shapes
    "doc_curation_funnel",
    "doc_decontam",
    "doc_split_leakage",
    "doc_winnow_robust",
    "doc_pack_sequences",
    # r8-stale: temporal family
    "q_asof_last_click",
    "q_asof_next_error",
    "q_range_join_clicks",
    "q_session_windows",
    "q_skew_salted_events",
    # r8-stale: relational family (the PLANNED_SITOUTS eighteen
    # deliberately absent — they sit out; see note above)
    "q1_pricing_summary",
    "q6_revenue_delta",
    "q_excess_inventory_suppliers",
    "q_important_parts",
    "q_min_cost_suppliers",
    "q_nation_market_share",
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

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

# Round-10 queue (implemented, locally oracle-verified at sf0.001 AND
# sf0.01, pinned green by tests/test_check_oracles.py::
# test_prestaged_round10_queries_match_oracles — registration is a
# QUERIES/ORACLES-dict + _PRIORITY edit):
#   cep_purchase_no_immediate_error (cep_queries.py — Flink notNext,
#                                    strict negation via operators/
#                                    absence.py:not_next)
#   text_dedup_paragraphs  (pipeline.py — RefinedWeb intra-doc exact
#                           paragraph dedup, zero-exchange per-doc fold)
#   doc_importance_weights (pipeline.py — DSIR hashed-bigram importance
#                           resampling, exact-integer ratio-of-means)
#   dedup_canonical_quality (pipeline.py — quality-aware canonical-doc
#                           selection per dup cluster, struct-MAX argmax)
#   text_quality_buckets   (pipeline.py — CCNet head/middle/tail tiers
#                           via exact decimal cross-multiply cutoffs)
# Round-10 window arithmetic: 13 PLANNED_SITOUTS (2 rounds stale at
# r10 — promote FIRST) + these 5 registrations + 50 r8-stale = 68
# candidates for 50 slots → ~18 named sit-outs.
#
# Front of the driver's 50-entry check window (round 9 rotation),
# executed exactly as pre-planned in round 8: FIRST the six 2-round-
# stale sit-outs from the round-8 plan (r6-vintage rows — the only
# staleness the audit flags), then the seven queries registered this
# round (pre-staged + oracle-verified in round 8: dedup_substring_spans,
# dedup_scrub_spans, dedup_semantic, cep_nested_funnel_relaxed,
# q_product_profit, q_late_lines_by_status, q_part_supplier_counts —
# never driver-checked), then 37 of the 50 queries whose latest green
# rows are r7-vintage.  Window arithmetic: 113 registered queries,
# 6 + 7 + 50 = 63 candidates for 50 slots, so THIRTEEN r7-green queries
# sit out and go two rounds stale at round 10 — promote PLANNED_SITOUTS
# FIRST in the round-10 rotation.  Before this rotation every promoted
# query was verified green in its latest CORRECTNESS row (r6/r7) and
# every demoted query green in CORRECTNESS_r08.json
# (scripts/window_audit.py run before and after).

# Machine-readable sit-out plan: queries whose latest driver row is
# EXPECTED to be ≥2 rounds stale at the NEXT driver run, because the
# 50-slot window can't hold every candidate.  scripts/window_audit.py
# exits 0 only when observed staleness matches this plan exactly —
# any unplanned-stale query (or a planned one that is stale-and-red)
# is a rotation bug and exits nonzero.  Chosen round 9: the thirteen
# simplest single-agg/scan relational shapes among the r7 set, each
# green every round since registration.
PLANNED_SITOUTS = (
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
)

_PRIORITY = (
    # 2-rounds-stale round-8 sit-outs (last row r6) — first, per plan
    "text_profile",
    "doc_top_terms",
    "doc_hash_sample",
    "text_token_histogram",
    "q_events_tumbling",
    "q_running_order_totals",
    # new in round 9 (never driver-checked; pre-staged round 8)
    "dedup_substring_spans",
    "dedup_scrub_spans",
    "dedup_semantic",
    "cep_nested_funnel_relaxed",
    "q_product_profit",
    "q_late_lines_by_status",
    "q_part_supplier_counts",
    # r7-stale: dedup/text/pipeline family
    "dedup_exact_groups",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "doc_winnow_fingerprints",
    "dedup_winnow_pairs",
    "doc_pack_ffd",
    "doc_length_outliers",
    "text_bigram_lift",
    "text_lm_quality",
    # r7-stale: CEP family
    "cep_error_triples",
    "cep_signup_to_purchase",
    "cep_conversion_rate",
    "cep_view_click_cycles",
    "cep_spending_burst",
    "cep_error_streaks_skip",
    "cep_view_combos_ndrelaxed",
    "cep_optional_click_prefix",
    "cep_view_click_runs",
    "cep_error_pairs_skippast",
    "cep_high_purchase_chains",
    "cep_error_then_purchase_grouped",
    "cep_signup_any_purchase",
    "cep_signup_abandoned",
    # r7-stale: relational family (the PLANNED_SITOUTS thirteen
    # deliberately absent — they sit out; see note above)
    "q3_top_orders",
    "q5_nation_revenue",
    "q_top_customers_per_nation",
    "q_rollup_order_priority",
    "q_cube_lineitem_flags",
    "q_customers_without_orders",
    "q_orders_without_items",
    "q_parts_with_cheap_suppliers",
    "q_grouping_sets",
    "q_quantity_percentiles",
    "q_above_nation_avg",
    "q_pivot_status_priority",
    "q_unpivot_balances",
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

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

# Round-8 queue: relational.py pre-stages q_min_cost_suppliers (TPC-H
# Q2 shape: window-decorrelated min-per-group), q_important_parts
# (Q11 shape: group share of a broadcast global scalar), and
# q_local_supplier_volume (Q5 shape: same-nation customer/supplier
# cross-fact residual); pipeline.py pre-stages doc_token_budget
# (per-source token-budget quota sample over range-sharded prefix
# sums).  All four are locally oracle-verified at sf0.01 and pinned
# green by tests/test_check_oracles.py — register them in the round-8
# rotation and promote the two sitting-out stalwarts
# (q1_pricing_summary, q6_revenue_delta) FIRST.
#
# Front of the driver's 50-entry check window (round 7 rotation).
# First the two queries registered this round (never driver-checked:
# text_lm_quality — pre-staged in round 6 — and doc_pack_ffd, the FFD
# packing query with a recursive-CTE oracle), then the 50 queries
# whose latest green rows are r5-vintage (they sat outside the r6
# window), MINUS two named stalwarts: with 102 registered queries, 52
# candidates compete for 50 slots, so `q1_pricing_summary` and
# `q6_revenue_delta` (both green since round 1, the two simplest
# scan-aggregate shapes in the registry) sit out this round and go
# two rounds stale — promote them FIRST in the round-8 rotation.
# Before this rotation every promoted query was verified green in
# CORRECTNESS_r05.json and every demoted query green in
# CORRECTNESS_r06.json (scripts/window_audit.py run before and after).
_PRIORITY = (
    # new in round 7 (never driver-checked)
    "text_lm_quality",
    "doc_pack_ffd",
    # r5-stale: pipeline/text/dedup family
    "dedup_exact_groups",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "doc_winnow_fingerprints",
    "dedup_winnow_pairs",
    "doc_length_outliers",
    "text_bigram_lift",
    # r5-stale: CEP family
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
    # r5-stale: relational family (q1_pricing_summary and
    # q6_revenue_delta deliberately absent — see note above)
    "q3_top_orders",
    "q5_nation_revenue",
    "q_top_customers_per_nation",
    "q_rollup_order_priority",
    "q_cube_lineitem_flags",
    "q_big_building_buyers",
    "q_customers_without_orders",
    "q_orders_without_items",
    "q_parts_with_cheap_suppliers",
    "q_scalar_functions",
    "q_orders_by_month",
    "q_distinct_counts",
    "q_grouping_sets",
    "q_quantity_percentiles",
    "q_above_nation_avg",
    "q_pivot_status_priority",
    "q_unpivot_balances",
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

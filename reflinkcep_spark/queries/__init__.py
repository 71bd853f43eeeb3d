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

# Front of the driver's 50-entry check window (round 5 rotation).
# First the six queries added this round (never driver-checked), then
# doc_length_outliers (r4's one red row — dtype fix needs its green
# driver confirmation), then the two by-design rows-only xxhash64
# sketches, then the 32 queries whose latest green rows are r3-vintage
# (they sat outside the r4 window); the freshly r4-confirmed
# pipeline/similarity family absorbs the overflow at the tail.
_PRIORITY = (
    # new in round 5
    "doc_winnow_fingerprints",
    "dedup_winnow_pairs",
    "q_disjunctive_revenue",
    "q_binational_volume",
    "cep_conversion_rate",
    "q_top_supplier",
    "q_small_quantity_revenue",
    "text_bigram_lift",
    "q_late_ship_priority",
    "q_order_count_distribution",
    "q_promo_revenue_share",
    "q_large_quantity_orders",
    "q_segment_opportunity",
    # r4 red, fixed this round
    "doc_length_outliers",
    # rows-only sketches (md5 twins are hash-checked)
    "dedup_minhash_lsh",
    "dedup_simhash",
    # r3-stale: CEP family
    "cep_error_triples",
    "cep_signup_to_purchase",
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
    # r3-stale: relational family
    "q1_pricing_summary",
    "q3_top_orders",
    "q5_nation_revenue",
    "q6_revenue_delta",
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

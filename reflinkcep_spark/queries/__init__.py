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

# Round-12 queue (implemented, locally oracle-verified at sf0.001 AND
# sf0.01, pinned by tests/test_check_oracles.py::
# test_prestaged_round12_queries_match_oracles -- registration is a
# QUERIES/ORACLES-dict + _PRIORITY edit):
#   dedup_url_canonical    (pipeline.py + functions/web.py -- RefinedWeb
#                           URL-level dedup: canonical_url codegen
#                           projection + ONE combinable keyed agg;
#                           streaming twin already wired)
#   text_dedup_paragraphs_global (pipeline.py + functions/text.py --
#                           CCNet cross-document unit dedup, 3 keyed
#                           exchanges over the unit-occurrence table)
#   doc_quality_calibration (pipeline.py + functions/text.py -- per-
#                           source CCNet-tier mix vs corpus cutoffs,
#                           exact-integer ppm share and lift)
#   text_dedup_xdoc_fuzzy  (pipeline.py + functions/text.py -- CROSS-
#                           document NEAR-dup unit removal, capped
#                           shingle posting index; short name: the
#                           bench line has a 1.9 kB rail)
#   sim_ann_pq             (pipeline.py + functions/similarity.py --
#                           product-quantization ANN with asymmetric
#                           distance, codebooks as plan literals)
# Round-12 window arithmetic with FIVE registrations: 21
# PLANNED_SITOUTS (r9 rows, 2 rounds stale at r12 -- promote FIRST) +
# 5 new + 50 r10-stale = 76 candidates for 50 slots -> 26 named
# sit-outs from the r10 set.
#
# Round-13 queue (implemented, locally oracle-verified at sf0.001 AND
# sf0.01, pinned by tests/test_check_oracles.py::
# test_prestaged_round13_queries_match_oracles):
#   doc_hll_registers   (pipeline.py + functions/sketch.py -- exact-
#                        integer HyperLogLog register table per source
#                        + '(all)' rollup; mergeability asserted in
#                        tests/test_pipeline_functions.py)
#   doc_bloom_decontam  (pipeline.py + functions/sketch.py -- Bloom-
#                        filter decontamination gate, fixed-size
#                        broadcast; FP-for-FP oracle match, no-false-
#                        negative property vs the exact semi-join)
#   doc_span_merge      (pipeline.py + functions/text.py:merge_spans
#                        -- annotation-span interval union as a zero-
#                        exchange in-row fold; oracle is the gaps-and-
#                        islands window idiom)
#   sim_kmeans          (pipeline.py + functions/similarity.py:
#                        kmeans_fixedpoint -- distributed Lloyd in
#                        fixed-point arithmetic, k=8 x 2 rounds,
#                        one-row centroid broadcast + in-row argmin,
#                        bit-stable across engines)
#   text_tfidf_search   (pipeline.py + functions/text.py:tfidf_topk --
#                        exact-rational tf-idf ranked retrieval, the
#                        'search' primitive next to the ANN family;
#                        integer scoring end to end, two-phase top-k)
# Round-14 seed (implemented, locally oracle-verified at sf0.001 AND
# sf0.01, pinned by tests/test_check_oracles.py::
# test_prestaged_round14_queries_match_oracles):
#   doc_snapshot_diff   (pipeline.py + functions/snapshot.py -- CDC
#                        snapshot reconciliation: ONE full-outer id
#                        join over scan-projected digests, delta-only
#                        output; pair its registration with a
#                        retirement per the capacity note below)
#   doc_link_pagerank   (pipeline.py + functions/graph.py -- scaled-
#                        integer PageRank over a derived link graph,
#                        the second fixed-point iterative algorithm;
#                        same pairing note)
#   sim_jl_project      (pipeline.py + functions/similarity.py --
#                        integer Johnson-Lindenstrauss 64->16
#                        embedding compression, exact long-format
#                        output, zero-exchange projection; same
#                        pairing note)
#   multimodal_wav_stats (pipeline.py + functions/multimodal.py --
#                        end-to-end WAV decode with an oracle: PCM
#                        synthesized from doc_id, real RIFF write +
#                        real wave-reader parse in mapInPandas,
#                        integer stats DuckDB recomputes from the
#                        formula; same pairing note)
#
# Registering all five in round 13 puts the registry at 126 + 5 = 131;
# with the 50-slot window and the hard 2-round staleness ceiling the
# capacity bound is 3 x 50 = 150 registered queries, so rotation
# stays feasible (131/3 = 43.7 average slots per round) but the
# margin is now 19 -- prefer retiring a near-duplicate cheap scan
# shape per future addition past round 13.
#
# Front of the driver's 50-entry check window (round 11 rotation),
# executed exactly as pre-planned in round 10: FIRST the eighteen
# 2-round-stale sit-outs from the round-10 plan (r8-vintage rows -- the
# only staleness the audit flagged), then the three queries registered
# this round (pre-staged + oracle-verified in round 10:
# text_dedup_paragraphs_fuzzy, doc_contamination_matrix,
# doc_mixture_rebalance -- never driver-checked), then 29 of the 50
# queries whose latest green rows are r9-vintage.  Window arithmetic:
# 121 registered queries, 18 + 3 + 50 = 71 candidates for 50 slots, so
# TWENTY-ONE r9-green queries sit out and go two rounds stale at round
# 12 -- promote PLANNED_SITOUTS FIRST in the round-12 rotation.  Before
# this rotation every promoted query was verified green in its latest
# CORRECTNESS row (r8/r9) and every demoted query green in
# CORRECTNESS_r10.json (scripts/window_audit.py run before and after).

# Machine-readable sit-out plan: queries whose latest driver row is
# EXPECTED to be exactly 2 rounds stale at the NEXT driver run, because
# the 50-slot window can't hold every candidate.
# scripts/window_audit.py exits 0 only when observed staleness matches
# this plan exactly -- any unplanned-stale query, any planned one that
# is stale-and-red, or ANY row more than 2 rounds stale (planned or
# not -- the hard ceiling added round 11) is a rotation bug and exits
# nonzero.  Chosen round 11: the twenty-one simplest scan/agg shapes
# among the r9 set -- thirteen single-join/agg relational+temporal
# shapes, three document stat/sample scans, three text profile scans,
# one shuffle-free fingerprint fold, one rollup agg; each green every
# round since registration.  Every heavy or plan-sensitive r9 query
# (all fifteen CEP rows, all eight dedup rows, FFD packing, the
# LM-quality scan, cube/grouping-sets/pivot/unpivot) stays in the
# window.
PLANNED_SITOUTS = (
    "q3_top_orders",
    "q5_nation_revenue",
    "q_above_nation_avg",
    "q_customers_without_orders",
    "q_late_lines_by_status",
    "q_orders_without_items",
    "q_part_supplier_counts",
    "q_parts_with_cheap_suppliers",
    "q_product_profit",
    "q_quantity_percentiles",
    "q_running_order_totals",
    "q_top_customers_per_nation",
    "q_rollup_order_priority",
    "q_events_tumbling",
    "doc_hash_sample",
    "doc_top_terms",
    "doc_length_outliers",
    "doc_winnow_fingerprints",
    "text_profile",
    "text_token_histogram",
    "text_bigram_lift",
)

_PRIORITY = (
    # 2-rounds-stale round-10 sit-outs (last row r8) -- first, per plan
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
    # new in round 11 (never driver-checked; pre-staged round 10)
    "text_dedup_paragraphs_fuzzy",
    "doc_contamination_matrix",
    "doc_mixture_rebalance",
    # r9-stale: CEP family (all fifteen)
    "cep_conversion_rate",
    "cep_error_pairs_skippast",
    "cep_error_streaks_skip",
    "cep_error_then_purchase_grouped",
    "cep_error_triples",
    "cep_high_purchase_chains",
    "cep_nested_funnel_relaxed",
    "cep_optional_click_prefix",
    "cep_signup_abandoned",
    "cep_signup_any_purchase",
    "cep_signup_to_purchase",
    "cep_spending_burst",
    "cep_view_click_cycles",
    "cep_view_click_runs",
    "cep_view_combos_ndrelaxed",
    # r9-stale: dedup family (all eight)
    "dedup_exact_groups",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_scrub_spans",
    "dedup_semantic",
    "dedup_simhash",
    "dedup_substring_spans",
    "dedup_winnow_pairs",
    # r9-stale: heavy/plan-sensitive pipeline + relational keepers
    "doc_pack_ffd",
    "text_lm_quality",
    "q_cube_lineitem_flags",
    "q_grouping_sets",
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

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

# Round-12 queue: REGISTERED this round (dedup_url_canonical,
# text_dedup_paragraphs_global, doc_quality_calibration,
# text_dedup_xdoc_fuzzy, sim_ann_pq) -- all pre-staged + oracle-green
# since round 11; now covered by the full check_oracles replay.
# Round-12 window arithmetic with five registrations AND the first six
# retirements (see RETIRED below): registry 121 + 5 - 6 = 120.
# Candidates: 16 surviving r9-stale PLANNED_SITOUTS (promote FIRST) +
# 5 new + 49 surviving r10-stale = 70 for 50 slots -> 20 named
# sit-outs from the r10 set (the cheapest scan/agg shapes, all green
# every round since registration).
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
#   multimodal_ppm_stats (pipeline.py + functions/multimodal.py --
#                        the IMAGE twin, added round 12: synthetic P6
#                        pixels from doc_id -> real PPM bytes -> the
#                        repo's real netpbm parser + nearest-neighbor
#                        resample -> integer stats incl. a position-
#                        sensitive checksum, DuckDB recomputes from
#                        the formula; same pairing note)
#
# Round-15 queue (implemented round 12, locally oracle-verified at
# sf0.001 AND sf0.01, pinned by tests/test_check_oracles.py::
# test_prestaged_round15_queries_match_oracles):
#   doc_cms_estimates   (pipeline.py + functions/sketch.py -- Count-
#                        Min frequency estimates beside ground truth:
#                        the third mergeable-sketch family; cells
#                        merge with +, small width makes collision
#                        overestimates visible; streaming register
#                        twin doc_cms_registers_stream already wired)
#   q_scd2_user_status  (temporal.py -- SCD2 dimension-history build
#                        from the event log: gaps-and-islands over ONE
#                        user-keyed exchange)
#   doc_domain_caps     (pipeline.py + functions/web.py -- per-domain
#                        document quota with TWO-PHASE ranking so a
#                        power-law mega-host never funnels through one
#                        task; oracle derives the domain independently
#                        from the URL formula)
#   text_gopher_rules   (pipeline.py + functions/text.py -- Gopher
#                        format rules, exact-integer cross-multiplied
#                        thresholds, counters emitted beside flags)
#   q_events_zorder_stats (temporal.py + functions/packing.py --
#                        Z-order/Morton layout key as 42-term codegen
#                        algebra + per-tile min/max file-skipping
#                        stats; in-plan domain rails)
#   multimodal_avi_stats (pipeline.py + functions/multimodal.py --
#                        the VIDEO round-trip completing the trio:
#                        real RIFF write + real container walk,
#                        odd-length frames exercise word alignment,
#                        checksum position-sensitive in frame order
#                        AND intra-frame offset)
#   dedup_incremental   (pipeline.py + functions/dedup.py -- the
#                        ASYMMETRIC ingest dedup: frozen corpus as
#                        ~16-byte digests, new shard classified
#                        new/dup_of_corpus/dup_in_batch; shard-by-
#                        shard == whole-history invariant pinned)
#   text_boilerplate    (pipeline.py + functions/text.py -- jusText
#                        unit-level boilerplate classification:
#                        stopword-density + length gates as exact
#                        integer cross-multiplies, per-doc counters,
#                        zero exchanges)
#
# Registering all five in round 13 puts the registry at 120 + 5 = 125;
# with the 50-slot window and the hard 2-round staleness ceiling the
# capacity bound is 3 x 50 = 150 registered queries, so rotation
# stays feasible (125/3 = 41.7 average slots per round) with margin
# 25 -- maintained by the retire-a-near-duplicate-shape-per-addition
# policy started round 12 (see RETIRED below).
#
# Retired queries (round 12 onward): removed from the driver contract
# (queries()/oracle_sql()) to keep rotation capacity margin >= 25, but
# the functions and their oracle SQL stay in the modules and every one
# is still VALUE-checked against DuckDB by pytest
# (tests/test_retired_queries.py), so operator coverage is unchanged --
# the slot is what's reclaimed, not the check.  Chosen round 12: six
# near-duplicate cheap scan/agg shapes whose plan shape is exercised by
# a registered sibling:
#   q_events_tumbling      -- same one-shuffle F.window() agg plan as
#                             the registered q_events_sliding; batch fn
#                             also pinned by the streaming twin's
#                             batch-equality test (test_streaming_entry)
#   q_asof_next_error      -- forward as-of: same union+window single-
#                             shuffle asof_join plan as the registered
#                             q_asof_last_click; direction covered by
#                             tests/test_asof.py::test_asof_forward_direction
#   q_late_lines_by_status -- join + conditional-sum agg; shape covered
#                             by q1_pricing_summary / q_promo_revenue_share
#   q_part_supplier_counts -- anti-join (q_customers_without_orders) +
#                             count_distinct (q_distinct_counts) combo
#   doc_hash_sample        -- md5-bucket deterministic sampling; the
#                             same bucket trick rides inside the
#                             registered doc_split_leakage
#   text_token_histogram   -- token-count bucket agg; near-dup of
#                             text_profile stats; also unit-tested
#                             directly (test_token_histogram_buckets)
RETIRED = (
    "q_events_tumbling",
    "q_asof_next_error",
    "q_late_lines_by_status",
    "q_part_supplier_counts",
    "doc_hash_sample",
    "text_token_histogram",
)

# Front of the driver's 50-entry check window (round 12 rotation),
# executed exactly as pre-planned in round 11: FIRST the sixteen
# surviving 2-round-stale sit-outs from the round-11 plan (r9-vintage
# rows; five of the original 21 were retired instead of promoted --
# see RETIRED), then the five queries registered this round
# (pre-staged + oracle-verified in round 11: dedup_url_canonical,
# text_dedup_paragraphs_global, doc_quality_calibration,
# text_dedup_xdoc_fuzzy, sim_ann_pq -- never driver-checked), then 29
# of the 49 surviving queries whose latest green rows are r10-vintage
# (every heavy / plan-sensitive shape: all CEP rows, dedup_clusters +
# the md5 sketch twins, the sim_* family, multimodal, sessions/asof/
# range/skew, decontam, packing).  Window arithmetic: 120 registered
# queries, 16 + 5 + 49 = 70 candidates for 50 slots, so TWENTY
# r10-green cheap scan/agg shapes sit out and go two rounds stale at
# round 12 -- promote PLANNED_SITOUTS FIRST in the round-13 rotation.
#
# ROUND-13 ROTATION PLAN (pre-computed; execute exactly): promote the
# 20 PLANNED_SITOUTS below FIRST (r10 rows, 2 rounds stale at r12 --
# the hard ceiling forbids a third), then register the five round-13
# queue queries (doc_hll_registers, doc_bloom_decontam, doc_span_merge,
# sim_kmeans, text_tfidf_search -- all oracle-green since round 11),
# then fill with r11-vintage keepers.  Arithmetic: registry 120 + 5 =
# 125; candidates 20 promoted + 5 new + 50 r11-stale = 75 for 50
# slots -> TWENTY-FIVE r11-green queries sit out.  NAMED here so the
# round-13 edit is mechanical (copy into PLANNED_SITOUTS): the
# eighteen round-11 window's cheap scan/agg/window shapes
# (doc_source_stats, doc_token_budget, doc_mixture_sample,
# doc_mixture_upsample, doc_split_assign, doc_global_shuffle,
# doc_vocab_coverage, doc_rolling_fingerprint, doc_chunk_overlap,
# doc_pii_scrub, text_repetition, text_language, q_balance_quartiles,
# q_events_props_json, q_events_sliding, q_local_supplier_volume,
# q_returned_item_customers, q_waiting_suppliers), the three
# sub-second round-11 registrations (text_dedup_paragraphs_fuzzy,
# doc_contamination_matrix, doc_mixture_rebalance), and the four
# one-pass multi-grouping aggs (q_cube_lineitem_flags,
# q_grouping_sets, q_pivot_status_priority, q_unpivot_balances).
# Stays in the window: all fifteen CEP rows, all eight dedup rows,
# doc_pack_ffd, text_lm_quality — every Python-kernel or
# plan-sensitive shape.
# Pair the round-14 registrations (5 seeds + multimodal_ppm_stats)
# with retirements per the capacity policy.  Retirement CANDIDATES to
# evaluate then (near-duplicate shapes whose operator would stay
# covered — each needs its coverage argument re-verified at
# retirement time, exactly like the round-12 six): doc_top_terms
# (tf/df machinery subsumed by text_tfidf_search once registered),
# doc_mixture_sample (the doc_mixture_rebalance + doc_token_budget
# family covers stratified sampling), q_orders_by_month (calendar
# bucket agg, the q_events_sliding shape), q_distinct_counts (plain
# count-distinct agg), doc_length_outliers (percentile trim ~
# q_balance_quartiles ntile + the curation funnel's length stage),
# q_scalar_functions (scalar-expression scan, exercised by
# queries/exact.py tests and a dozen registered queries).  The
# eight-entry round-15 queue keeps the pipeline full two rounds
# ahead.
# Before this rotation every promoted query was verified green in its
# latest CORRECTNESS row (r9/r10) and every demoted query green in
# CORRECTNESS_r11.json (scripts/window_audit.py run before and after).

# Machine-readable sit-out plan: queries whose latest driver row is
# EXPECTED to be exactly 2 rounds stale at the NEXT driver run, because
# the 50-slot window can't hold every candidate.
# scripts/window_audit.py exits 0 only when observed staleness matches
# this plan exactly -- any unplanned-stale query, any planned one that
# is stale-and-red, or ANY row more than 2 rounds stale (planned or
# not -- the hard ceiling added round 11) is a rotation bug and exits
# nonzero.  Chosen round 12: the twenty simplest r10-green scan/agg
# shapes -- eighteen single-join/agg/window relational shapes, the
# scalar-function scan, and one of the two session variants
# (q_user_sessions; q_session_windows stays in the window); each green
# every round since registration.  Every heavy or plan-sensitive r10
# query (all eight CEP rows, dedup_clusters, the md5 sketch twins, the
# sim_* family, multimodal, decontam, packing, winnow-robust,
# range/asof/skew) stays in the window.
PLANNED_SITOUTS = (
    "q1_pricing_summary",
    "q6_revenue_delta",
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
    "q_excess_inventory_suppliers",
    "q_nation_market_share",
    "q_min_cost_suppliers",
    "q_important_parts",
    "q_user_sessions",
)

_PRIORITY = (
    # 2-rounds-stale round-11 sit-outs (last row r9) -- first, per plan
    # (16 of the 21: the other five were retired, see RETIRED)
    "text_profile",
    "doc_winnow_fingerprints",
    "doc_top_terms",
    "doc_length_outliers",
    "text_bigram_lift",
    "q3_top_orders",
    "q5_nation_revenue",
    "q_top_customers_per_nation",
    "q_rollup_order_priority",
    "q_customers_without_orders",
    "q_orders_without_items",
    "q_parts_with_cheap_suppliers",
    "q_quantity_percentiles",
    "q_above_nation_avg",
    "q_running_order_totals",
    "q_product_profit",
    # new in round 12 (never driver-checked; pre-staged round 11)
    "dedup_url_canonical",
    "text_dedup_paragraphs_global",
    "doc_quality_calibration",
    "text_dedup_xdoc_fuzzy",
    "sim_ann_pq",
    # r10-stale: heavy / plan-sensitive keepers
    "dedup_clusters",
    "dedup_minhash_lsh_md5",
    "dedup_simhash_md5",
    "doc_winnow_robust",
    "doc_decontam",
    "doc_pack_sequences",
    "doc_curation_funnel",
    "doc_split_leakage",
    "sim_cosine_topk",
    "sim_ann_lsh",
    "sim_ann_ivf",
    "sim_embedding_neardup",
    "multimodal_bytes",
    "doc_importance_weights",
    "text_dedup_paragraphs",
    "dedup_canonical_quality",
    "text_quality_buckets",
    "q_range_join_clicks",
    "q_session_windows",
    "q_asof_last_click",
    "q_skew_salted_events",
    # r10-stale: CEP family (all eight)
    "cep_high_purchases",
    "cep_funnel_3step",
    "cep_funnel_within",
    "cep_error_runs",
    "cep_purchase_then_error",
    "cep_error_runs_skiptolast",
    "cep_signup_purchase_skipfirst",
    "cep_purchase_no_immediate_error",
)


def _ordered(merged):
    for name in RETIRED:
        merged.pop(name, None)
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

#!/usr/bin/env python3
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE compact JSON line (integer milliseconds — sized to fit the
driver's 2000-char stdout-tail capture; see the emission comment in
main()):
    {"metric": "headline_queries_total_ms", "value": <total ms>,
     "unit": "ms", "queries": {name: ms, ...}, "calib_ms": <ms>,
     "sf": <scale factor>}
and writes the full seconds-precision record to bench_detail.json.

Each query is materialized through the noop sink (full computation, no
driver-side collect).  The mix covers every execution path: pure-scan
aggregation, shuffled joins, window fast paths, the Python NFA kernel,
inverted-index and LSH joins, and higher-order-function text analysis.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Round-11 retirements from the headline (rows stay REGISTERED driver
# queries, correctness-gated every rotation — they only leave the
# bench headline): six trivially-cheap sub-second scan/fold shapes
# each duplicated by a heavier headline row (text_repetition ~
# text_profile; doc_mixture_upsample ~ doc_mixture_rebalance +
# doc_token_budget; doc_chunk_overlap ~ doc_pack_sequences;
# doc_vocab_coverage ~ doc_top_terms; doc_split_assign ~
# doc_global_shuffle; doc_winnow_fingerprints ~ doc_winnow_robust).
# Sub-second rows carry no timing signal anyway (±30 % single-run
# noise, NOTES_r09/r10), and the freed ~170 chars keep the one-line
# summary inside the driver's 2000-char tail capture with room for
# future registrations.
# Round-14 changes: doc_top_terms left the headline because it left
# the REGISTRY (retired; tf/df shape subsumed by the registered
# text_tfidf_search, which stays a headline row).  Two more trivially
# cheap rows headline-retired under the standing policy to make room:
# cep_high_purchases (247 ms r13; the pure-filter fast path rides in
# cep_signup_to_purchase / cep_funnel_3step) and q_asof_last_click
# (348 ms; the union+window single-shuffle shape is
# q_range_join_clicks' — both stay REGISTERED driver queries).  Added
# the four round-14 registrations with timing signal:
# doc_snapshot_diff, doc_link_pagerank, multimodal_wav_stats,
# multimodal_ppm_stats (sim_jl_project is a zero-exchange sub-second
# projection — no signal, not added).
HEADLINE = [
    "q1_pricing_summary",      # scan + partial agg
    "q3_top_orders",           # 3-way join + agg + top-k
    "q5_nation_revenue",       # multi-join through broadcast dims
    "q_user_sessions",         # gap sessionization (window + agg)
    "cep_error_triples",       # CEP fast path: strict loop windows
    "cep_signup_to_purchase",  # CEP relaxed sequence (window fast path)
    "cep_funnel_3step",        # CEP 3-step relaxed chain (window fast path)
    "cep_spending_burst",      # CEP NFA kernel (iterative condition)
    "dedup_exact_groups",      # hash-groupBy dedup
    "dedup_ngram_jaccard",     # inverted-index set-similarity join
    "dedup_minhash_lsh",       # MinHash + banded LSH + verify
    "dedup_clusters",          # iterative connected components
    "sim_cosine_topk",         # brute-force vector search
    "text_profile",            # higher-order-function text analysis
    "doc_decontam",            # broadcast n-gram decontamination join
    "cep_signup_abandoned",    # absence pattern (union + window)
    "q_grouping_sets",         # one-pass grouping-sets aggregation
    "sim_ann_ivf",             # IVF ANN (bounded quantizer fit + probe)
    "doc_pack_sequences",      # concat-and-chunk packing (sharded prefix sum)
    "q_range_join_clicks",     # bucketed range join (no nested loop)
    "doc_curation_funnel",     # 6-stage curation attrition report
    "q_late_ship_priority",    # semi join with non-equi residual (Q4)
    "q_large_quantity_orders", # agg-filter broadcast-back (Q18)
    "dedup_winnow_pairs",      # winnow-fingerprint inverted index
    "q_binational_volume",     # dual-role dimension join (Q7)
    "cep_conversion_rate",     # CEP matches consumed relationally
    "text_bigram_lift",        # collocation mining (exact-integer lift)
    "cep_spending_burst_bucketed",  # same NFA query over a bucketed log (0 exchanges)
    "q_waiting_suppliers",     # semi+anti self-join decorrelation (Q21)
    "q_excess_inventory_suppliers",  # nested semi-join chain (Q20)
    "doc_winnow_robust",       # history-dependent winnowing (array fold)
    "q_returned_item_customers",  # aggregate-before-join top-k (Q10)
    "q_nation_market_share",   # two-level dimension chains + share (Q8)
    "text_lm_quality",         # corpus-trained bigram LM scoring (broadcast stats)
    "doc_pack_ffd",            # whole-doc FFD bin packing (sharded applyInPandas)
    "q_min_cost_suppliers",    # window-decorrelated min-per-group (Q2)
    "q_important_parts",       # group share of broadcast global scalar (Q11)
    "q_local_supplier_volume", # same-nation cross-fact residual join (Q5 shape)
    "doc_token_budget",        # token-budget quota sample (range-sharded prefix sums)
    "dedup_substring_spans",   # per-position k-gram posting index + diagonal run-merge
    "dedup_scrub_spans",       # ExactSubstr removal (semi-join victim isolation)
    "dedup_semantic",          # SemDeDup (IVF cells, in-cell witness fold)
    "cep_nested_funnel_relaxed",  # nested-right combine (window fast path)
    "q_product_profit",        # broadcast dims + conditional profit agg (Q9)
    "cep_purchase_no_immediate_error",  # strict negation / notNext (union + one window pass)
    "doc_importance_weights",  # DSIR resampling (bounded bucket stats broadcast)
    "dedup_canonical_quality", # per-cluster quality argmax (struct-MAX agg)
    "text_quality_buckets",    # CCNet tiers (1-row global stats broadcast)
    "text_dedup_paragraphs_fuzzy",  # fuzzy intra-doc unit dedup (in-row i<j Jaccard fold)
    "doc_contamination_matrix",     # per-(source x bench) leak matrix (broadcast grams)
    "doc_mixture_rebalance",        # token-exact mixture recipe (range-sharded prefix sums)
    "dedup_url_canonical",     # URL-canonical dedup (codegen projection + one agg)
    "text_dedup_paragraphs_global",  # CCNet cross-doc unit dedup (occurrence table)
    "doc_quality_calibration", # per-source tier mix vs corpus cutoffs (ppm lift)
    "text_dedup_xdoc_fuzzy",   # cross-doc NEAR-dup units (capped posting index)
    "sim_ann_pq",              # product-quantization ANN (ADC over codes)
    "doc_hll_registers",       # HyperLogLog register table + rollup (sketch agg)
    "doc_bloom_decontam",      # Bloom-gate decontamination (fixed-size broadcast)
    "doc_span_merge",          # interval-union span merge (zero-exchange fold)
    "sim_kmeans",              # fixed-point Lloyd k-means (centroid broadcast)
    "text_tfidf_search",       # exact-rational tf-idf ranked retrieval
    "doc_snapshot_diff",       # CDC snapshot reconciliation (one full-outer digest join)
    "doc_link_pagerank",       # fixed-point PageRank (per-round rank exchange only)
    "multimodal_wav_stats",    # real RIFF/WAV decode round-trip (mapInPandas)
    "multimodal_ppm_stats",    # real netpbm decode + resample (mapInPandas)
    "calibration_cpu",         # fixed-work box-state calibration (no IO, no data)
    "calibration_shuffle",     # fixed-work shuffle/bandwidth calibration (no data)
]

_BUCKETED_EV_TABLE = "bench_ev_bucketed"


def _setup_bucketed_events(spark, sf_dir: str) -> None:
    """One-time (per bench process) bucketed write of the event log on
    its CEP key — the pay-the-shuffle-once-at-ingest shape.  Setup cost
    is excluded from timings by design: at 100 TB the bucketed log is
    written once and amortized over every subsequent pattern query."""
    import shutil
    import tempfile

    from reflinkcep_spark.queries.cep_queries import _events
    from reflinkcep_spark.sinks import write_bucketed

    path = os.path.join(tempfile.gettempdir(), "bench_ev_bucketed")
    shutil.rmtree(path, ignore_errors=True)
    spark.sql(f"DROP TABLE IF EXISTS {_BUCKETED_EV_TABLE}")
    write_bucketed(
        _events(spark, sf_dir), _BUCKETED_EV_TABLE, "user_id",
        buckets=int(os.environ.get("SPARK_GRAFT_CPUS", "32")), path=path,
    )


def _cep_spending_burst_bucketed(spark, sf_dir):
    """cep_spending_burst's exact query + projection, reading the
    pre-bucketed event log with pre_partitioned=True: Scan → Sort →
    FlatMapGroupsInPandas, zero exchanges (tests/test_bucketed_sink.py
    asserts the plan; this entry measures it)."""
    from reflinkcep_spark.cep.query import Query
    from reflinkcep_spark.operators import match_pattern
    from reflinkcep_spark.queries.cep_queries import (
        SPENDING_BURST_YAML,
        spending_burst_project,
    )

    out = match_pattern(
        spark.table(_BUCKETED_EV_TABLE),
        Query.from_yaml(SPENDING_BURST_YAML),
        order_by="event_id",
        partition_by="user_id",
        allow_fastpath=False,
        pre_partitioned=True,
    )
    return spending_burst_project(out)


def _calibration_cpu(spark, sf_dir):
    """Fixed-work, pure-CPU box-state calibration: 4B generated rows
    through one whole-stage-codegen hash-and-mod sum across all cores.
    No IO, no testdata dependency, no shuffle beyond the final 32-part
    reduce — the timing moves ONLY with host state (CPU contention,
    JVM/GC weather), never with any plan in this repo.  Round-over-round
    bench drift that tracks this row is box state and can be divided
    out arithmetically (see NOTES_r07.md: rounds 6-7 each spent a
    standalone re-bench proving a uniform ~10% move was not code)."""
    return spark.range(0, 4_000_000_000, 1, 32).selectExpr(
        "sum(xxhash64(id) % 1000003) AS calib"
    )


def _calibration_shuffle(spark, sf_dir):
    """Fixed-work SHUFFLE/BANDWIDTH box-state calibration, the second
    divisor class (added round 13): 40M synthetic rows exchanged on 1M
    keys and aggregated — no testdata, no plan from this repo, but
    unlike the pure-codegen loop above it exercises the memory/shuffle
    path most headline rows live on.  Motivation: the round-13 A/B/C
    bench trio measured the scan/shuffle-heavy families uniformly
    ×1.2-1.5 over their r11 rows while calibration_cpu was FASTER than
    r11 — a box-throughput mode (co-tenant memory-bandwidth pressure)
    the CPU loop cannot divide out.  Same-tree isolated interleaved
    runs earlier the same day matched the r11 times, and the plans are
    unchanged, so the drift is environmental; this row gives future
    drift adjudication the matching divisor."""
    from pyspark.sql import functions as F

    return (
        spark.range(0, 40_000_000, 1, 32)
        .select((F.col("id") % 1_000_000).alias("k"), "id")
        .groupBy("k")
        .agg(F.sum("id").alias("s"))
    )


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    try:
        sf = float(sf)
    except ValueError:
        sf = sf_dir

    from reflinkcep_spark.queries import all_queries
    from reflinkcep_spark.session import get_spark

    spark = get_spark(app_name="reflinkcep-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM + Python worker pool outside the timed region: the
    # first Arrow UDF in a session pays worker spawn + pandas import on
    # every core; that's session setup, not query cost.
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    def _warm(pdf_iter):
        yield from pdf_iter

    spark.range(0, 64, 1, 32).mapInPandas(_warm, "id long").collect()

    qs = dict(all_queries())
    _setup_bucketed_events(spark, sf_dir)
    qs["cep_spending_burst_bucketed"] = _cep_spending_burst_bucketed
    qs["calibration_cpu"] = _calibration_cpu
    qs["calibration_shuffle"] = _calibration_shuffle

    # Steady-state methodology: run every headline plan once untimed,
    # then time the second iteration.  The first execution of each
    # heavy pipeline pays ~7-10 s of one-shot generated-code
    # classload/JIT (measured data-independent: identical with
    # wholeStage codegen disabled, and paid once per JVM per distinct
    # generated class); warming at a smaller SF proved unreliable —
    # AQE picks different physical plans at different sizes, so the
    # timed pass could still hit a cold class.  Production clusters
    # amortize this across the job; the benchmark should measure
    # execution, not compiler warmup.
    for name in HEADLINE:
        try:
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        except Exception:
            pass

    # Best-of-3 timed iterations: rejects transient scheduler/GC noise
    # (observed: a uniformly 2-4x slow pass across ALL queries when the
    # box is busy, unrelated to any plan property; best-of-2 was still
    # seen reporting a 2x outlier when both passes landed on a busy
    # stretch, while isolated reruns of the same plan were steady).
    timings: dict[str, float] = {}
    for _ in range(3):
        for name in HEADLINE:
            fn = qs[name]
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = round(time.perf_counter() - t0, 3)
            if name not in timings or dt < timings[name]:
                timings[name] = dt

    # The calibration row is reported but kept OUT of the headline
    # total: it measures the box, not the engine, and the total must
    # stay comparable to rounds that predate it.
    calibration = timings.pop("calibration_cpu", None)
    calib_shuffle = timings.pop("calibration_shuffle", None)
    total = round(sum(timings.values()), 3)

    # The driver records only the LAST ~2000 chars of stdout and
    # json-parses the final line (BENCH_r10.json came back
    # `parsed: null` because 69 seconds-float rows with default
    # separators outgrew that window and the line's head was cut).
    # So the one stdout line is COMPACT: integer milliseconds, no
    # whitespace — 65 timed rows (67 HEADLINE entries minus the TWO
    # popped calibration rows) ≈ 1.82 kB measured against the 2000-char
    # capture (assert rail at 1.9 kB; round 14 dropped the retired
    # doc_top_terms plus two sub-second rows and added four round-14
    # registrations — see the HEADLINE comment; round 13 swapped five
    # sub-second rows for the five round-13 registrations; round 12
    # did the same for seven rows).  Full seconds-precision detail goes to
    # bench_detail.json for local tooling (drift_normalize reads
    # either format).  If the row count grows this line past ~1.9 kB,
    # retire trivial sub-second scan rows from HEADLINE rather than
    # shortening names — cross-round drift comparison keys on names.
    detail = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "calibration_sec": calibration,
        "calibration_shuffle_sec": calib_shuffle,
        "sf": sf,
    }
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "bench_detail.json"), "w") as f:
        json.dump(detail, f, indent=1)
    compact = {
        "metric": "headline_queries_total_ms",
        "value": int(round(total * 1000)),
        "unit": "ms",
        "queries": {k: int(round(v * 1000)) for k, v in timings.items()},
        "calib_ms": None if calibration is None else int(round(calibration * 1000)),
        "calib_shuffle_ms": None if calib_shuffle is None else int(round(calib_shuffle * 1000)),
        "sf": sf,
    }
    line = json.dumps(compact, separators=(",", ":"))
    assert len(line) <= 1900, (
        f"summary line {len(line)} chars — exceeds the driver's 2000-char "
        "tail capture budget; retire trivial HEADLINE rows (see comment)"
    )
    print(line)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

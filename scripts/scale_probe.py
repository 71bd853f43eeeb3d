#!/usr/bin/env python3
"""Empirical scaling probe: replicate the sf0.1 tables 1x/2x/4x/8x with
perturbed keys and measure how the headline operators' wall time grows.

The point is to back the per-query "linear at 100 TB" design claims
with data: an operator whose plan hides a quadratic pair expansion, an
unbounded collect, or a single-task serialization shows super-linear
growth immediately, while a correctly bucketed/keyed plan tracks the
input multiple (modulo fixed per-query overhead, which DOMINATES small
runs — hence the ratio is reported against the x2 run too).

Replication keeps the workload shape honest at every multiple:

* documents: doc_id offset per copy, and EVERY token prefixed with a
  per-copy marker — copies are disjoint in shingle/signature space, so
  the duplicate/near-dup structure of the base corpus repeats per copy
  instead of every doc gaining N-1 cross-copy near-duplicates.  (A
  first attempt prefixed only the document: all other shingles stayed
  shared across copies, so pair output grew N-squared by construction
  — semantically correct near-dup output for that input, but useless
  for detecting plan defects.)
* events: event_id/user_id offset per copy — each copy is a fresh user
  population, so sessions/patterns scale linearly and per-key stream
  lengths stay constant (the kernel's cost driver is stream length,
  not user count).
* embeddings: vec_id offset; vectors unchanged.  Probed queries use a
  FIXED query set against the N-times corpus (top-k / ANN), so output
  stays constant while scanned volume scales.
* orders: o_orderkey/o_custkey offset per copy — fresh customer
  populations, so per-customer running windows scale linearly with
  constant per-key history.

Usage: python3 scripts/scale_probe.py [--scales 1,2,4,8] [--out SCALING.md]
Writes replicated tables under /tmp/reflinkcep_scale/x{N}/ (scratch;
removed and rebuilt per run unless --keep).
"""

from __future__ import annotations

import argparse
import os
import re
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SCRATCH = "/tmp/reflinkcep_scale"

# (query name, table it scales with)
PROBES = [
    ("text_profile", "documents"),
    ("doc_top_terms", "documents"),
    ("dedup_exact_groups", "documents"),
    ("dedup_ngram_jaccard", "documents"),
    ("dedup_minhash_lsh", "documents"),
    ("dedup_clusters", "documents"),
    ("doc_curation_funnel", "documents"),
    ("doc_global_shuffle", "documents"),
    ("q_user_sessions", "events"),
    ("q_events_sliding", "events"),
    ("q_asof_last_click", "events"),
    ("cep_funnel_3step", "events"),
    ("cep_spending_burst", "events"),
    ("sim_cosine_topk", "embeddings"),
    ("sim_ann_ivf", "embeddings"),
    ("q_running_order_totals", "orders"),
    ("doc_split_leakage", "documents"),
    ("cep_error_runs_skiptolast", "events"),
    ("cep_signup_purchase_skipfirst", "events"),
    ("q_skew_salted_events", "events"),
    ("doc_winnow_fingerprints", "documents"),
    ("q_late_ship_priority", "lineitem"),
    ("q_order_count_distribution", "orders"),
    ("q_promo_revenue_share", "lineitem"),
    ("q_large_quantity_orders", "lineitem"),
    ("q_segment_opportunity", "orders"),
    ("q_disjunctive_revenue", "lineitem"),
    ("dedup_winnow_pairs", "documents"),
    ("q_binational_volume", "lineitem"),
    ("cep_conversion_rate", "events"),
    ("q_top_supplier", "lineitem"),
    ("q_small_quantity_revenue", "lineitem"),
    ("text_bigram_lift", "documents"),
    ("q_waiting_suppliers", "lineitem"),
    ("q_excess_inventory_suppliers", "lineitem"),
    ("doc_winnow_robust", "documents"),
    ("q_returned_item_customers", "lineitem"),
    ("q_nation_market_share", "lineitem"),
    ("q_min_cost_suppliers", "lineitem"),
    ("text_lm_quality", "documents"),
    ("doc_pack_ffd", "documents"),
    ("dedup_substring_spans", "documents"),
    ("dedup_scrub_spans", "documents"),
    ("dedup_semantic", "embeddings"),
    ("cep_nested_funnel_relaxed", "events"),
    ("q_product_profit", "lineitem"),
    ("q_late_lines_by_status", "lineitem"),
    ("q_part_supplier_counts", "lineitem"),
    ("text_dedup_paragraphs", "documents"),
    ("cep_purchase_no_immediate_error", "events"),
    ("doc_importance_weights", "documents"),
    ("dedup_canonical_quality", "documents"),
    ("text_quality_buckets", "documents"),
    ("text_dedup_paragraphs_fuzzy", "documents"),
    ("doc_contamination_matrix", "documents"),
    ("doc_mixture_rebalance", "documents"),
    # registered round 12
    ("dedup_url_canonical", "documents"),
    ("text_dedup_paragraphs_global", "documents"),
    ("doc_quality_calibration", "documents"),
    ("text_dedup_xdoc_fuzzy", "documents"),
    ("sim_ann_pq", "embeddings"),
    # round-13 queue (pre-staged round 11)
    ("doc_hll_registers", "documents"),
    ("doc_bloom_decontam", "documents"),
    ("doc_span_merge", "documents"),
    ("sim_kmeans", "embeddings"),
    ("text_tfidf_search", "documents"),
    # round-14 seed (pre-staged round 11)
    ("doc_snapshot_diff", "documents"),
    ("doc_link_pagerank", "documents"),
    ("sim_jl_project", "embeddings"),
    ("multimodal_wav_stats", "documents"),
    ("multimodal_ppm_stats", "documents"),
    ("multimodal_avi_stats", "documents"),
    ("dedup_incremental", "documents"),
    ("doc_cms_estimates", "documents"),
    ("q_scd2_user_status", "events"),
    ("q_events_zorder_stats", "events"),
    ("doc_domain_caps", "documents"),
    ("text_gopher_rules", "documents"),
    ("text_boilerplate", "documents"),
    ("cep_funnel_within_time", "events"),
    ("cep_sql_error_runs", "events"),
    ("cep_sql_funnel", "events"),
    ("cep_sql_prev_ascent", "events"),
    ("cep_sql_alternation", "events"),
]

# Replication order matters: orders/lineitem/customer/part share key
# offsets (each copy is a closed referential world — copy k's lineitem
# rows point at copy k's orders/parts, so join output scales linearly).
TABLES = ("documents", "events", "embeddings", "orders", "lineitem", "customer", "part")

# Static dimensions copied through unreplicated: lineitem copies keep
# l_suppkey, so every copy points at the same suppliers — per-supplier
# join fan-out stays constant and volume still scales linearly.
PASSTHROUGH = ("supplier", "nation", "region")


def replicate(spark, n: int, out_dir: str) -> None:
    from pyspark.sql import functions as F

    from reflinkcep_spark.sources import load_table

    os.makedirs(out_dir, exist_ok=True)
    for name in PASSTHROUGH:
        dst = os.path.join(out_dir, f"{name}.parquet")
        if not os.path.exists(dst):
            load_table(spark, BASE, name).write.mode("overwrite").parquet(dst)
    for name in TABLES:
        dst = os.path.join(out_dir, f"{name}.parquet")
        if os.path.exists(dst):
            continue
        df = load_table(spark, BASE, name)
        if name == "documents":
            step = df.agg(F.max("doc_id")).first()[0] + 1

            def _renamed(k):
                toks = F.filter(
                    F.split(F.trim(F.col("text")), r"\s+"), lambda t: t != ""
                )
                return F.array_join(
                    F.transform(toks, lambda t: F.concat(F.lit(f"c{k}"), t)),
                    " ",
                )

            parts = [
                df.select(
                    (F.col("doc_id") + k * step).alias("doc_id"),
                    _renamed(k).alias("text"),
                    "lang",
                    "source",
                )
                .withColumn("n_chars", F.length("text"))
                for k in range(n)
            ]
        elif name == "events":
            e_step = df.agg(F.max("event_id")).first()[0] + 1
            u_step = df.agg(F.max("user_id")).first()[0] + 1
            parts = [
                df.select(
                    (F.col("event_id") + k * e_step).alias("event_id"),
                    "ts",
                    (F.col("user_id") + k * u_step).alias("user_id"),
                    "event_type",
                    "value",
                    "props",
                )
                for k in range(n)
            ]
        elif name == "orders":
            # Key steps come from the OWNING tables (orders for order
            # keys, customer for customer keys, part for part keys) so
            # orders/lineitem/customer/part copies agree — each copy is
            # a closed referential world and join output scales
            # linearly instead of gaining cross-copy matches.
            o_step = df.agg(F.max("o_orderkey")).first()[0] + 1
            c_step = load_table(spark, BASE, "customer").agg(
                F.max("c_custkey")
            ).first()[0] + 1
            others = [c for c in df.columns if c not in ("o_orderkey", "o_custkey")]
            parts = [
                df.select(
                    (F.col("o_orderkey") + k * o_step).alias("o_orderkey"),
                    (F.col("o_custkey") + k * c_step).alias("o_custkey"),
                    *others,
                )
                for k in range(n)
            ]
        elif name == "lineitem":
            o_step = load_table(spark, BASE, "orders").agg(
                F.max("o_orderkey")
            ).first()[0] + 1
            p_step = load_table(spark, BASE, "part").agg(
                F.max("p_partkey")
            ).first()[0] + 1
            others = [c for c in df.columns if c not in ("l_orderkey", "l_partkey")]
            parts = [
                df.select(
                    (F.col("l_orderkey") + k * o_step).alias("l_orderkey"),
                    (F.col("l_partkey") + k * p_step).alias("l_partkey"),
                    *others,
                )
                for k in range(n)
            ]
        elif name == "customer":
            c_step = df.agg(F.max("c_custkey")).first()[0] + 1
            others = [c for c in df.columns if c != "c_custkey"]
            parts = [
                df.select(
                    (F.col("c_custkey") + k * c_step).alias("c_custkey"),
                    *others,
                )
                for k in range(n)
            ]
        elif name == "part":
            p_step = df.agg(F.max("p_partkey")).first()[0] + 1
            others = [c for c in df.columns if c != "p_partkey"]
            parts = [
                df.select(
                    (F.col("p_partkey") + k * p_step).alias("p_partkey"),
                    *others,
                )
                for k in range(n)
            ]
        else:
            v_step = df.agg(F.max("vec_id")).first()[0] + 1
            parts = [
                df.select(
                    (F.col("vec_id") + k * v_step).alias("vec_id"),
                    "embedding",
                    "label",
                )
                for k in range(n)
            ]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.mode("overwrite").parquet(dst)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", default="1,2,4,8")
    ap.add_argument("--out", default=None, help="write a SCALING.md report")
    ap.add_argument("--keep", action="store_true", help="keep scratch tables")
    ap.add_argument(
        "--repeats",
        type=int,
        default=1,
        help="timed runs per (query, scale); the MEDIAN is reported — "
        "sub-second rows need >1 to keep r8/2 out of noise territory",
    )
    ap.add_argument(
        "--only",
        default=None,
        help="comma-separated query names: probe only these; with --out "
        "pointing at an existing report, the other rows are carried over "
        "unchanged (targeted re-measurement instead of a full regen)",
    )
    args = ap.parse_args()
    scales = [int(s) for s in args.scales.split(",")]
    only = set(args.only.split(",")) if args.only else None
    if only:
        unknown = only - {q for q, _ in PROBES}
        if unknown:
            raise SystemExit(f"--only names not in PROBES: {sorted(unknown)}")

    from reflinkcep_spark.queries import all_queries
    from reflinkcep_spark.session import get_spark

    spark = get_spark(app_name="reflinkcep-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()
    # Pre-staged queries (written + oracle-verified but not yet
    # registered — the next round's rotation queue) are probe-able too:
    # fall back to the query modules' namespaces for PROBES names the
    # registry doesn't know yet.
    from reflinkcep_spark.queries import _MODULES

    for mod in _MODULES:
        for _q, _ in PROBES:
            if _q not in queries and hasattr(mod, _q):
                queries[_q] = getattr(mod, _q)

    # warm JVM + Python worker pool (see bench.py)
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    def _warm(it):
        yield from it

    spark.range(0, 64, 1, 32).mapInPandas(_warm, "id long").collect()

    dirs = {}
    for n in scales:
        d = os.path.join(SCRATCH, f"x{n}")
        print(f"building x{n} tables ...", flush=True)
        replicate(spark, n, d)
        dirs[n] = d

    def build(qname: str, n: int):
        if qname == "dedup_ngram_jaccard":
            # The query's max_df cap is a FRACTION of the corpus.  In a
            # real growing corpus, per-shingle document frequency grows
            # with the corpus, so the fraction admits the same shingle
            # set at any size.  In this synthetic replication df stays
            # constant-absolute (copies are shingle-disjoint), so a
            # fixed fraction admits ever-hotter shingles as N grows —
            # super-linear pair expansion by construction, not by plan
            # defect.  Holding the ABSOLUTE cap constant (0.1/N) is the
            # like-for-like measurement.
            from reflinkcep_spark.functions import dedup as _dedup
            from reflinkcep_spark.queries.pipeline import _docs as _d

            return _dedup.ngram_jaccard_pairs(
                _d(spark, dirs[n]), threshold=0.5, n=3, max_df=0.1 / n
            )
        if qname == "dedup_semantic":
            # SemDeDup's knob is CLUSTER COUNT: the paper scales it
            # with the corpus so expected cell size stays constant
            # (similarity.semantic_dedup documents Σ|cell|² as the
            # cost).  A fixed n_cells under N× replication grows
            # in-cell pair work N² by construction, not by plan defect
            # — holding cell size constant (n_cells = 16·N) is the
            # like-for-like measurement, same reasoning as
            # dedup_ngram_jaccard's absolute-cap correction above.
            # max_fit_rows pinned: the default budget (256 rows/cell)
            # makes the DRIVER-side numpy Lloyd fit O(sample·k) =
            # O(N²) when both scale with N — measured 79 s at x16,
            # all of it single-threaded fit, none of it the
            # distributed plan.  A production fit at paper scale is
            # minibatch/ANN-assisted anyway; pinning the sample
            # isolates what this probe measures: the Spark plan.
            from reflinkcep_spark.functions import similarity as _sim
            from reflinkcep_spark.queries.pipeline import _embs as _e

            return _sim.semantic_dedup(
                _e(spark, dirs[n]), threshold=0.3, n_cells=16 * n,
                max_fit_rows=4096,
            )
        if qname == "dedup_clusters":
            # Built on the same relative-capped pair generator — same
            # absolute-cap correction as dedup_ngram_jaccard above.
            from reflinkcep_spark.functions import dedup as _dedup
            from reflinkcep_spark.queries.pipeline import _docs as _d

            pairs = _dedup.ngram_jaccard_pairs(
                _d(spark, dirs[n]), threshold=0.5, n=3, max_df=0.1 / n
            )
            return _dedup.duplicate_clusters(pairs)
        return queries[qname](spark, dirs[n])

    results: dict[str, dict[int, float]] = {}
    for qname, table in PROBES:
        if only and qname not in only:
            continue
        results[qname] = {}
        for n in scales:
            samples = []
            for _ in range(max(1, args.repeats)):
                t0 = time.time()
                build(qname, n).write.format("noop").mode("overwrite").save()
                samples.append(time.time() - t0)
            samples.sort()
            dt = samples[len(samples) // 2]
            results[qname][n] = dt
            print(
                f"{qname:28s} x{n}: {dt:7.3f}s"
                + (f"  (median of {samples})" if len(samples) > 1 else ""),
                flush=True,
            )

    # Carry-over from the existing report (targeted --only re-probes
    # AND full regens alike): rows not re-measured this run, repeat
    # PROVENANCE (the footer's "Median-of-N rows:" lines, so earlier
    # re-measurements keep their label instead of silently reading as
    # single-shot), and hand-added "## " extension sections (e.g. the
    # x16 table) — a full regen must not silently drop any of them.
    carried: dict[str, str] = {}
    prov: dict[str, int] = {}
    extension = ""
    if args.out and os.path.exists(args.out):
        in_extension = False
        with open(args.out) as f:
            for line in f:
                if line.startswith("## "):
                    # Hand-added extension sections (e.g. the x16 table)
                    # may reuse query names with DIFFERENT columns —
                    # they are carried VERBATIM, not merged as rows.
                    in_extension = True
                if in_extension:
                    extension += line
                    continue
                if line.startswith("| ") and not line.startswith("| query"):
                    carried[line.split("|")[1].strip()] = line.rstrip("\n")
                m = re.match(r"Median-of-(\d+) rows: (.+)\.$", line.strip())
                if m:
                    for name in m.group(2).split(", "):
                        prov[name] = int(m.group(1))

    lines = [
        "# SCALING — measured wall time vs input multiple",
        "",
        f"Base: {BASE} replicated x{{{','.join(map(str, scales))}}} with",
        "perturbed keys (see scripts/scale_probe.py for why replication",
        f"preserves workload shape).  local[*] with "
        f"{spark.sparkContext.defaultParallelism} cores,",
        "noop sink (full computation, no collect).  `r8/2` = time(x8) /",
        "time(x2): ideal linear scaling = 4.0, and the x2 denominator",
        "absorbs the fixed per-query overhead that dominates the x1 runs.",
        "",
        "| query | " + " | ".join(f"x{n} (s)" for n in scales) + " | r8/2 |",
        "|---|" + "---|" * (len(scales) + 1),
    ]
    for qname, _ in PROBES:
        if qname not in results:
            if qname in carried:
                lines.append(carried[qname])
            else:
                # "no silent caps": a probe with neither a fresh
                # measurement nor a prior row would vanish from the
                # table — say so instead.
                print(
                    f"WARNING: probe {qname} not measured this run and "
                    f"has no carried row — absent from the table "
                    f"(re-run with --only {qname} or a full regen)",
                    flush=True,
                )
            continue
        r = results[qname]
        ratio = (
            f"{r[8] / r[2]:.2f}" if 8 in r and 2 in r and r[2] > 0 else "n/a"
        )
        lines.append(
            f"| {qname} | "
            + " | ".join(f"{r[n]:.2f}" for n in scales)
            + f" | {ratio} |"
        )
    for qname in results:
        if args.repeats > 1:
            prov[qname] = args.repeats
        else:
            prov.pop(qname, None)  # freshly re-measured single-shot
    probe_names = {q for q, _ in PROBES}
    groups: dict[int, list[str]] = {}
    for qname, n in prov.items():
        if qname in probe_names:
            groups.setdefault(n, []).append(qname)
    if groups:
        lines.append("")
        for n in sorted(groups, reverse=True):
            lines.append(f"Median-of-{n} rows: {', '.join(sorted(groups[n]))}.")
        lines += [
            "Other rows are single-shot.  Sub-2s rows get repeats because a",
            "single-shot r8/2 there swings ±0.3 with ordinary box noise",
            "(scripts/scale_probe.py --only/--repeats).",
        ]
    report = "\n".join(lines) + "\n"
    if extension:
        report += "\n" + extension
    print(report)
    if args.out:
        with open(args.out, "w") as f:
            f.write(report)
        print(f"wrote {args.out}")
    if not args.keep:
        shutil.rmtree(SCRATCH, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

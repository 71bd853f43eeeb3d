#!/usr/bin/env python3
"""A/B: q_waiting_suppliers (TPC-H Q21 shape) — semi/anti SELF-JOINS vs
per-order distinct-supplier AGGREGATES (guide §2.3, aggregate before you
shuffle).

OLD: l1 LEFT SEMI lineitem on (same order, diff supp), LEFT ANTI late on
     (same order, diff supp) — both build sides are fact-scale frames.
NEW: order-level countDistinct(l_suppkey) over lineitem (>=2) and over
     late (==1); l1 left-semi joins the two orderkey-only key sets.

Equivalence:
  EXISTS(l2: same order, supp<>l1.supp)  <=>  #distinct supp(order) >= 2
    (l1's supp is on the order, so >=2 distinct implies one differs; ==1
     implies every row carries l1's own supp).
  NOT EXISTS(l3 in late: same order, supp<>l1.supp)
    <=> #distinct late supp(order) == 1  (l1 itself is late, so the set
        contains exactly l1's supp).
Row multiplicity: semi joins preserve l1 rows exactly as before.

Verifies row-for-row output equality first, then ABBA best-of-N timing
through the noop sink in ONE session.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from reflinkcep_spark.session import get_spark
from reflinkcep_spark.sources.tables import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _t(spark, name):
    return load_table(spark, SF_DIR, name)


def _common(spark):
    li = _t(spark, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    orders = (
        _t(spark, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    late = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
        .select("l_orderkey", "l_suppkey")
    )
    late = late.localCheckpoint(eager=False)
    supp_f = (
        _t(spark, "supplier")
        .join(
            F.broadcast(_t(spark, "nation").filter(F.col("n_name") == "NATION_3")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name")
    )
    l1 = late.join(supp_f, late.l_suppkey == supp_f.s_suppkey)
    return li, late, l1


def q_old(spark):
    li, late, l1 = _common(spark)
    l2 = li.select(F.col("l_orderkey").alias("o2"), F.col("l_suppkey").alias("s2"))
    l3 = late.select(F.col("l_orderkey").alias("o3"), F.col("l_suppkey").alias("s3"))
    waiting = (
        l1.join(
            l2,
            (l1.l_orderkey == l2.o2) & (l1.l_suppkey != l2.s2),
            "leftsemi",
        ).join(
            l3,
            (F.col("l_orderkey") == l3.o3) & (F.col("l_suppkey") != l3.s3),
            "leftanti",
        )
    )
    return (
        waiting.groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(10)
    )


def q_new(spark):
    li, late, l1 = _common(spark)
    multi = (
        li.groupBy("l_orderkey")
        .agg(F.count_distinct("l_suppkey").alias("n_supp"))
        .filter(F.col("n_supp") >= 2)
        .select(F.col("l_orderkey").alias("o2"))
    )
    solo = (
        late.groupBy("l_orderkey")
        .agg(F.count_distinct("l_suppkey").alias("n_late_supp"))
        .filter(F.col("n_late_supp") == 1)
        .select(F.col("l_orderkey").alias("o3"))
    )
    waiting = (
        l1.join(multi, l1.l_orderkey == multi.o2, "leftsemi")
        .join(solo, F.col("l_orderkey") == solo.o3, "leftsemi")
    )
    return (
        waiting.groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(10)
    )


def main():
    spark = get_spark(app_name="ab-waiting-suppliers")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    rows_old = [tuple(r) for r in q_old(spark).collect()]
    rows_new = [tuple(r) for r in q_new(spark).collect()]
    assert rows_old == rows_new, (
        f"OUTPUT MISMATCH\nold={rows_old}\nnew={rows_new}"
    )
    print(f"output identical: {len(rows_old)} rows -> {rows_old[:3]}")

    def run(fn, tag):
        spark.sparkContext.setJobDescription(tag)
        t0 = time.perf_counter()
        fn(spark).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    # warm both
    run(q_old, "warm-old"); run(q_new, "warm-new")
    ts = {"old": [], "new": []}
    for order in ("on", "no", "on", "no"):   # ABBA-BAAB
        for c in order:
            key = "old" if c == "o" else "new"
            ts[key].append(run(q_old if c == "o" else q_new, f"{key}"))
    for k, v in ts.items():
        print(k, [f"{x:.3f}" for x in v], "best", f"{min(v):.3f}",
              "median", f"{sorted(v)[len(v)//2]:.3f}")
    spark.stop()


if __name__ == "__main__":
    main()

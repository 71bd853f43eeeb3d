"""Round-14 optimization pins: the numpy mapInPandas/applyInPandas
kernels that replaced interpreted Catalyst higher-order-function folds
(semantic_dedup's in-cell witness, IVF/PQ assignment+encode+ADC, the
MinHash permutation fold) must be BIT-IDENTICAL to the expression
trees they replaced.  Each test reconstructs the old expression form
inline and compares exactly — any rounding/tie-break/hash drift in the
kernels fails here before it can silently change a rows-only query.
"""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F


def test_np_xxh64_matches_spark(spark):
    """_np_xxh64_long / _np_xxh64_int replicate F.xxhash64 exactly,
    both the direct long hash and the chained (int literal, long)
    form the MinHash permutations use."""
    from reflinkcep_spark.functions.dedup import _np_xxh64_int, _np_xxh64_long

    rng = np.random.RandomState(7)
    vals = np.concatenate(
        [
            rng.randint(-(2**62), 2**62, size=500, dtype=np.int64),
            np.array([0, 1, -1, 2**63 - 1, -(2**63)], dtype=np.int64),
        ]
    )
    df = spark.createDataFrame([(int(v),) for v in vals], "v long")
    want = df.select(
        F.xxhash64("v").alias("h"),
        *[F.xxhash64(F.lit(i), "v").alias(f"h{i}") for i in (0, 1, 31)],
    ).toPandas()
    u = vals.view(np.uint64)
    got = _np_xxh64_long(u, np.uint64(42)).view(np.int64)
    assert (got == want["h"].to_numpy()).all()
    for i in (0, 1, 31):
        seed_i = _np_xxh64_int(i, 42)
        got_i = _np_xxh64_long(u, seed_i).view(np.int64)
        assert (got_i == want[f"h{i}"].to_numpy()).all()


def test_cumsum_is_sequential_fold():
    """The exactness contract of every float kernel: np.cumsum's last
    element equals a strict left-to-right float64 fold, bitwise —
    np.add.accumulate is sequential, unlike np.sum's pairwise path."""
    rng = np.random.RandomState(0)
    for _ in range(50):
        p = rng.randn(64) * 10 ** rng.randint(-6, 7)
        acc = np.float64(0.0)
        for v in p:
            acc = acc + v
        assert acc == np.cumsum(p)[-1]


def test_minhash_signatures_match_expression_fold(spark):
    """The numpy permutation fold reproduces the retired
    aggregate/zip_with expression bit-for-bit on real docs."""
    from reflinkcep_spark.functions.dedup import minhash_signatures, shingles
    from reflinkcep_spark.sources import load_table

    num_perm = 16
    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    got = (
        minhash_signatures(docs, num_perm=num_perm, shingle_n=3)
        .orderBy("doc_id")
        .toPandas()
    )
    # the pre-round-14 expression form, verbatim
    MAXL = (1 << 63) - 1
    hashed = F.transform(shingles(F.col("text"), 3), lambda s: F.xxhash64(s))
    sig = F.aggregate(
        hashed,
        F.array_repeat(F.lit(MAXL).cast("long"), num_perm),
        lambda acc, h: F.zip_with(
            acc,
            F.array(*[F.xxhash64(F.lit(i), h) for i in range(num_perm)]),
            lambda a, b: F.least(a, b),
        ),
    )
    want = (
        docs.select(F.col("doc_id"), sig.alias("signature"))
        .orderBy("doc_id")
        .toPandas()
    )
    assert list(got["doc_id"]) == list(want["doc_id"])
    for g, w in zip(got["signature"], want["signature"]):
        assert list(g) == list(w)


def test_semantic_dedup_matches_hof_reference(spark):
    """The numpy witness kernel reproduces the retired in-row HOF fold
    (filter/transform/array_min over collect_list'd cells) exactly,
    including the keep flag, on real embeddings."""
    from reflinkcep_spark.functions import similarity as S

    embs = load = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    got = (
        S.semantic_dedup(embs, threshold=0.3, n_cells=4)
        .orderBy("vec_id")
        .toPandas()
    )

    # the pre-round-14 expression form, verbatim
    c = S._as_double(embs, "embedding")
    centers = S._fit_cell_centers(c, 4, 42, None, None, "embedding", "vec_id")
    nearest = S._nearest_cells_expr(centers)
    assigned = c.select(
        F.col("vec_id").alias("id"),
        F.col("embedding").alias("v"),
        F.element_at(nearest(F.col("embedding"), 1), 1).alias("cell"),
    )
    members = F.col("members")
    per_member = F.transform(
        members,
        lambda y: F.struct(
            y["id"].alias("vec_id"),
            F.array_min(
                F.transform(
                    F.filter(
                        members,
                        lambda x: (x["id"] < y["id"])
                        & (S.cosine(x["v"], y["v"]) >= F.lit(0.3)),
                    ),
                    lambda x: x["id"],
                )
            ).alias("dup_of"),
        ),
    )
    grouped = assigned.groupBy("cell").agg(
        F.collect_list(F.struct("id", "v")).alias("members")
    )
    want = (
        grouped.select("cell", F.explode(per_member).alias("m"))
        .select(
            F.col("m.vec_id").alias("vec_id"),
            "cell",
            F.col("m.dup_of").alias("dup_of"),
            F.col("m.dup_of").isNull().alias("keep"),
        )
        .orderBy("vec_id")
        .toPandas()
    )
    assert got.equals(want)


def test_pq_encode_adc_match_expression_form(spark):
    """The numpy encode + ADC kernels reproduce the retired
    array_sort-argmin / nested-aggregate expression forms exactly."""
    from reflinkcep_spark.functions import similarity as S

    embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = embs.filter(F.col("vec_id") < 4)
    got = (
        S.pq_ann_topk(embs, queries, k=3, m_sub=8, ksub=8)
        .orderBy("query_id", "rank")
        .toPandas()
    )

    # the pre-round-14 expression form, verbatim
    c = S._as_double(embs, "embedding")
    books = S._fit_pq_codebooks(c, 8, 8, 42, None, "embedding", "vec_id")
    dsub = len(books[0][0])
    ksub_actual = len(books[0])
    cb = F.lit(books)
    _sq = S._sq_dist_expr

    def _sub(vec, m):
        return F.slice(vec, m * dsub + 1, dsub)

    def _encode(vec):
        return F.transform(
            F.sequence(F.lit(0), F.lit(8 - 1)),
            lambda m: F.element_at(
                F.array_sort(
                    F.zip_with(
                        F.element_at(cb, m + 1),
                        F.sequence(F.lit(0), F.lit(ksub_actual - 1)),
                        lambda ctr, kk: F.struct(
                            _sq(_sub(vec, m), ctr).alias("d"), kk.alias("k")
                        ),
                    )
                ),
                1,
            )["k"],
        )

    enc = c.select(
        F.col("vec_id").alias("neighbor_id"),
        _encode(F.col("embedding")).alias("__code"),
    )
    q = S._as_double(queries, "embedding").select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("__qv")
    )
    adc = F.aggregate(
        F.sequence(F.lit(0), F.lit(8 - 1)),
        F.lit(0.0),
        lambda acc, m: acc
        + _sq(
            _sub(F.col("__qv"), m),
            F.element_at(
                F.element_at(cb, m + 1),
                F.element_at(F.col("__code"), m + 1) + 1,
            ),
        ),
    )
    from pyspark.sql import Window

    scored = (
        enc.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", adc.alias("adc"))
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("adc"), F.asc("neighbor_id"))
    want = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select(
            "query_id", "rank", "neighbor_id", F.round("adc", 6).alias("adc")
        )
        .orderBy("query_id", "rank")
        .toPandas()
    )
    got = got.rename(columns={"rnk": "rank"}) if "rnk" in got.columns else got
    assert got.equals(want)


def test_ivf_assignment_matches_hof_reference(spark):
    """_assign_cells_pandas equals the retired nearest-cell HOF
    projection row-for-row."""
    from reflinkcep_spark.functions import similarity as S

    embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    c = S._as_double(embs, "embedding")
    centers = S._fit_cell_centers(c, 8, 42, None, None, "embedding", "vec_id")
    got = (
        S._assign_cells_pandas(c, centers, "vec_id", "embedding")
        .select(F.col("id").alias("vec_id"), "cell")
        .orderBy("vec_id")
        .toPandas()
    )
    nearest = S._nearest_cells_expr(centers)
    want = (
        c.select(
            F.col("vec_id"),
            F.element_at(nearest(F.col("embedding"), 1), 1).alias("cell"),
        )
        .orderBy("vec_id")
        .toPandas()
    )
    assert got.equals(want)


def test_pair_counts_matches_expression_form(spark):
    """_pair_counts (numpy triu expansion + in-batch run-length
    pre-aggregation) reproduces the retired
    explode(filter(flatten(transform×transform))) expression exactly,
    including the edge cases the a<b value filter implied: duplicate
    doc ids inside one posting list contribute one pair per index
    combination, equal-value pairs are dropped entirely, and lists of
    different lengths coexist in one Arrow batch."""
    from reflinkcep_spark.functions.dedup import _pair_counts

    rng = np.random.RandomState(11)
    lists = []
    for _ in range(200):
        m = rng.randint(2, 9)
        ids = rng.randint(0, 40, size=m).tolist()  # collisions on purpose
        lists.append((ids,))
    # adversarial rows: all-equal list, sorted, reverse-sorted
    lists += [([7, 7, 7],), ([1, 2, 3, 4],), ([9, 5, 3],)]
    src = spark.createDataFrame(lists, "ids array<long>").repartition(4)

    ids = F.col("ids")
    pairs = F.filter(
        F.flatten(
            F.transform(
                ids,
                lambda a: F.transform(
                    ids, lambda b: F.struct(a.alias("doc_a"), b.alias("doc_b"))
                ),
            )
        ),
        lambda p: p["doc_a"] < p["doc_b"],
    )
    want = (
        src.select(F.explode(pairs).alias("p"))
        .groupBy("p.doc_a", "p.doc_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
        .orderBy("doc_a", "doc_b")
        .toPandas()
    )
    got = _pair_counts(src).orderBy("doc_a", "doc_b").toPandas()
    assert got["doc_a"].tolist() == want["doc_a"].tolist()
    assert got["doc_b"].tolist() == want["doc_b"].tolist()
    assert got["n_common"].tolist() == want["n_common"].tolist()

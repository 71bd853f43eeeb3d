"""Similarity search over embedding columns (``ARRAY<FLOAT>``).

* ``cosine_topk`` — exact brute-force top-k: broadcast the (small)
  query set against the full corpus, dot products via ``zip_with`` +
  ``aggregate`` (JVM codegen), rank with one window per query id.  The
  correctness baseline, and at 100 TB still the right plan whenever the
  query set is small (it's a broadcast map-side scan, no shuffle of the
  corpus).
* ``lsh_ann_topk`` — approximate: random-hyperplane LSH buckets the
  corpus once (signatures are deterministic given ``seed``); queries
  probe only their own bucket (plus optional 1-bit multiprobes), then
  score exactly within candidates.  The scale path when the query set
  is itself large.
* ``embedding_neardup_pairs`` — all corpus pairs with cosine ≥ t via
  bucket blocking (for near-duplicate detection rather than search).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "cosine",
    "cosine_topk",
    "lsh_ann_topk",
    "ivf_ann_topk",
    "embedding_neardup_pairs",
    "semantic_dedup",
    "kmeans_fixedpoint",
    "random_projection_int",
]


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v)
    )


def cosine(a, b):
    """Cosine similarity of two double arrays (cast upstream)."""
    return _dot(a, b) / (_norm(a) * _norm(b))


def _sq_dist_expr(a, b):
    """Squared L2 distance of two double arrays as a sequential
    left-to-right fold — the exact fold order every IVF/PQ oracle
    mirrors with list_reduce; shared so a fold tweak can never drift
    between the centroid-assignment and ADC paths."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _as_double(df: DataFrame, vec_col: str) -> DataFrame:
    return df.withColumn(vec_col, F.col(vec_col).cast("array<double>"))


def _quantize_fixed(vec, scale: int):
    """Fixed-point quantization shared by every integer-arithmetic
    operator (k-means, JL projection): floor, not round — the engines'
    half-way rules differ — over the double-cast coordinates.  Shared
    so a quantization-policy tweak can never drift between operators
    (the _sq_dist_expr rationale)."""
    return F.transform(vec, lambda x: F.floor(x * F.lit(float(scale))))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k neighbors for every query vector.

    Returns (query_id, rank, neighbor_id, sim); ties broken by
    neighbor id for determinism.  ``queries`` is broadcast — keep it
    small (the corpus side streams through the scan unshuffled; only
    the per-query top-k window shuffles, and that input is already cut
    down to candidates × queries).
    """
    c = _as_double(corpus, vec_col).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv")
    )
    q = _as_double(queries, vec_col).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv")
    )
    scored = (
        c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("__qv"), F.col("__cv")).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", F.round("sim", 6).alias("sim"))
    )


def _hyperplanes(dim: int, n_planes: int, seed: int) -> list[list[float]]:
    """Deterministic pseudo-random unit hyperplanes (pure python so the
    same planes can be reproduced anywhere)."""
    import random

    rng = random.Random(seed)
    planes = []
    for _ in range(n_planes):
        v = [rng.gauss(0.0, 1.0) for _ in range(dim)]
        n = math.sqrt(sum(x * x for x in v)) or 1.0
        planes.append([x / n for x in v])
    return planes


def _signature(vec_col, planes: list[list[float]]):
    bits = None
    for i, p in enumerate(planes):
        # One Literal node per plane (not 1 per coordinate) — keeps the
        # expression tree small so analysis/codegen stays cheap even at
        # high n_planes × dim.
        bit = F.when(_dot(vec_col, F.lit(p)) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
        bits = bit if bits is None else bits.bitwiseOR(bit)
    return bits.cast("int")


def lsh_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 8,
    dim: int = 64,
    seed: int = 42,
    multiprobe: bool = True,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate top-k: random-hyperplane buckets + exact rescoring
    within the probed buckets (candidates ≈ corpus / 2^n_planes per
    probe)."""
    planes = _hyperplanes(dim, n_planes, seed)
    c = _as_double(corpus, vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cv"),
        _signature(F.col(vec_col), planes).alias("bucket"),
    )
    q = _as_double(queries, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        _signature(F.col(vec_col), planes).alias("qbucket"),
    )
    if multiprobe:
        # probe the home bucket and every 1-bit-flip neighbor bucket
        probes = F.array(
            F.col("qbucket"),
            *[
                F.col("qbucket").bitwiseXOR(F.lit(1 << i)).cast("int")
                for i in range(n_planes)
            ],
        )
        q = q.select("query_id", "__qv", F.explode(probes).alias("qbucket"))
    cand = c.join(
        F.broadcast(q),
        (F.col("bucket") == F.col("qbucket"))
        & (F.col("neighbor_id") != F.col("query_id")),
    )
    scored = cand.select(
        "query_id", "neighbor_id", cosine(F.col("__qv"), F.col("__cv")).alias("sim")
    ).dropDuplicates(["query_id", "neighbor_id"])
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", F.round("sim", 6).alias("sim"))
    )


def _fit_centroids(X, n_cells: int, seed: int, iters: int = 25):
    """KMeans on a bounded in-memory sample: k-means++ seeding + Lloyd
    iterations, fully vectorized numpy.  Deterministic given ``seed``.
    Empty cells are reseeded to the point farthest from its centroid."""
    import numpy as np

    rng = np.random.RandomState(seed)
    n = len(X)
    k = min(n_cells, n)
    # k-means++ seeding
    centers = np.empty((k, X.shape[1]), dtype=np.float64)
    centers[0] = X[rng.randint(n)]
    d2 = ((X - centers[0]) ** 2).sum(axis=1)
    for j in range(1, k):
        tot = d2.sum()
        idx = rng.choice(n, p=d2 / tot) if tot > 0 else rng.randint(n)
        centers[j] = X[idx]
        d2 = np.minimum(d2, ((X - centers[j]) ** 2).sum(axis=1))
    # Lloyd
    x2 = (X**2).sum(axis=1)[:, None]
    for _ in range(iters):
        d = x2 - 2.0 * (X @ centers.T) + (centers**2).sum(axis=1)[None, :]
        assign = d.argmin(axis=1)
        moved = False
        for j in range(k):
            members = X[assign == j]
            if len(members):
                nc = members.mean(axis=0)
            else:  # reseed an empty cell to the worst-served point
                nc = X[d.min(axis=1).argmax()]
            if not np.array_equal(nc, centers[j]):
                centers[j] = nc
                moved = True
        if not moved:
            break
    return centers


def _fit_sample(c: DataFrame, max_rows: int, vec_col: str, id_col: str):
    """The quantizer-fit sampling contract shared by the IVF coarse
    quantizer and the PQ codebooks: a BOUNDED, id-ordered sample
    collected once through Arrow.  The id-ordered prefix is
    deterministic under ANY partitioning (repartitioned input, AQE,
    retries) — a bare limit() is not — so fitted centers are
    reproducible, including by an external oracle.  TakeOrdered =
    scan + per-partition heap of max_rows: one cheap pass at any
    scale.  Returns the sample as a float64 numpy matrix."""
    import numpy as np

    sample = (
        c.select(F.col(id_col).alias("__id"), F.col(vec_col).alias("__v"))
        .orderBy("__id")
        .limit(max_rows)
    )
    return np.array(sample.toPandas()["__v"].tolist(), dtype=np.float64)


def _fit_cell_centers(
    c: DataFrame,
    n_cells: int,
    seed: int,
    fit_sample: float | None,
    max_fit_rows: int | None,
    vec_col: str,
    id_col: str,
) -> list[list[float]]:
    """The shared coarse-quantizer front end of :func:`ivf_ann_topk`
    and :func:`semantic_dedup`: fit KMeans centers on the bounded,
    order-canonical :func:`_fit_sample` (default 256 rows per cell,
    the standard IVF training budget) with vectorized numpy Lloyd's
    on the driver — a coarse quantizer needs a sample, not the
    corpus."""
    if max_fit_rows is None:
        max_fit_rows = 256 * n_cells
    fit_input = c.sample(fit_sample, seed=seed) if fit_sample else c
    X = _fit_sample(fit_input, max_fit_rows, vec_col, id_col)
    return [[float(x) for x in ctr] for ctr in _fit_centroids(X, n_cells, seed)]


def _nearest_cells_expr(centers: list[list[float]]):
    """``fn(vec, n) -> Column``: the ``n`` nearest centroid indices for
    ``vec``.  The (tiny) centroid table rides into the plan as ONE
    nested-array Literal — n_cells × dim doubles as a single plan node
    instead of thousands, so plan analysis/codegen time collapses —
    and assignment is JVM-side expression work, no join."""
    cent_arr = F.lit(centers)
    _sq_dist = _sq_dist_expr

    def _nearest_cells(vec, n):
        ranked = F.array_sort(
            F.zip_with(
                cent_arr,
                F.sequence(F.lit(0), F.lit(len(centers) - 1)),
                lambda ctr, i: F.struct(
                    _sq_dist(vec, ctr).alias("d"), i.alias("cell")
                ),
            )
        )
        return F.slice(F.transform(ranked, lambda s: s["cell"]), 1, n)

    return _nearest_cells


def _assign_cells_pandas(
    df: DataFrame, centers: list[list[float]], id_col: str, vec_col: str
) -> DataFrame:
    """Nearest-cell assignment as a ``mapInPandas`` numpy kernel —
    bit-identical to ``element_at(_nearest_cells_expr(centers)(v,1),1)``
    but vectorized (round 14): the Catalyst form is an INTERPRETED
    higher-order fold (n_cells × dim lambda dispatches per row, the
    CodegenFallback path) and measured ~1 s for 2k×64 vectors at
    sf0.1; the numpy form is the same arithmetic in microseconds.

    Exactness contract (shared with the oracle's list_reduce replay):
    squared-distance terms are elementwise IEEE float64; the
    dimension fold is strict left-to-right (np.cumsum — sequential by
    construction, see semantic_dedup's kernel note); the array_sort
    tie-break (equal distance → lower cell index) is np.argmin's
    first-minimum rule.  NaN distances: array_sort orders NaN LAST, so
    a NaN-distance cell never wins unless every distance is NaN —
    np.argmin prefers NaN, so mask them explicitly (all-NaN rows keep
    Spark's cell-0-wins... array_sort stability: all-equal keys keep
    the original 0..n-1 sequence order → cell 0; np.nanargmin on an
    all-NaN row raises, so fall back to 0).

    Output: the input columns renamed to (id, v) plus ``cell`` (int),
    one row per input row — the shared front half of semantic_dedup
    and ivf_ann_topk corpus assignment.
    """
    import numpy as np
    import pandas as pd

    from pyspark.sql.types import IntegerType, StructField, StructType

    C = np.array(centers, dtype=np.float64)  # (k, d)
    src = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    out_schema = StructType(
        list(src.schema.fields) + [StructField("cell", IntegerType(), True)]
    )

    def _assign(pdf_iter):
        for pdf in pdf_iter:
            if not len(pdf):
                continue
            X = np.array(pdf["v"].tolist(), dtype=np.float64)  # (n, d)
            diff = X[:, None, :] - C[None, :, :]  # (n, k, d)
            d2 = np.cumsum(diff * diff, axis=2)[:, :, -1]  # seq fold
            nan_rows = np.isnan(d2).all(axis=1)
            d2 = np.where(np.isnan(d2), np.inf, d2)
            cell = d2.argmin(axis=1).astype(np.int32)
            cell[nan_rows] = 0  # array_sort stability: cell 0 wins
            out = pdf.copy()
            out["cell"] = cell
            yield out

    return src.mapInPandas(_assign, out_schema)


def ivf_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_cells: int = 16,
    nprobe: int = 4,
    seed: int = 42,
    fit_sample: float | None = None,
    max_fit_rows: int | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: a KMeans coarse quantizer
    partitions the corpus into ``n_cells`` cells; every query probes its
    ``nprobe`` nearest centroids and is rescored exactly (cosine) inside
    the probed cells only — candidates ≈ corpus · nprobe / n_cells.

    The quantizer trains on a BOUNDED sample (default 256 rows per
    cell, the standard IVF training budget), collected once through
    Arrow and fit with vectorized numpy Lloyd's on the driver — a
    coarse quantizer needs a sample, not the corpus, and a distributed
    iterative ML job (one Spark job per Lloyd iteration) in front of
    every query is pure scheduling overhead at any scale.  Cell
    ASSIGNMENT stays exact for the full corpus regardless (a per-row
    nearest-centroid expression).  Pass ``fit_sample`` (a fraction) for
    an unbiased sample instead of the first-rows default; the row cap
    always applies.  The (tiny) centroid table rides into the query
    plan as literals, so probing is JVM-side expression work, no extra
    join.
    """
    c = _as_double(corpus, vec_col)
    centers = _fit_cell_centers(
        c, n_cells, seed, fit_sample, max_fit_rows, vec_col, id_col
    )
    _nearest_cells = _nearest_cells_expr(centers)

    # corpus assignment: vectorized numpy kernel (round 14), bit-equal
    # to the old HOF projection — see _assign_cells_pandas.  The QUERY
    # side keeps the Catalyst expression: it is a handful of rows and
    # needs the nprobe-deep ranking, not just the argmin.
    assigned = _assign_cells_pandas(c, centers, id_col, vec_col).select(
        F.col("id").alias("neighbor_id"),
        F.col("v").alias("__cv"),
        "cell",
    )
    q = _as_double(queries, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        F.explode(_nearest_cells(F.col(vec_col), nprobe)).alias("qcell"),
    )
    cand = assigned.join(
        F.broadcast(q),
        (F.col("cell") == F.col("qcell"))
        & (F.col("neighbor_id") != F.col("query_id")),
    )
    scored = cand.select(
        "query_id", "neighbor_id", cosine(F.col("__qv"), F.col("__cv")).alias("sim")
    ).dropDuplicates(["query_id", "neighbor_id"])
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", F.round("sim", 6).alias("sim"))
    )


def _fit_pq_codebooks(
    c: DataFrame,
    m_sub: int,
    ksub: int,
    seed: int,
    max_fit_rows: int | None,
    vec_col: str,
    id_col: str,
) -> list[list[list[float]]]:
    """Product-quantization codebooks: split the vector into ``m_sub``
    contiguous subspaces and fit an independent ``ksub``-center KMeans
    per subspace on ONE bounded, id-ordered sample (the
    :func:`_fit_cell_centers` determinism contract — reproducible by
    an external oracle under any partitioning).  Returns
    ``m_sub × ksub × (dim/m_sub)`` floats — e.g. 8×16×8 = 1 KiB of
    codebook for 64-dim vectors, the whole "index" a broadcastable
    literal."""
    if m_sub < 1:
        raise ValueError(f"m_sub must be >= 1, got {m_sub}")
    if max_fit_rows is None:
        max_fit_rows = 256 * ksub
    X = _fit_sample(c, max_fit_rows, vec_col, id_col)
    if X.size == 0:
        raise ValueError("cannot fit PQ codebooks on an empty corpus")
    dim = X.shape[1]
    if dim % m_sub:
        raise ValueError(f"dim {dim} not divisible by m_sub {m_sub}")
    dsub = dim // m_sub
    return [
        [
            [float(x) for x in ctr]
            for ctr in _fit_centroids(
                X[:, m * dsub : (m + 1) * dsub], ksub, seed + m
            )
        ]
        for m in range(m_sub)
    ]


def pq_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    m_sub: int = 8,
    ksub: int = 16,
    seed: int = 42,
    max_fit_rows: int | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Product-quantization ANN with asymmetric distance (ADC) — the
    memory-side scale path of the ANN family (Jégou et al. 2011,
    "Product Quantization for Nearest Neighbor Search"; FAISS's
    ``IndexPQ``): every corpus vector is ENCODED once as ``m_sub``
    small centroid indices (64 float32 dims → 8 bytes, a 32× payload
    cut), and a query scores a candidate WITHOUT decoding — the
    approximate squared distance is the sum over subspaces of the
    distance from the query's subvector to the candidate's chosen
    sub-centroid.

    This operator is the full-scan ADC baseline (rank every encoded
    corpus row per query, exactly the shape of :func:`cosine_topk`
    but over codes instead of vectors); composing it with
    :func:`ivf_ann_topk`'s coarse cells — filter candidates to probed
    cells BEFORE the ADC scan — is the standard IVF-PQ and falls out
    of the same pieces.  Encoding is a JVM-side expression over the
    codebook LITERAL (one plan node, same trick as the IVF
    centroids); no UDF, no join for encoding, and the scan that ranks
    candidates reads ``m_sub`` bytes of code per row instead of the
    vector — at 100 TB of embeddings, that is the difference between
    scanning 3 TB and scanning 100 TB per query batch.

    Determinism contract (the md5-twin recipe of the ANN family):
    seeded per-subspace KMeans on an id-ordered bounded sample,
    argmin ties to the lower code, ADC folds subspaces left-to-right
    and each subspace distance folds dimensions left-to-right — all
    reproducible bit-for-bit by the DuckDB oracle.

    Returns ``(query_id, rank, neighbor_id, adc)`` with ``rank`` by
    ascending approximate squared distance, ties to the smaller
    neighbor id.
    """
    c = _as_double(corpus, vec_col)
    books = _fit_pq_codebooks(
        c, m_sub, ksub, seed, max_fit_rows, vec_col, id_col
    )
    import numpy as np
    import pandas as pd

    from pyspark.sql.types import (
        ArrayType,
        DoubleType,
        IntegerType,
        StructField,
        StructType,
    )

    dsub = len(books[0][0])
    # a sample smaller than ksub yields fewer centroids — the code
    # range must follow the CODEBOOK, not the requested ksub
    # (the _nearest_cells_expr len(centers) rule)
    ksub_actual = len(books[0])
    B = np.array(books, dtype=np.float64)  # (m_sub, ksub, dsub)

    # Encode + ADC as numpy mapInPandas kernels (round 14): the old
    # Catalyst forms — per-row per-subspace array_sort argmin for the
    # codes, per-pair nested aggregate folds for ADC — run through
    # INTERPRETED higher-order functions (CodegenFallback) and
    # dominated the row (~2 s of 2.5 s at sf0.1).  The numpy kernels
    # compute the identical arithmetic: squared-diff terms are
    # elementwise IEEE float64; every fold is strict left-to-right
    # (np.cumsum — see semantic_dedup's exactness note); the encode
    # tie-break (equal distance → lower code) is argmin's first-min
    # rule (NaN→inf masking mirrors array_sort's NaN-last order, an
    # all-NaN subspace keeping code 0 by sort stability); ADC folds
    # subspaces left-to-right over a per-query distance TABLE whose
    # entries are the same deterministic 4-dim folds the old per-pair
    # expression recomputed.  Oracle agreement re-verified at 3 SFs.
    id_dtype = c.schema[id_col].dataType
    enc_schema = StructType(
        [
            StructField("neighbor_id", id_dtype, True),
            StructField("__code", ArrayType(IntegerType()), True),
        ]
    )

    def _encode_np(pdf_iter):
        for pdf in pdf_iter:
            if not len(pdf):
                continue
            X = np.array(pdf["v"].tolist(), dtype=np.float64)
            n = len(X)
            S = X.reshape(n, m_sub, dsub)  # (n, m, dsub)
            diff = S[:, :, None, :] - B[None, :, :, :]  # (n, m, k, dsub)
            d2 = np.cumsum(diff * diff, axis=3)[:, :, :, -1]
            all_nan = np.isnan(d2).all(axis=2)  # (n, m)
            d2 = np.where(np.isnan(d2), np.inf, d2)
            codes = d2.argmin(axis=2).astype(np.int32)  # (n, m)
            codes[all_nan] = 0
            yield pd.DataFrame(
                {
                    "neighbor_id": pdf["id"].to_numpy(),
                    "__code": list(codes),
                }
            )

    enc = c.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v")).mapInPandas(
        _encode_np, enc_schema
    )
    q = _as_double(queries, vec_col).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv")
    )

    adc_schema = StructType(
        [
            StructField("query_id", id_dtype, True),
            StructField("neighbor_id", id_dtype, True),
            StructField("adc", DoubleType(), True),
        ]
    )

    def _adc_np(pdf_iter):
        tables: dict = {}  # query_id -> (m_sub, ksub) distance table
        for pdf in pdf_iter:
            if not len(pdf):
                continue
            out_adc = np.empty(len(pdf), dtype=np.float64)
            codes = np.array(pdf["__code"].tolist(), dtype=np.int64)
            qids = pdf["query_id"].to_numpy()
            for qid in pd.unique(pdf["query_id"]):
                if qid not in tables:
                    qv = np.array(
                        pdf.loc[pdf["query_id"] == qid, "__qv"].iloc[0],
                        dtype=np.float64,
                    ).reshape(m_sub, dsub)
                    dq = qv[:, None, :] - B  # (m, k, dsub)
                    tables[qid] = np.cumsum(dq * dq, axis=2)[:, :, -1]
                tab = tables[qid]
                rows = np.nonzero(qids == qid)[0]
                # per-pair fold: acc(0.0) + d_0 + d_1 + ... left-to-right
                terms = tab[np.arange(m_sub)[None, :], codes[rows]]
                out_adc[rows] = np.cumsum(terms, axis=1)[:, -1]
            yield pd.DataFrame(
                {
                    "query_id": qids,
                    "neighbor_id": pdf["neighbor_id"].to_numpy(),
                    "adc": out_adc,
                }
            )

    scored = (
        enc.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", "__qv", "__code")
        .mapInPandas(_adc_np, adc_schema)
    )
    w = Window.partitionBy("query_id").orderBy(
        F.asc("adc"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", F.round("adc", 6).alias("adc"))
    )


def embedding_neardup_pairs(
    corpus: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 8,
    dim: int = 64,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Corpus near-duplicate pairs (cosine ≥ threshold) with LSH-bucket
    blocking: only same-bucket pairs are scored.  High thresholds map to
    tiny Hamming distance between signatures, so same-bucket blocking
    keeps recall high while cutting the pair space by ~2^n_planes.

    Shape: bucket-GROUPING with (id, vec) structs carried through the
    aggregation — signatures are computed once and shuffled once, and
    in-bucket pairs expand JVM-side.  (A bucket self-join would
    re-evaluate the signature pipeline on both sides and leave the join
    strategy to AQE — the same anti-pattern ``minhash_lsh_pairs``
    documents and avoids.)  Each pair lands in exactly one bucket, so
    no distinct pass is needed.  Σ|bucket|² is the cost knob: size
    ``n_planes`` so expected bucket size stays bounded
    (≈ corpus / 2^n_planes; e.g. 1B vectors want n_planes ≥ ~24, not
    the old default 8)."""
    planes = _hyperplanes(dim, n_planes, seed)
    c = _as_double(corpus, vec_col).select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        _signature(F.col(vec_col), planes).alias("bucket"),
    )
    ids = F.col("ids")
    combos = F.filter(
        F.flatten(
            F.transform(
                ids,
                lambda a: F.transform(
                    ids, lambda b: F.struct(a.alias("x"), b.alias("y"))
                ),
            )
        ),
        lambda p: p["x"]["id"] < p["y"]["id"],
    )
    return (
        c.groupBy("bucket")
        .agg(F.collect_list(F.struct("id", "v")).alias("ids"))
        .filter(F.size("ids") >= 2)
        .select(F.explode(combos).alias("p"))
        .select(
            F.col("p.x.id").alias("id_a"),
            F.col("p.y.id").alias("id_b"),
            cosine(F.col("p.x.v"), F.col("p.y.v")).alias("sim"),
        )
        .filter(F.col("sim") >= threshold)
        .select("id_a", "id_b", F.round("sim", 6).alias("sim"))
    )


def semantic_dedup(
    corpus: DataFrame,
    threshold: float = 0.8,
    n_cells: int = 16,
    seed: int = 42,
    fit_sample: float | None = None,
    max_fit_rows: int | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    max_cell_rows: int | None = 100_000,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning
    at web-scale through semantic deduplication"): cluster embeddings
    with a coarse quantizer, then inside each cluster drop every
    document whose cosine similarity to a LOWER-ID cluster member
    reaches ``threshold`` — semantic near-duplicates that share no
    surface n-grams (paraphrases, translations-of-boilerplate), the
    gap between :func:`embedding_neardup_pairs` (pairs only) and
    lexical dedup.  Keep-lowest-id is the paper's deterministic
    representative rule.

    Composition of existing pieces: the IVF quantizer front end
    (:func:`_fit_cell_centers` — bounded id-ordered fit sample, so the
    whole pipeline is reproducible and DuckDB-oracle-checkable) and the
    grouped in-cell expansion of :func:`embedding_neardup_pairs`, but
    folded to the per-member MINIMUM lower-id witness inside the
    aggregated array — O(|cell|²) cosine evaluations JVM-side with NO
    pair rows materialized and no second shuffle.

    Scale shape: one exchange (the cell groupBy).  ``n_cells`` is THE
    knob — cells must fit a task (the paper runs ~100k clusters at
    web scale; expected |cell| ≈ corpus / n_cells) and in-cell work is
    Σ|cell|² — the same documented contract as
    ``embedding_neardup_pairs``'s Σ|bucket|².  ``max_cell_rows``
    ENFORCES the contract at run time: any cell larger than it fails
    the job with an actionable error instead of silently grinding
    O(|cell|²) or OOM-killing the executor (a skewed quantizer — e.g.
    a zero-vector attractor — concentrates the corpus into one cell;
    the guard turns that into "raise n_cells / re-fit the quantizer /
    pre-split the hot cell by salting ``cell``" rather than a dead
    task).  ``None`` disables the guard.

    Returns one row PER INPUT DOC: (vec_id, cell, dup_of, keep) where
    ``dup_of`` is the smallest qualifying lower-id witness (NULL ⇔
    ``keep``).
    """
    import numpy as np
    import pandas as pd

    from pyspark.sql.types import (
        BooleanType,
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    c = _as_double(corpus, vec_col)
    centers = _fit_cell_centers(
        c, n_cells, seed, fit_sample, max_fit_rows, vec_col, id_col
    )
    # corpus assignment: vectorized numpy kernel, bit-identical to the
    # old element_at(_nearest_cells_expr(...)(v, 1), 1) projection —
    # see _assign_cells_pandas (round 14; the HOF form measured ~1 s
    # of the row's 3.4 s at sf0.1)
    assigned = _assign_cells_pandas(c, centers, id_col, vec_col)

    # In-cell witness fold as a grouped-map numpy kernel (round 14).
    # Same ONE-exchange plan shape as before — Exchange(cell) →
    # FlatMapGroupsInPandas replaces Exchange(cell) → collect_list →
    # in-row HOF fold — but the O(|cell|²·d) cosine work runs through
    # numpy's vectorized float64 kernels instead of Catalyst's
    # INTERPRETED higher-order functions (transform/filter/aggregate
    # are CodegenFallback: per-element lambda dispatch + boxing made
    # this the 3rd most expensive bench row at 2k vectors).  Measured
    # 3.4 s → ~0.9 s at sf0.1; output bit-identical (equality pinned
    # at 3 SFs by tests/test_pipeline_functions.py).
    #
    # Bit-exactness contract with the old expression tree (and the
    # DuckDB oracle): products/squares are elementwise IEEE float64
    # (exact in any order); the fold `aggregate(.., 0.0, acc+v)` is a
    # strict left-to-right sum, reproduced by np.cumsum(...)[-1]
    # (np.add.accumulate is sequential by construction — unlike
    # np.sum/np.dot, whose pairwise/SIMD summation rounds differently);
    # 0.0 + p[0] == p[0] exactly, so the missing leading add is a
    # no-op.  Spark compares NaN as LARGER than any double (a
    # zero-norm or NaN vector yields cosine NaN ≥ threshold = TRUE
    # there), so NaN counts as a witness here too.
    id_dtype = assigned.schema["id"].dataType
    out_schema = StructType(
        [
            StructField("vec_id", id_dtype, True),
            StructField("cell", IntegerType(), True),
            StructField("dup_of", id_dtype, True),
            StructField("keep", BooleanType(), True),
        ]
    )
    thr = float(threshold)
    cap = None if max_cell_rows is None else int(max_cell_rows)

    def _cell_witness(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        if cap is not None and n > cap:
            # same actionable contract as the old in-plan assert_true
            raise ValueError(
                f"semantic_dedup: cell {pdf['cell'].iloc[0]} holds {n} "
                f"vectors > max_cell_rows={cap}; raise n_cells (or "
                "max_cell_rows), or pre-split the hot cell"
            )
        ids = pdf["id"].to_numpy()
        X = np.array(pdf["v"].tolist(), dtype=np.float64)
        # strict left-to-right norms: sqrt(seq-sum(x*x))
        nrm = np.sqrt(np.cumsum(X * X, axis=1)[:, -1])
        order = np.argsort(ids, kind="stable")  # ascending candidate ids
        Xs, ids_s, nrm_s = X[order], ids[order], nrm[order]
        dup_of = np.full(n, -1, dtype=np.int64)
        have = np.zeros(n, dtype=bool)
        # y-blocks bound peak memory at ~blk·n·d float64
        blk = max(1, (1 << 24) // max(1, n * X.shape[1]))
        for lo in range(0, n, blk):
            Y = X[lo : lo + blk]  # (b, d)
            # dot(x, y) with the fold's exact order: cumsum over dims
            prods = Xs[None, :, :] * Y[:, None, :]  # (b, n, d)
            dots = np.cumsum(prods, axis=2)[:, :, -1]
            cos = dots / (nrm_s[None, :] * nrm[lo : lo + blk, None])
            hit = (cos >= thr) | np.isnan(cos)  # NaN ≥ thr in Spark
            hit &= ids_s[None, :] < ids[lo : lo + blk, None]
            any_hit = hit.any(axis=1)
            first = hit.argmax(axis=1)  # ids_s ascending ⇒ min id
            rows = np.nonzero(any_hit)[0]
            dup_of[lo + rows] = ids_s[first[rows]]
            have[lo + rows] = True
        return pd.DataFrame(
            {
                "vec_id": pdf["id"].to_numpy(),
                "cell": pdf["cell"].to_numpy(),
                "dup_of": pd.array(
                    [int(d) if h else None for d, h in zip(dup_of, have)],
                    dtype="Int64",
                ),
                "keep": ~have,
            }
        )

    return assigned.groupBy("cell").applyInPandas(_cell_witness, out_schema)


def kmeans_fixedpoint(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    iters: int = 2,
    scale: int = 10_000,
) -> DataFrame:
    """Distributed Lloyd k-means over an embedding column in FIXED-POINT
    arithmetic — the iterative-algorithm pattern (assign → recenter →
    reassign) expressed as a declarative DataFrame chain, with every
    step bit-reproducible across engines.

    Floating-point Lloyd is NOT portable: centroid means are
    summation-order-dependent, so two engines (or two shuffles) can
    flip an argmin on a near-tie.  Here each vector is quantized once
    to integers (``floor(v · scale)`` — floor, not round: the engines'
    half-way rules differ), distances are exact integer sums of
    squares, centroid updates are exact floor divisions (the
    ``(s - pmod(s, n)) / n`` identity, since ``//`` truncates toward
    zero in both engines), and argmin ties break toward the lower
    cluster id via struct-min ordering.  Initialization is the
    quantized vectors of ids ``0..k-1`` — deterministic, no RNG.

    Semantics: ``iters`` assignment rounds with a recenter between
    consecutive rounds (so ``iters=2`` is assign → update → assign).
    A cluster that captures no vectors in a round simply drops out of
    the next round's centroid set — identically on every engine, and
    documented rather than papered over (k-means++ style reseeding is
    RNG territory).  Returns one row per surviving cluster:
    (cluster, n_vecs, inertia), inertia the exact integer sum of
    squared quantized distances of the final assignment.

    Scale shape per iteration: the ≤ k centroids collapse to ONE
    broadcast row holding the whole centroid array, and assignment is
    an IN-ROW ``array_min`` argmin over that literal-like array — no
    per-candidate row expansion, no aggregate keyed on the vector id,
    NO corpus-sized exchange anywhere.  The only shuffles are the
    (cluster, dim) recenter aggregation (map-side partial aggregation
    reduces each partition to ≤ k·d cells before the exchange) and
    the final ≤ k-row stats aggregate.  That is the canonical
    1000-executor k-means plan; ``iters`` is a small constant so
    lineage stays shallow (no checkpoint needed).

    Overflow rails: |coord| ≤ C after quantization gives per-row
    distance ≤ d·(2C)² and corpus inertia ≤ N·d·(2C)² — with C ~ 10⁴,
    d = 64, that holds to N ~ 10⁹ rows per int64; raise ``scale``
    only with the rail in mind.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    q = _as_double(df, vec_col).select(
        F.col(id_col).cast("long").alias("vid"),
        _quantize_fixed(F.col(vec_col), scale).alias("q"),
    )
    cent = q.filter(F.col("vid") < k).select(
        F.col("vid").alias("cluster"), F.col("q").alias("c")
    )

    def _sq_int(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        )

    assigned = None
    for it in range(iters):
        # all centroids as ONE broadcast row; argmin is an in-row
        # array_min over (d, cluster) structs — lexicographic struct
        # ordering gives the distance-then-lowest-cluster tie-break.
        cents_row = cent.agg(F.collect_list(F.struct("cluster", "c")).alias("cents"))
        best = F.array_min(
            F.transform(
                "cents",
                lambda ct: F.struct(
                    _sq_int(F.col("q"), ct["c"]).alias("d"),
                    ct["cluster"].alias("cluster"),
                ),
            )
        )
        # Stage the argmin once, THEN guard: dc is NULL exactly when
        # the centroid set is empty — no id in 0..k-1 existed (the
        # init contract) — and the staged projection keeps the guard
        # from duplicating the fold per row.  Fail loudly in-plan
        # instead of emitting one NULL-cluster garbage row.
        assigned = (
            q.crossJoin(F.broadcast(cents_row))
            .select("vid", "q", best.alias("dc"))
            .select(
                "vid",
                "q",
                F.when(
                    F.col("dc").isNull(),
                    F.raise_error(
                        "kmeans_fixedpoint: empty centroid set — the "
                        f"deterministic init takes ids 0..k-1 ({id_col} < "
                        f"{k}) and none exist in the input"
                    ),
                )
                .otherwise(F.col("dc"))
                .alias("dc"),
            )
        )
        if it < iters - 1:
            sums = (
                assigned.select(
                    F.col("dc.cluster").alias("cluster"),
                    F.posexplode(F.col("q")).alias("dim", "val"),
                )
                .groupBy("cluster", "dim")
                .agg(F.sum("val").alias("s"), F.count(F.lit(1)).alias("n"))
            )
            cent = (
                sums.withColumn(
                    "cv",
                    ((F.col("s") - F.pmod("s", "n")) / F.col("n")).cast("long"),
                )
                .groupBy("cluster")
                .agg(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("dim", "cv"))),
                        lambda t: t["cv"],
                    ).alias("c")
                )
            )
    return assigned.groupBy(F.col("dc.cluster").alias("cluster")).agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.sum(F.col("dc.d")).alias("inertia"),
    )


def random_projection_int(
    df: DataFrame,
    out_dim: int = 16,
    dim: int = 64,
    scale_vec: int = 10_000,
    scale_plane: int = 1_000,
    seed: int = 7,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Johnson–Lindenstrauss random projection in INTEGER arithmetic —
    embedding compression (``dim`` → ``out_dim``) as an exact,
    engine-portable projection: the Gaussian planes are the
    deterministic ``_hyperplanes`` set quantized to integers
    (``floor(x·scale_plane)``), vectors quantize like the rest of the
    fixed-point family (``floor(v·scale_vec)`` — floor, because the
    engines' half-way rules differ), and each output coordinate is an
    exact integer dot product.  Distance ORDER is approximately
    preserved per JL (property-tested via rank correlation); the
    VALUES are exactly reproducible anywhere, which float projections
    are not.

    Output is LONG format — (id, dim, proj), one row per output
    coordinate — so the exact integers survive any engine's hashing
    of scalar columns (an array column would ride engine-specific
    array semantics).

    Scale shape: a pure per-row codegen projection (the 16 dot
    products inline as literal-array ``zip_with`` folds) followed by
    ``posexplode`` — ZERO exchanges, scales with the scan.  Overflow
    rail: |proj| ≤ dim·scale_vec·scale_plane·max|v|·max|g| — with the
    defaults and unit-ish embeddings, ~10⁹, five orders inside int64.
    """
    if out_dim < 1:
        raise ValueError(f"out_dim must be >= 1, got {out_dim}")
    planes = _hyperplanes(dim, out_dim, seed)
    iplanes = [[math.floor(x * scale_plane) for x in p] for p in planes]
    q = _quantize_fixed(F.col(vec_col).cast("array<double>"), scale_vec)
    staged = df.select(F.col(id_col).alias("id"), q.alias("__q"))
    # zip_with NULL-pads a length mismatch and a NULL vector folds to
    # NULL projections — fail loudly in-plan instead (the
    # kmeans_fixedpoint guard discipline); staged projection so the
    # guard doesn't duplicate the quantize transform per use.
    staged = staged.select(
        "id",
        F.when(
            F.col("__q").isNull() | (F.size("__q") != dim),
            F.raise_error(
                f"random_projection_int: embedding must be a non-NULL "
                f"{dim}-element array (got a NULL or mis-sized vector)"
            ),
        )
        .otherwise(F.col("__q"))
        .alias("__q"),
    )

    def _proj(plane: list[int]):
        return F.aggregate(
            F.zip_with(F.col("__q"), F.lit(plane), lambda a, b: a * b),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        )

    return staged.select(
        "id",
        F.posexplode(F.array(*[_proj(p) for p in iplanes])).alias("dim", "proj"),
    ).select(F.col("id").alias(id_col), F.col("dim").cast("long").alias("dim"), "proj")

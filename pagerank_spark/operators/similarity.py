"""Similarity search over embedding columns (``array<float>``).

- :func:`cosine_topk_bruteforce` — exact top-k neighbors for a query vector:
  one scan, cosine as a JVM expression (functions/vectors.py), top-k via
  orderBy+limit. The correctness baseline.
- :func:`cosine_topk_pandas` — the same scan with the dot product computed
  in a Pandas UDF over NumPy matrix ops (one GEMV per Arrow batch). Faster
  per row at wide dimensions; identical results (modulo fp assoc order —
  both are reduced in index order).
- :func:`lsh_bucketed_topk` — the scale path: random-hyperplane LSH
  signatures bucket the corpus; the query probes only its bucket (plus
  multiprobe neighbors), turning a full scan into a partition-pruned scan.
  Approximate by design; recall measured in tests.
- :func:`ivf_topk` / :func:`ivf_assignments` — IVF-style ANN: a coarse
  quantizer (hash-seeded centroids + one distributed Lloyd refinement)
  assigns each vector to an inverted list; queries probe only the nprobe
  nearest lists. The alternative scale path to hyperplane LSH — lists map
  to table partitions, probing maps to partition pruning.
- :func:`cosine_near_dup_pairs` — embedding near-dup detection: all pairs
  above a cosine threshold among LSH-bucket candidates.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.pandas.functions import pandas_udf

from ..functions.vectors import cosine


def _query_vec(emb: DataFrame, query_id: int, id_col: str, vec_col: str) -> list[float]:
    row = emb.filter(F.col(id_col) == query_id).select(vec_col).first()
    if row is None:
        raise KeyError(f"query id {query_id} not found")
    return [float(x) for x in row[0]]


def cosine_topk_bruteforce(
    emb: DataFrame, query_id: int, k: int = 10, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Exact top-k ``(vec_id, sim)`` by cosine to the query vector (excluded).

    The query vector folds into the plan as a literal array — broadcast by
    value, no join. orderBy+limit compiles to TakeOrderedAndProject (a
    per-partition top-k + driver merge, not a global sort).
    """
    q = _query_vec(emb, query_id, id_col, vec_col)
    qcol = F.array(*[F.lit(float(x)).cast("float") for x in q])
    return (
        emb.filter(F.col(id_col) != query_id)
        .select(F.col(id_col).alias("vec_id"), cosine(F.col(vec_col), qcol).alias("sim"))
        .orderBy(F.desc("sim"), F.asc("vec_id"))
        .limit(k)
    )


def cosine_topk_pandas(
    emb: DataFrame, query_id: int, k: int = 10, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Same result as brute force; cosine computed as NumPy GEMV per batch."""
    q = np.asarray(_query_vec(emb, query_id, id_col, vec_col), dtype=np.float64)
    qn = np.linalg.norm(q)

    @pandas_udf("double")
    def sim_udf(vecs: pd.Series) -> pd.Series:
        mat = np.vstack(vecs.to_numpy()).astype(np.float64)
        norms = np.linalg.norm(mat, axis=1) * qn
        norms[norms == 0] = np.inf
        return pd.Series(mat @ q / norms)

    return (
        emb.filter(F.col(id_col) != query_id)
        .select(F.col(id_col).alias("vec_id"), sim_udf(F.col(vec_col)).alias("sim"))
        .orderBy(F.desc("sim"), F.asc("vec_id"))
        .limit(k)
    )


def hyperplane_signatures(
    emb: DataFrame, n_planes: int = 16, seed: int = 5, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """``(vec_id, bucket int)`` — sign pattern against random hyperplanes."""
    dim = len(emb.select(vec_col).first()[0])
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim))

    @pandas_udf("int")
    def bucket_udf(vecs: pd.Series) -> pd.Series:
        mat = np.vstack(vecs.to_numpy()).astype(np.float64)
        bits = (mat @ planes.T) > 0
        vals = (bits * (1 << np.arange(n_planes))).sum(axis=1)
        return pd.Series(vals.astype(np.int32))

    return emb.select(F.col(id_col).alias("vec_id"), bucket_udf(F.col(vec_col)).alias("bucket"))


def lsh_bucketed_topk(
    emb: DataFrame, query_id: int, k: int = 10, n_planes: int = 8, seed: int = 5,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: score only vectors in the query's LSH bucket or a
    1-bit-flip neighbor bucket (multiprobe). At scale, ``bucket`` becomes the
    table partition key and this is a partition-pruned scan."""
    sigs = hyperplane_signatures(emb, n_planes, seed, id_col, vec_col)
    qrow = sigs.filter(F.col("vec_id") == query_id).first()
    qb = int(qrow["bucket"])
    probe = [qb] + [qb ^ (1 << i) for i in range(n_planes)]
    cand_ids = sigs.filter(F.col("bucket").isin(probe)).select("vec_id")
    cand = emb.join(cand_ids, emb[id_col] == cand_ids.vec_id, "left_semi")
    return cosine_topk_bruteforce(cand, query_id, k, id_col, vec_col)


def ivf_assignments(
    emb: DataFrame, n_centroids: int = 16, seed: int = 7,
    id_col: str = "vec_id", vec_col: str = "embedding",
    lloyd_iters: int = 1,
) -> tuple[DataFrame, np.ndarray]:
    """IVF coarse quantizer: ``((vec_id, list int), centroids)``.

    Centroids are a deterministic hash-spread sample of the corpus refined
    by ``lloyd_iters`` distributed Lloyd iterations (assign, then centroid
    <- mean of assigned vectors via ``groupBy.avg`` over exploded
    components — no driver-side corpus; driver traffic per iteration is
    ``n_centroids * dim`` numbers). One iteration is the cheap default;
    a production index trains 3-10 on a corpus sample until assignment
    churn stops — the loop below IS that trainer, callers pick the budget.
    Each vector lands in the inverted list of its nearest centroid; at
    scale ``list`` is the table partition key, so a query scans only its
    probed lists (the IVF analogue of partition pruning).
    """
    # seed centroids: the n_centroids vectors with smallest xxhash64(id) —
    # a deterministic uniform sample independent of id distribution
    sample = (
        emb.select(id_col, vec_col, F.xxhash64(F.col(id_col), F.lit(seed)).alias("__h"))
        .orderBy("__h")
        .limit(n_centroids)
        .collect()
    )
    cents = np.array([[float(x) for x in r[vec_col]] for r in sample], dtype=np.float64)

    def assign(c: np.ndarray):
        cn = c / np.maximum(np.linalg.norm(c, axis=1, keepdims=True), 1e-12)

        @pandas_udf("int")
        def assign_udf(vecs: pd.Series) -> pd.Series:
            mat = np.vstack(vecs.to_numpy()).astype(np.float64)
            mn = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
            return pd.Series(np.argmax(mn @ cn.T, axis=1).astype(np.int32))

        return emb.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("__v"),
                          assign_udf(F.col(vec_col)).alias("list"))

    # Lloyd refinement(s): new centroid = mean of assigned vectors; empty
    # lists keep their previous centroid (the standard k-means convention)
    if lloyd_iters < 0:
        raise ValueError("lloyd_iters must be >= 0")
    dim = cents.shape[1]
    refined = cents
    for _ in range(int(lloyd_iters)):
        a0 = assign(refined)
        comp = a0.select("list", F.posexplode(F.col("__v")).alias("pos", "val"))
        means = comp.groupBy("list", "pos").agg(F.avg("val").alias("m")).collect()
        refined = refined.copy()
        acc: dict[int, np.ndarray] = {}
        for r in means:
            acc.setdefault(int(r["list"]), np.zeros(dim))[int(r["pos"])] = float(r["m"])
        for li, vec in acc.items():
            refined[li] = vec
    return assign(refined).select("vec_id", "list"), refined


def ivf_topk(
    emb: DataFrame, query_id: int, k: int = 10, n_centroids: int = 16, nprobe: int = 4,
    seed: int = 7, id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k via IVF: score only vectors whose inverted list is
    among the ``nprobe`` centroids nearest the query. The 100-TB shape:
    lists are partition keys, probing = partition pruning; recall/cost is
    tuned by (n_centroids, nprobe)."""
    assignments, cents = ivf_assignments(emb, n_centroids, seed, id_col, vec_col)
    q = np.asarray(_query_vec(emb, query_id, id_col, vec_col), dtype=np.float64)
    qn = q / max(np.linalg.norm(q), 1e-12)
    cn = cents / np.maximum(np.linalg.norm(cents, axis=1, keepdims=True), 1e-12)
    probe = [int(i) for i in np.argsort(-(cn @ qn))[:nprobe]]
    cand_ids = assignments.filter(F.col("list").isin(probe)).select("vec_id")
    cand = emb.join(cand_ids, emb[id_col] == cand_ids.vec_id, "left_semi")
    return cosine_topk_bruteforce(cand, query_id, k, id_col, vec_col)


def cosine_near_dup_pairs(
    emb: DataFrame, threshold: float = 0.95, n_planes: int = 12, seed: int = 5,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """``(a, b, sim)`` pairs with cosine >= threshold among same-bucket
    candidates (embedding near-dup detection).

    The signature table is joined on BOTH sides of the bucket self-join, so
    it is materialized once (eager ``localCheckpoint`` — tiny: id + int
    bucket) and the hyperplane pandas UDF scans the corpus exactly once.
    """
    sigs = (
        hyperplane_signatures(emb, n_planes, seed, id_col, vec_col)
        .withColumnRenamed("vec_id", "__sig_id")
        .localCheckpoint()
    )
    ea = emb.join(sigs, emb[id_col] == F.col("__sig_id")).select(
        F.col(id_col).alias("a"), F.col(vec_col).alias("va"), "bucket"
    )
    eb = emb.join(sigs, emb[id_col] == F.col("__sig_id")).select(
        F.col(id_col).alias("b"), F.col(vec_col).alias("vb"), "bucket"
    )
    pairs = ea.join(eb, "bucket").filter(F.col("a") < F.col("b"))
    return (
        pairs.select("a", "b", cosine(F.col("va"), F.col("vb")).alias("sim"))
        .filter(F.col("sim") >= threshold)
        .dropDuplicates(["a", "b"])
    )


# -- product quantization ---------------------------------------------------


def pq_codebooks(
    emb: DataFrame, n_sub: int = 4, n_codes: int = 16, seed: int = 13,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> np.ndarray:
    """Train PQ codebooks: split the vector into ``n_sub`` contiguous
    subspaces; per subspace, seed ``n_codes`` codewords from a
    deterministic hash-spread sample and refine with ONE distributed Lloyd
    step (grouped mean over exploded components — no driver-side corpus).
    Returns ``(n_sub, n_codes, sub_dim)`` float64.

    PQ is the memory-side scale lever the inverted lists (ivf_*) don't
    give: codes are n_sub bytes per vector, so a 100-TB float corpus scans
    as a ~100x smaller code table under ADC.
    """
    sample = (
        emb.select(vec_col, F.xxhash64(F.col(id_col), F.lit(seed)).alias("__h"))
        .orderBy("__h")
        .limit(n_codes)
        .collect()
    )
    init = np.array([[float(x) for x in r[vec_col]] for r in sample], dtype=np.float64)
    dim = init.shape[1]
    if dim % n_sub != 0:
        raise ValueError(f"dim {dim} not divisible by n_sub {n_sub}")
    sub_dim = dim // n_sub
    books = init.reshape(n_codes, n_sub, sub_dim).transpose(1, 0, 2).copy()

    codes0 = pq_encode(emb, books, id_col, vec_col)
    # one Lloyd step per subspace: codeword <- mean of assigned sub-vectors
    comp = codes0.join(emb.select(F.col(id_col).alias("vec_id"), vec_col), "vec_id").select(
        F.posexplode(F.col(vec_col).cast("array<double>")).alias("pos", "val"),
        F.col("codes"),
    ).select(
        (F.col("pos") / sub_dim).cast("int").alias("sub"),
        F.pmod(F.col("pos"), F.lit(sub_dim)).alias("subpos"),
        F.col("val"),
        F.element_at(F.col("codes"), (F.col("pos") / sub_dim).cast("int") + 1).alias("code"),
    )
    means = comp.groupBy("sub", "code", "subpos").agg(F.avg("val").alias("m")).collect()
    refined = books.copy()
    for r in means:
        refined[int(r["sub"]), int(r["code"]), int(r["subpos"])] = float(r["m"])
    return refined


def pq_encode(
    emb: DataFrame, codebooks: np.ndarray,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """``(vec_id, codes array<int>)`` — per subspace, the L2-nearest
    codeword index. Arrow-batched NumPy kernel (one distance matrix per
    subspace per batch); the codebooks (n_sub x n_codes x sub_dim) ride the
    UDF closure — kilobytes, the PQ analogue of a broadcast dim table."""
    n_sub, _, sub_dim = codebooks.shape
    cb = codebooks.copy()

    @pandas_udf("array<int>")
    def encode_udf(vecs: pd.Series) -> pd.Series:
        mat = np.vstack(vecs.to_numpy()).astype(np.float64)
        out = np.empty((mat.shape[0], n_sub), dtype=np.int32)
        for s in range(n_sub):
            sub = mat[:, s * sub_dim:(s + 1) * sub_dim]
            # ||x - c||^2 = ||x||^2 - 2 x.c + ||c||^2 ; ||x||^2 constant per row
            d = -2.0 * (sub @ cb[s].T) + (cb[s] ** 2).sum(axis=1)[None, :]
            out[:, s] = np.argmin(d, axis=1)
        return pd.Series(list(out))

    return emb.select(F.col(id_col).alias("vec_id"), encode_udf(F.col(vec_col)).alias("codes"))


def pq_topk(
    emb: DataFrame, query_id: int, k: int = 10, n_sub: int = 4, n_codes: int = 16,
    seed: int = 13, id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Approximate inner-product top-k via asymmetric distance computation:
    the query builds an (n_sub x n_codes) dot-product lookup table against
    the codebooks, and every corpus vector is scored as the SUM of n_sub
    table lookups over its byte codes — the scan never touches the float
    vectors. Returns ``(vec_id, score)``, score descending."""
    books = pq_codebooks(emb, n_sub, n_codes, seed, id_col, vec_col)
    n_sub_, _, sub_dim = books.shape
    q = np.asarray(_query_vec(emb, query_id, id_col, vec_col), dtype=np.float64)
    lut = np.stack([books[s] @ q[s * sub_dim:(s + 1) * sub_dim] for s in range(n_sub_)])

    codes = pq_encode(emb, books, id_col, vec_col)

    @pandas_udf("double")
    def adc_udf(code_col: pd.Series) -> pd.Series:
        c = np.vstack(code_col.to_numpy()).astype(np.int64)
        return pd.Series(lut[np.arange(n_sub_)[None, :], c].sum(axis=1))

    scored = codes.filter(F.col("vec_id") != query_id).select(
        "vec_id", adc_udf(F.col("codes")).alias("score")
    )
    return scored.orderBy(F.col("score").desc(), F.col("vec_id")).limit(k)


def knn_graph(
    emb: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1024,
) -> DataFrame:
    """Exact k-nearest-neighbor graph by cosine over grid-quantized
    vectors: every vector's top-k neighbors, the all-pairs extension of
    :func:`cosine_topk_bruteforce` (which serves one query).

    Vectors snap to ``round(x*scale)`` BIGINT, so dot products and squared
    norms are EXACT integers (one zip_with/aggregate lambda each, norms
    computed once per vector and carried through the join); the cosine is
    a fixed correctly-rounded IEEE sequence over those integers —
    engine-reproducible, ties broken by neighbor id.

    Scale shape: the self-join is the brute-force N^2 BASELINE, correct at
    any dimension and the right choice up to ~10^5 vectors per blocking
    key; beyond that the bucketed paths (hyperplane LSH / IVF inverted
    lists in this module) generate candidates and THIS operator's scoring
    applies within buckets. Zero-norm vectors match nothing and are
    matched by nothing (cosine undefined).

    Returns ``(vec_id, neighbor, rank, cos)`` — k rows per vector.
    """
    from pyspark.sql import Window

    from .clustering import quantize_vectors

    q = quantize_vectors(emb, scale, vec_col, "__qv").withColumn(
        "__n2", F.expr("aggregate(transform(__qv, x -> x * x), 0L, (s, v) -> s + v)")
    ).where(F.col("__n2") > 0)
    a = q.select(F.col(id_col).alias("__a"), F.col("__qv").alias("__qa"), F.col("__n2").alias("__na"))
    b = q.select(F.col(id_col).alias("__b"), F.col("__qv").alias("__qb"), F.col("__n2").alias("__nb"))
    pairs = a.join(b, F.col("__a") != F.col("__b"))
    cos = F.expr(
        "CAST(aggregate(zip_with(__qa, __qb, (x, y) -> x * y), 0L, (s, v) -> s + v) AS DOUBLE)"
        " / (sqrt(CAST(__na AS DOUBLE)) * sqrt(CAST(__nb AS DOUBLE)))"
    )
    scored = pairs.select(
        F.col("__a").alias(id_col), F.col("__b").alias("neighbor"), cos.alias("cos")
    )
    w = Window.partitionBy(id_col).orderBy(F.col("cos").desc(), F.col("neighbor").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= int(k))
        .select(id_col, "neighbor", "rank", "cos")
    )


def mutual_knn(emb: DataFrame, k: int = 3, id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Reciprocal nearest neighbors: pairs where EACH vector is in the
    other's cosine top-k (the high-precision candidate filter used by
    RNN-based clustering and cross-encoder dedup). One self-join of the
    :func:`knn_graph` edge list on the reversed pair; emitted once per
    unordered pair (a < b) with both ranks. Same exact-integer cosine
    discipline as knn_graph — no new float surface."""
    g = knn_graph(emb, k=k, id_col=id_col, vec_col=vec_col)
    a = g.select(
        F.col(id_col).alias("a"), F.col("neighbor").alias("b"),
        F.col("rank").alias("rank_ab"), F.col("cos").alias("cos_ab"),
    )
    b = g.select(
        F.col(id_col).alias("b2"), F.col("neighbor").alias("a2"),
        F.col("rank").alias("rank_ba"),
    )
    return (
        a.join(b, (F.col("a") == F.col("a2")) & (F.col("b") == F.col("b2")))
        .where(F.col("a") < F.col("b"))
        .select("a", "b", "rank_ab", "rank_ba", F.round("cos_ab", 6).alias("cos"))
    )


def hubness(
    emb: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Reverse-kNN in-degree histogram — the hubness diagnostic for an
    embedding space (Radovanovic et al. 2010): in high dimension a few
    "hub" vectors appear in everyone's top-k while "antihubs" appear in
    nobody's, which silently degrades ANN retrieval and kNN-based dedup.
    The distribution of N_k (how many vectors count v among their k
    nearest) is THE screen to run before trusting the kNN graph.

    Built on :func:`knn_graph`'s exact integer-quantized cosine kNN
    (same N^2-baseline / bucketed-at-scale contract): one grouped count of
    incoming edges, a left join back to the vector set (antihubs = zero),
    one histogram aggregate. Returns ``(n_rknn, n_vectors)`` — exact
    integers, rows sum to the number of non-zero-norm vectors.
    """
    g = knn_graph(emb, k=k, id_col=id_col, vec_col=vec_col)
    indeg = g.groupBy(F.col("neighbor").alias("__id")).agg(
        F.count(F.lit(1)).alias("n_rknn")
    )
    allv = g.select(F.col(id_col).alias("__id")).dropDuplicates()
    per = allv.join(indeg, "__id", "left").select(
        F.coalesce(F.col("n_rknn"), F.lit(0)).cast("long").alias("n_rknn")
    )
    return per.groupBy("n_rknn").agg(F.count(F.lit(1)).alias("n_vectors"))


def isotropy(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1_000_000,
) -> DataFrame:
    """Embedding isotropy diagnostic — the mean pairwise cosine of the
    corpus (Ethayarajh 2019; representation-collapse screens — public
    methodology): anisotropic ("collapsed") embedding spaces have mean
    cosine far above 0, which silently breaks cosine thresholds in dedup
    and retrieval. Computed WITHOUT the N^2 pair join via the sum-vector
    identity over unit vectors:

        sum_{i != j} <u_i, u_j> = ||sum_i u_i||^2 - n

    Each vector is L2-normalized (one correctly-rounded SQRT per vector)
    and its components are scaled to the 1e6 integer grid ONCE — after
    that the component sums, the squared norm of the sum vector, and the
    pair mean are exact BIGINT arithmetic (zero-norm vectors dropped, the
    knn contract). One scan, one component aggregation (D rows), one
    closed-form row out: ``(n, dim, mean_cos_micro)`` with
    ``mean_cos = (||S||^2 - n*scale^2) / (n*(n-1)*scale^2)`` emitted via
    a single double division, micro-rounded once.
    """
    q = emb.select(
        F.col(id_col),
        F.expr(
            f"transform({vec_col}, x -> CAST(x AS DOUBLE))"
        ).alias("__v"),
    ).withColumn(
        "__n2",
        F.expr("aggregate(__v, CAST(0.0 AS DOUBLE), (a, x) -> a + x * x)"),
    ).filter(F.col("__n2") > 0)
    # the IF guard keeps ANSI division happy even if Catalyst evaluates
    # the projection alongside the __n2 > 0 filter (zero rows are dropped
    # either way)
    qn = q.select(
        F.expr(
            "transform(__v, x -> IF(__n2 > 0,"
            f" CAST(ROUND(x / SQRT(__n2) * {int(scale)}.0) AS BIGINT),"
            " CAST(0 AS BIGINT)))"
        ).alias("__u")
    )
    comp = qn.select(F.posexplode(F.col("__u")).alias("pos", "val"))
    sums = comp.groupBy("pos").agg(F.sum("val").alias("s"))
    # sum of squared quantized norms computed EXACTLY (quantization keeps
    # each ||q_i||^2 near scale^2 but not equal — never approximate it)
    sq = qn.agg(
        F.count(F.lit(1)).alias("n"),
        F.expr(
            "SUM(CAST(aggregate(__u, CAST(0 AS BIGINT), (a, x) -> a + x * x)"
            " AS DECIMAL(38, 0)))"
        ).alias("sq"),
    )
    # DECIMAL(38) keeps the squared sums exact far past BIGINT (the bm25
    # HUGEINT rule): ||S||^2 grows as (n * scale)^2
    agg = sums.agg(
        F.expr("SUM(CAST(s AS DECIMAL(38, 0)) * s)").alias("ss"),
        F.count(F.lit(1)).alias("dim"),
    ).crossJoin(sq)
    sc2 = int(scale) * int(scale)
    return agg.select(
        F.col("n").cast("long").alias("n"),
        F.col("dim").cast("long").alias("dim"),
        F.expr(
            f"CASE WHEN n >= 2 THEN CAST(ROUND((CAST(ss AS DOUBLE)"
            f" - CAST(sq AS DOUBLE))"
            f" / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0) * {sc2}.0)"
            " * 1000000.0) AS BIGINT) ELSE CAST(0 AS BIGINT) END"
        ).alias("mean_cos_micro"),
    )

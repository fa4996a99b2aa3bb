"""Deterministic distributed clustering over embedding columns.

- :func:`quantize_vectors` — snap ``array<float/double>`` embeddings onto an
  integer grid (``round(x * scale)`` as BIGINT). Integer vectors make every
  downstream sum/dot/distance order-independent and therefore exactly
  reproducible across partitionings, reruns, AND engines — the property the
  float paths cannot give (fp addition is not associative, so a plain
  ``F.avg`` centroid differs run-to-run under shuffle). The grid is the
  documented precision contract: scale=1024 keeps ~3 decimal digits.
- :func:`kmeans_assign` — Lloyd's k-means with grid-snapped centroids:
  distances, argmin, and centroid sums are all exact BIGINT arithmetic, and
  the centroid mean is snapped back to the grid with round-half-up
  (``floor(sum/count + 0.5)``), so the whole fixpoint is deterministic and
  SQL-replayable (the ``kmeans_embeddings`` gate unrolls it in DuckDB).
  Per iteration: ONE scan computing k codegen'd distance expressions (no
  UDF, no per-row Python), one posexplode + groupBy(cluster, pos) hash agg
  for the update, and a k*D-row collect — driver traffic is k*D values per
  iteration, independent of corpus size. At 100 TB this is the textbook
  broadcast-Lloyd: centroids ride into the plan as literals (broadcast by
  value), the assign scan is embarrassingly parallel, and the update is one
  map-side-combined shuffle of k*D partial sums per partition.
- :func:`semdedup` — SemDeDup-style embedding near-dup pruning (Abbas et
  al. 2023, arXiv:2303.09540): within each cluster, drop every vector whose
  cosine similarity to a LOWER-id member meets the threshold (keep-first
  rule — deterministic, no RNG). The cosine test runs entirely in integer
  arithmetic on the quantized grid: ``cos(a,b) >= n/d`` is decided as
  ``dot > 0 AND d^2*dot^2 >= n^2*|a|^2*|b|^2`` — exact, no sqrt, no
  floats, hash-stable in the gate. The self-join is per-cluster (never
  all-pairs); pair the cluster column with a bounded clustering (k-means
  above) so the widest cluster bounds the join, and cap pathological
  clusters the same way the LSH buckets are capped
  (operators/dedup.py:_capped_bucket_pairs) if a degenerate corpus
  concentrates mass in one cluster.

Reference parity: the reference engine has no clustering operator; this is
part of the LLM-training-pipeline mandate (SemDeDup is the embedding-space
sibling of the MinHash/SimHash text dedup family in operators/dedup.py).

Overflow contract (int64): with ``scale`` s and per-component magnitude
``m``, quantized components are bounded by q = s*m+1; dot products by
D*q^2; the semdedup cross-multiplication by d^2*(D*q^2)^2. The defaults
(scale=128, D<=64, m<=1, n/d<=99/100) keep that under 2^63 with ~100x
headroom; :func:`semdedup` asserts the bound at plan-build time.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def quantize_vectors(
    emb: DataFrame, scale: int = 1024, vec_col: str = "embedding", out_col: str = "qvec"
) -> DataFrame:
    """Add ``out_col``: the vector snapped to the integer grid ``round(x*scale)``.

    round-half-up via floor(x*scale + 0.5) — one deterministic fp op per
    component, then exact integers everywhere downstream.
    """
    return emb.withColumn(
        out_col,
        F.transform(
            F.col(vec_col),
            lambda x: F.floor(x.cast("double") * F.lit(float(scale)) + F.lit(0.5)).cast("long"),
        ),
    )


def _sq_dist(qvec_col, centroid: list[int]):
    """Exact integer squared L2 distance from ``qvec_col`` to a literal centroid."""
    lit = F.array(*[F.lit(int(c)).cast("long") for c in centroid])
    return F.aggregate(
        F.zip_with(qvec_col, lit, lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def _assign_expr(qvec_col, centroids: list[list[int]]):
    """Cluster id = argmin of the k distance expressions (first min wins —
    ties break to the lowest cluster index, same rule the SQL oracle uses)."""
    dists = F.array(*[_sq_dist(qvec_col, c) for c in centroids])
    return (F.array_position(dists, F.array_min(dists)) - 1).cast("int")


def kmeans_assign(
    emb: DataFrame,
    k: int,
    iters: int = 2,
    init_ids: list[int] | None = None,
    scale: int = 1024,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, list[list[int]]]:
    """Deterministic grid-snapped Lloyd k-means.

    ``init_ids`` (default ``[0..k-1]``) name the vectors whose quantized
    values seed the centroids — an explicit, replayable init (the
    hash-seeded sampling used by ivf_assignments is the alternative when no
    canonical ids exist). Runs ``iters`` update rounds, then returns
    ``(assignments, centroids)`` where assignments is ``(id_col, cluster)``
    under the FINAL centroids and centroids is the k x D grid-integer list.

    Empty clusters keep their previous centroid (standard Lloyd fallback,
    deterministic).
    """
    if init_ids is None:
        init_ids = list(range(k))
    if len(init_ids) != k:
        raise ValueError(f"need exactly k={k} init ids, got {len(init_ids)}")

    q = quantize_vectors(emb, scale=scale, vec_col=vec_col).select(id_col, "qvec")
    # one tiny collect for the seeds (k rows)
    seed_rows = {r[0]: list(r[1]) for r in q.filter(F.col(id_col).isin(init_ids)).collect()}
    missing = [i for i in init_ids if i not in seed_rows]
    if missing:
        raise KeyError(f"init ids not found: {missing}")
    centroids = [seed_rows[i] for i in init_ids]

    # iterate: the corpus-side work per round is one assign scan + one
    # map-side-combined (cluster, pos) sum; only k*D aggregated values ever
    # reach the driver. localCheckpoint is unnecessary — each round's plan
    # hangs off the same quantized scan, no iterative lineage growth.
    q = q.persist()
    try:
        for _ in range(iters):
            # cluster BEFORE exploding — the k distance expressions run once
            # per vector, not once per (vector, dimension)
            assigned = q.withColumn(
                "cluster", _assign_expr(F.col("qvec"), centroids)
            ).select("cluster", F.posexplode("qvec").alias("pos", "qv"))
            rows = (
                assigned.groupBy("cluster", "pos")
                .agg(F.sum("qv").alias("s"), F.count(F.lit(1)).alias("c"))
                .collect()
            )
            new_c = [list(c) for c in centroids]  # empty-cluster fallback
            for r in rows:
                # grid snap: round-half-up on the exact integer ratio — the
                # single fp division is deterministic (same two ints -> same
                # double on every engine)
                new_c[r["cluster"]][r["pos"]] = int(math.floor(r["s"] / r["c"] + 0.5))
            centroids = new_c
        out = q.select(
            F.col(id_col), _assign_expr(F.col("qvec"), centroids).alias("cluster")
        )
        # the assignment plan only references literals + the persisted scan;
        # materialization is the caller's (one action, no loop state left)
        return out, centroids
    finally:
        # persist handle stays alive for the returned plan; Spark unpersists
        # with the session. Callers looping many kmeans runs should
        # .unpersist() via the returned DataFrame's lineage if needed.
        pass


def semdedup(
    emb: DataFrame,
    cluster_col: str = "cluster",
    threshold_num: int = 7,
    threshold_den: int = 20,
    scale: int = 128,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_component: float = 1.0,
) -> DataFrame:
    """SemDeDup keep-first pruning: ``(id_col, cluster, kept)`` with kept=0
    iff some SAME-CLUSTER vector with a smaller id has
    ``cos >= threshold_num/threshold_den`` on the quantized grid.

    The whole decision is int64 arithmetic (see module docstring); the
    ``semdedup_embeddings`` gate replays it verbatim in DuckDB. The
    self-join is equi-keyed on the cluster column, so the widest cluster —
    not the corpus — bounds the work.
    """
    d = int(emb.select(F.size(vec_col)).first()[0])
    qmax = scale * max_component + 1
    worst = (threshold_den**2) * (d * qmax * qmax) ** 2
    if worst >= 2**63:
        raise ValueError(
            f"int64 overflow risk: scale={scale}, D={d}, max_component={max_component} "
            f"(worst-case {worst:.3g} >= 2^63); lower scale or threshold_den"
        )

    q = quantize_vectors(emb, scale=scale, vec_col=vec_col).select(
        F.col(id_col), F.col(cluster_col).alias("cluster"), "qvec"
    )
    norm = F.aggregate(
        F.zip_with(F.col("qvec"), F.col("qvec"), lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    q = q.withColumn("nrm", norm)

    a = q.select(
        F.col(id_col).alias("a_id"), F.col("cluster"), F.col("qvec").alias("a_q"), F.col("nrm").alias("a_n")
    )
    b = q.select(
        F.col(id_col).alias("b_id"), F.col("cluster").alias("b_cluster"), F.col("qvec").alias("b_q"), F.col("nrm").alias("b_n")
    )
    dot = F.aggregate(
        F.zip_with(F.col("a_q"), F.col("b_q"), lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    n2 = threshold_num * threshold_num
    d2 = threshold_den * threshold_den
    dropped = (
        a.join(b, (a.cluster == b.b_cluster) & (a.a_id < b.b_id))
        .withColumn("dot", dot)
        .filter((F.col("dot") > 0) & (F.lit(d2) * F.col("dot") * F.col("dot") >= F.lit(n2) * F.col("a_n") * F.col("b_n")))
        .select(F.col("b_id").alias(id_col))
        .distinct()
    )
    return (
        q.select(id_col, "cluster")
        .join(dropped.withColumn("dropped", F.lit(1)), id_col, "left")
        .select(
            id_col,
            "cluster",
            F.when(F.col("dropped").isNull(), F.lit(1)).otherwise(F.lit(0)).alias("kept"),
        )
    )


def mst_cut_clusters(
    edges: DataFrame,
    k: int,
    weight_col: str = "weight",
) -> DataFrame:
    """Single-linkage hierarchical clustering into ``k`` clusters by the
    classic MST-cut construction (Zahn 1971; Gower & Ross 1969 — public
    methodology): build the minimum spanning forest, delete its ``k-1``
    heaviest edges, and the surviving trees ARE the k single-linkage
    clusters. This is the scale-correct form of agglomerative clustering —
    the O(n^2) dendrogram never materializes; the MSF (V-1 edges) is the
    only state.

    CONNECTED-input contract: exactly-k holds when ``edges`` is connected.
    On disconnected input the k-1 heaviest edges are ranked globally over
    the spanning FOREST, so the result has ``n_components + k - 1``
    clusters and the cut budget can land entirely inside one component —
    the standard global-dendrogram semantics (cutting a forest's
    dendrogram at height k merges nothing across components either). Rank
    cut edges per component (window by component label) if a
    per-component k is wanted instead.

    Composition of two existing kernels: Borůvka MSF (algos/msf.py) and
    min-label connected components (algos/components.py — the reference's
    propagation loop). The cut is deterministic under the total edge order
    ``(weight, a, b) DESC`` (the Kruskal-equal total order msf.py already
    uses), so ties never make the result partitioning-dependent. The cut
    set is k-1 rows — a TakeOrderedAndProject + broadcast anti-join, never
    a shuffle of the forest. Vertices isolated by the cut (or isolated in
    the input) label themselves.

    Returns ``(id, cluster)`` with cluster = min vertex id of the tree,
    one row per distinct endpoint of ``edges``.
    """
    from ..algos.components import connected_components
    from ..algos.msf import minimum_spanning_forest

    if k < 1:
        raise ValueError("k must be >= 1")
    msf = minimum_spanning_forest(edges, weight_col=weight_col)
    if k > 1:
        cut = msf.orderBy(
            F.col(weight_col).desc(), F.col("a").desc(), F.col("b").desc()
        ).limit(k - 1)
        keep = msf.join(F.broadcast(cut), ["a", "b"], "left_anti")
    else:
        keep = msf
    verts = (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    cc = connected_components(
        keep.select(F.col("a").alias("src"), F.col("b").alias("dst"))
    )
    return verts.join(cc, "id", "left").select(
        "id", F.coalesce(F.col("component"), F.col("id")).alias("cluster")
    )


def silhouette(
    emb: DataFrame,
    assignments: DataFrame,
    scale: int = 1024,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-point silhouette score (Rousseeuw 1987 — public methodology)
    of a clustering: ``s = (b - a) / max(a, b)`` with ``a`` the mean
    distance to the point's OWN cluster (self excluded) and ``b`` the
    smallest mean distance to any OTHER cluster — the standard
    cluster-quality eval for the k-means family.

    Distances are Euclidean over the ``round(x*scale)`` integer grid:
    squared distances are exact BIGINTs (one zip_with lambda), each
    per-pair SQRT (correctly-rounded IEEE) is nano-rounded BEFORE the
    per-cluster sums (the repo's per-term discipline — sums become
    order-free integers), and a/b/s are one fixed double tree over those
    integers, micro-rounded once. Singletons and single-cluster corpora
    emit the 0 sentinel.

    Scale shape: the all-pairs join is the brute-force baseline (correct
    up to ~10^5 points; sample first beyond — the knn_graph contract).
    Returns ``(vec_id, cluster, n_own, s_micro)``.
    """
    q = quantize_vectors(emb, scale=scale, vec_col=vec_col).select(
        F.col(id_col), F.col("qvec")
    )
    pts = q.join(assignments, id_col).select(
        F.col(id_col).alias("i"), F.col("qvec").alias("vi"), F.col("cluster").alias("ci")
    )
    other = pts.select(
        F.col("i").alias("j"), F.col("vi").alias("vj"), F.col("ci").alias("cj")
    )
    pairs = pts.join(other, F.col("i") != F.col("j")).select(
        "i",
        "ci",
        "cj",
        F.expr(
            "CAST(ROUND(SQRT(CAST(aggregate(zip_with(vi, vj, (x, y) -> (x - y) * (x - y)),"
            " CAST(0 AS BIGINT), (acc, v) -> acc + v) AS DOUBLE)) * 1000000000.0) AS BIGINT)"
        ).alias("dn"),
    )
    per_c = pairs.groupBy("i", "ci", "cj").agg(
        F.sum("dn").alias("s"), F.count(F.lit(1)).alias("c")
    )
    own = per_c.filter(F.col("ci") == F.col("cj")).select(
        "i", F.col("s").alias("sa"), F.col("c").alias("na")
    )
    btab = (
        per_c.filter(F.col("ci") != F.col("cj"))
        .groupBy("i")
        .agg(F.min(F.expr("CAST(s AS DOUBLE) / CAST(c AS DOUBLE)")).alias("b"))
    )
    base = pts.select(F.col("i"), F.col("ci").alias("cluster"))
    out = base.join(own, "i", "left").join(btab, "i", "left")
    sexpr = (
        "CASE WHEN sa IS NOT NULL AND b IS NOT NULL AND na > 0"
        " AND GREATEST(CAST(sa AS DOUBLE) / CAST(na AS DOUBLE), b) > 0.0 THEN"
        " CAST(ROUND((b - CAST(sa AS DOUBLE) / CAST(na AS DOUBLE))"
        " / GREATEST(CAST(sa AS DOUBLE) / CAST(na AS DOUBLE), b)"
        " * 1000000.0) AS BIGINT)"
        " ELSE CAST(0 AS BIGINT) END"
    )
    return out.select(
        F.col("i").alias(id_col),
        "cluster",
        F.coalesce(F.col("na"), F.lit(0)).cast("long").alias("n_own"),
        F.expr(sexpr).alias("s_micro"),
    )

"""operators/clustering.py — grid-snapped k-means and SemDeDup pruning.

Every check is exact: the quantized pipeline is integer/deterministic by
construction, so parity with the pure-NumPy replay is equality, not
allclose (the whole point of the grid — see the module docstring).
"""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from pagerank_spark.operators.clustering import kmeans_assign, quantize_vectors, semdedup

SF = "/root/testdata/sf0.001"


def _np_kmeans(V: dict, k: int, iters: int, scale: int):
    Q = {i: np.floor(v * scale + 0.5).astype(np.int64) for i, v in V.items()}
    C = [Q[i].copy() for i in range(k)]

    def assign(q):
        d = [int(((q - c) ** 2).sum()) for c in C]
        return d.index(min(d))

    for _ in range(iters):
        sums = [np.zeros_like(C[0]) for _ in range(k)]
        cnt = [0] * k
        for q in Q.values():
            j = assign(q)
            sums[j] += q
            cnt[j] += 1
        for j in range(k):
            if cnt[j]:
                C[j] = np.array(
                    [int(math.floor(s / cnt[j] + 0.5)) for s in sums[j]], dtype=np.int64
                )
    return {i: assign(q) for i, q in Q.items()}, [list(map(int, c)) for c in C]


@pytest.fixture(scope="module")
def emb(spark):
    return (
        spark.read.parquet(f"{SF}/embeddings.parquet")
        .withColumn("embedding", F.transform("embedding", lambda x: x.cast("double")))
        .persist()
    )


def test_quantize_round_half_up(spark):
    df = spark.createDataFrame([(0, [0.4999, 0.5001, -0.5, 1.0])], "id long, embedding array<double>")
    [q] = quantize_vectors(df, scale=1000).select("qvec").first()
    # floor(x*scale + 0.5): 499.9 and 500.1 both snap to 500;
    # -0.5*1000 + 0.5 -> floor(-499.5) = -500
    assert list(q) == [500, 500, -500, 1000]


def test_kmeans_matches_numpy_replay(spark, emb):
    V = {r[0]: np.array(r[1]) for r in emb.select("vec_id", "embedding").collect()}
    out, cents = kmeans_assign(emb, k=4, iters=2, scale=1024)
    got = dict(out.collect())
    exp, exp_c = _np_kmeans(V, 4, 2, 1024)
    assert got == exp
    assert cents == exp_c


def test_kmeans_repartition_stable(spark, emb):
    out1, c1 = kmeans_assign(emb, k=3, iters=1, scale=512)
    out2, c2 = kmeans_assign(emb.repartition(7), k=3, iters=1, scale=512)
    assert c1 == c2
    assert sorted(out1.collect()) == sorted(out2.collect())


def test_kmeans_empty_cluster_keeps_seed(spark):
    # seeds 0 and 1 are IDENTICAL vectors: round 1 assigns EVERY point to
    # cluster 0 (ties break low), so cluster 1 is empty and must keep its
    # seed centroid (0,0). Round 2 then splits: c0 has drifted to the mean
    # (8,0), so the origin points re-assign to the preserved c1 — the
    # fallback is what makes the split possible.
    rows = [(0, [0.0, 0.0]), (1, [0.0, 0.0]), (2, [0.1, 0.1]), (3, [0.2, -0.1])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out, cents = kmeans_assign(df, k=2, iters=2, scale=100)
    got = dict(out.collect())
    assert got == {0: 1, 1: 1, 2: 0, 3: 0}
    assert cents == [[15, 0], [0, 0]]


def test_kmeans_bad_init_raises(spark, emb):
    with pytest.raises(KeyError):
        kmeans_assign(emb, k=2, iters=1, init_ids=[0, 10**9])
    with pytest.raises(ValueError):
        kmeans_assign(emb, k=3, iters=1, init_ids=[0, 1])


def test_semdedup_keep_first_planted(spark):
    rows = [
        (0, 0, [1.0, 0.0]),   # kept: first of the dup pair
        (1, 0, [1.0, 0.0]),   # dropped: exact dup of 0, same cluster
        (2, 0, [0.0, 1.0]),   # kept: orthogonal to everything in cluster 0
        (3, 1, [1.0, 0.0]),   # kept: dup values but DIFFERENT cluster
        (4, 1, [0.9999, 0.0]),  # dropped: near-parallel to 3 in cluster 1
    ]
    df = spark.createDataFrame(rows, "vec_id long, cluster int, embedding array<double>")
    got = {r["vec_id"]: r["kept"] for r in semdedup(df, threshold_num=99, threshold_den=100, scale=128).collect()}
    assert got == {0: 1, 1: 0, 2: 1, 3: 1, 4: 0}


def test_semdedup_matches_numpy_replay(spark, emb):
    V = {r[0]: np.array(r[1]) for r in emb.select("vec_id", "embedding").collect()}
    lab = {r[0]: r[1] for r in emb.select("vec_id", "label").collect()}
    got = {
        r[0]: r[2]
        for r in semdedup(
            emb.withColumn("cluster", F.col("label")), threshold_num=7, threshold_den=20, scale=128
        ).collect()
    }
    Q = {i: np.floor(v * 128 + 0.5).astype(np.int64) for i, v in V.items()}
    dropped = set()
    for i in Q:
        ni = int((Q[i] * Q[i]).sum())
        for j in Q:
            if j >= i or lab[j] != lab[i]:
                continue
            d = int((Q[j] * Q[i]).sum())
            nj = int((Q[j] * Q[j]).sum())
            if d > 0 and 400 * d * d >= 49 * ni * nj:
                dropped.add(i)
                break
    assert got == {i: (0 if i in dropped else 1) for i in Q}
    assert dropped  # threshold chosen so the real corpus actually prunes


def test_semdedup_overflow_guard(spark):
    df = spark.createDataFrame([(0, 0, [1.0] * 64)], "vec_id long, cluster int, embedding array<double>")
    with pytest.raises(ValueError, match="overflow"):
        semdedup(df, threshold_num=99, threshold_den=10**6, scale=10**5)


def _kruskal_clusters(edges, k):
    # exact single-linkage replay: Kruskal under (w, a, b) asc, then cut
    # the k-1 heaviest MST edges, then union-find the rest
    import itertools

    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    und = {}
    for s, d, w in edges:
        a, b = min(s, d), max(s, d)
        if a == b:
            continue
        und[(a, b)] = min(und.get((a, b), w), w)
    mst = []
    for (a, b), w in sorted(und.items(), key=lambda kv: (kv[1], kv[0])):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
            mst.append((w, a, b))
    keep = sorted(mst, reverse=True)[max(0, k - 1):]
    parent = {}
    for _, a, b in keep:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    verts = {v for s, d, _ in edges for v in (s, d)}
    return {v: find(v) for v in verts}


def test_mst_cut_matches_kruskal_replay(spark):
    from pagerank_spark.operators.clustering import mst_cut_clusters

    # two dense blobs bridged by one heavy edge + a dangling satellite
    edges = (
        [(a, b, 1 + ((a * 7 + b) % 5)) for a in range(0, 6) for b in range(a + 1, 6)]
        + [(a, b, 1 + ((a * 5 + b) % 4)) for a in range(10, 15) for b in range(a + 1, 15)]
        + [(5, 10, 90), (14, 20, 80)]
    )
    df = spark.createDataFrame(edges, "src long, dst long, weight long")
    for k in (1, 2, 3):
        got = {r.id: r.cluster for r in mst_cut_clusters(df, k=k).collect()}
        assert got == _kruskal_clusters(edges, k)
    # k=3 severs both bridges: blobs + satellite separate
    got3 = {r.id: r.cluster for r in mst_cut_clusters(df, k=3).collect()}
    assert len(set(got3.values())) == 3


def test_mst_cut_k1_is_plain_components(spark):
    from pagerank_spark.operators.clustering import mst_cut_clusters

    df = spark.createDataFrame(
        [(1, 2, 5), (2, 3, 1), (7, 8, 2)], "src long, dst long, weight long"
    )
    got = {r.id: r.cluster for r in mst_cut_clusters(df, k=1).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 7: 7, 8: 7}


def test_silhouette_separated_clusters_high_scores(spark):
    from pagerank_spark.operators.clustering import silhouette

    vecs = (
        [(i, [10.0 + i, 0.0]) for i in range(3)]
        + [(10 + i, [0.0, 10.0 + i]) for i in range(3)]
    )
    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    asg = spark.createDataFrame(
        [(i, 0) for i in range(3)] + [(10 + i, 1) for i in range(3)],
        "vec_id long, cluster long",
    )
    got = {r.vec_id: r for r in silhouette(emb, asg).collect()}
    for v, r in got.items():
        assert r.n_own == 2
        assert r.s_micro > 800_000  # well-separated -> s close to 1


def test_silhouette_replay_and_sentinels(spark):
    import math

    from pagerank_spark.operators.clustering import silhouette

    vecs = [(0, [0.0, 0.0]), (1, [1.0, 0.0]), (2, [5.0, 0.0]), (3, [9.0, 9.0])]
    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    # clusters: {0,1}, {2}, {3} — 2 and 3 are singletons -> sentinel 0
    asg = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 1), (3, 2)], "vec_id long, cluster long"
    )
    got = {r.vec_id: r for r in silhouette(emb, asg).collect()}
    assert got[2].s_micro == 0 and got[2].n_own == 0
    assert got[3].s_micro == 0

    pts = {i: [x * 1024 for x in v] for i, v in
           ((i, v) for i, v in vecs)}
    def dn(a, b):
        return round(math.sqrt(sum((x - y) ** 2 for x, y in zip(pts[a], pts[b]))) * 1e9)
    # point 0: a = dn(0,1); b = min(dn(0,2)/1, dn(0,3)/1)
    a = dn(0, 1) / 1
    b = min(dn(0, 2), dn(0, 3))
    want = round((b - a) / max(a, b) * 1e6)
    assert got[0].s_micro == want

"""DBSCAN: core/border/noise trichotomy on a hand-checkable layout."""

from pagerank_spark.operators.spatial import dbscan


def test_dbscan_two_clusters_border_noise(spark):
    # cluster A: ids 0..4 at x=0..4 (spacing 1, eps 5 -> complete graph)
    pts = [(i, i, 0) for i in range(5)]
    # cluster B: ids 10..14, same shape, far away
    pts += [(10 + i, 1000 + i, 0) for i in range(5)]
    # border: x=9 is within eps of x=4 ONLY -> n_eps = 2 < min_pts
    pts += [(20, 9, 0)]
    # noise: isolated
    pts += [(30, 5000, 5000)]
    df = spark.createDataFrame(pts, "id long, x long, y long")
    out = {r.id: (r.cluster, r.is_core) for r in dbscan(df, eps=5, min_pts=4).collect()}
    # every blob point: 4 neighbors + self (+ the border point for id 4)
    for i in range(5):
        assert out[i] == (0, 1)
    for i in range(10, 15):
        assert out[i] == (10, 1)
    assert out[20] == (0, 0)   # border adopts cluster A's min-id label
    assert out[30] == (-1, 0)  # noise
    assert len(out) == 12


def test_dbscan_all_noise_when_sparse(spark):
    df = spark.createDataFrame([(i, i * 100, 0) for i in range(6)], "id long, x long, y long")
    out = {r.id: r.cluster for r in dbscan(df, eps=5, min_pts=2).collect()}
    assert all(c == -1 for c in out.values())

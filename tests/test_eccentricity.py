"""Eccentricity: closed forms on a directed cycle and a path."""

from pagerank_spark.algos.paths import eccentricity


def test_ecc_directed_cycle(spark):
    n = 9
    edges = spark.createDataFrame(
        [(i, (i + 1) % n) for i in range(n)], "src long, dst long"
    )
    rows = {r.id: r for r in eccentricity(edges, max_iters=n).collect()}
    # every vertex reaches all n (incl itself at 0); farthest is n-1 hops
    for i in range(n):
        assert (rows[i].ecc, rows[i].n_reached) == (n - 1, n)


def test_ecc_directed_path_asymmetric(spark):
    # 0 -> 1 -> 2 -> 3: ecc(i) = 3 - i, n_reached = 4 - i
    edges = spark.createDataFrame([(0, 1), (1, 2), (2, 3)], "src long, dst long")
    rows = {r.id: r for r in eccentricity(edges, max_iters=10).collect()}
    for i in range(4):
        assert (rows[i].ecc, rows[i].n_reached) == (3 - i, 4 - i)

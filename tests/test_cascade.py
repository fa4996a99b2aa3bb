"""Linear-threshold cascade: hand-computed toys + monotonicity invariants."""

from pyspark.sql import functions as F

from pagerank_spark.algos.cascade import linear_threshold_cascade


def _sym(spark, pairs):
    e = spark.createDataFrame(pairs, "src long, dst long")
    return e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))


def test_path_cascade_rounds(spark):
    # path 0-1-2-3, seed 0, theta=1/2: each vertex has <=2 neighbors so one
    # active neighbor suffices -> BFS rounds
    edges = _sym(spark, [(0, 1), (1, 2), (2, 3)])
    seeds = spark.createDataFrame([(0,)], "id long")
    got = {r.id: r["round"] for r in linear_threshold_cascade(edges, seeds, 1, 2, 10).collect()}
    assert got == {0: 0, 1: 1, 2: 2, 3: 3}


def test_star_needs_fraction(spark):
    # star center 0 with 4 leaves, theta=1/2: seeding 1 leaf never activates
    # the center (1*2 < 4*1); seeding 2 leaves activates it in round 1,
    # then the remaining leaves (indeg 1) in round 2
    edges = _sym(spark, [(0, i) for i in range(1, 5)])
    one = spark.createDataFrame([(1,)], "id long")
    got = {r.id: r["round"] for r in linear_threshold_cascade(edges, one, 1, 2, 10).collect()}
    assert got == {1: 0}
    two = spark.createDataFrame([(1,), (2,)], "id long")
    got = {r.id: r["round"] for r in linear_threshold_cascade(edges, two, 1, 2, 10).collect()}
    assert got == {1: 0, 2: 0, 0: 1, 3: 2, 4: 2}


def test_early_stop_equals_full_run(spark):
    # monotone fixpoint: max_iters beyond convergence changes nothing
    edges = _sym(spark, [(0, 1), (1, 2), (2, 3), (3, 4), (0, 2)])
    seeds = spark.createDataFrame([(0,)], "id long")
    a = sorted((r.id, r["round"]) for r in linear_threshold_cascade(edges, seeds, 1, 2, 4).collect())
    b = sorted((r.id, r["round"]) for r in linear_threshold_cascade(edges, seeds, 1, 2, 30).collect())
    assert a == b


def test_threshold_validation(spark):
    import pytest

    edges = _sym(spark, [(0, 1)])
    seeds = spark.createDataFrame([(0,)], "id long")
    with pytest.raises(ValueError):
        linear_threshold_cascade(edges, seeds, 3, 2)

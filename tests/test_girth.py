"""Directed girth: rings, self-loops, 2-cycles, DAGs, max_k cutoff."""

from pagerank_spark.algos.paths import directed_girth


def _run(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src long, dst long")
    r = directed_girth(df, **kw).collect()[0]
    return r.girth, r.n_on_min_cycles


def test_ring_girth_is_ring_length(spark):
    ring = [(v, (v + 1) % 5) for v in range(5)]
    assert _run(spark, ring, max_k=8) == (5, 5)


def test_self_loop_is_girth_one(spark):
    assert _run(spark, [(0, 1), (1, 1)], max_k=4) == (1, 1)


def test_two_cycle(spark):
    assert _run(spark, [(0, 1), (1, 0), (1, 2)], max_k=4) == (2, 2)


def test_dag_has_no_cycle(spark):
    dag = [(0, 1), (0, 2), (1, 3), (2, 3)]
    assert _run(spark, dag, max_k=6) == (-1, 0)


def test_cycle_beyond_max_k_not_found(spark):
    ring = [(v, (v + 1) % 9) for v in range(9)]
    assert _run(spark, ring, max_k=4) == (-1, 0)


def test_min_of_two_cycle_lengths(spark):
    # a 3-ring and a 6-ring: girth 3, only the 3-ring vertices on it
    edges = [(v, (v + 1) % 3) for v in range(3)] + [
        (10 + v, 10 + (v + 1) % 6) for v in range(6)
    ]
    assert _run(spark, edges, max_k=8) == (3, 3)

"""Graph contraction (quotient graph) semantics."""

from pyspark.sql import functions as F

from pagerank_spark.operators.graphstats import contract_graph


def _edges(spark):
    # groups: 1,2 -> A(=10); 3,4 -> B(=20); 5 -> C(=30)
    return spark.createDataFrame(
        [(1, 3), (2, 3), (1, 2), (3, 4), (4, 5), (5, 1), (5, 2)],
        "src long, dst long",
    )


def _mapping(spark):
    return spark.createDataFrame(
        [(1, 10), (2, 10), (3, 20), (4, 20), (5, 30)], "id long, group long"
    )


def test_contraction_weights_and_loops(spark):
    got = {
        (r.src, r.dst): r.w
        for r in contract_graph(_edges(spark), _mapping(spark)).collect()
    }
    # (1,3),(2,3) -> A->B x2; (4,5) -> B->C; (5,1),(5,2) -> C->A x2;
    # intra-group (1,2) and (3,4) dropped
    assert got == {(10, 20): 2, (20, 30): 1, (30, 10): 2}


def test_keep_self_loops(spark):
    got = {
        (r.src, r.dst): r.w
        for r in contract_graph(
            _edges(spark), _mapping(spark), drop_self_loops=False
        ).collect()
    }
    assert got[(10, 10)] == 1 and got[(20, 20)] == 1 and got[(10, 20)] == 2


def test_unmapped_endpoints_drop_edges(spark):
    partial = _mapping(spark).filter(F.col("id") != 5)
    got = {
        (r.src, r.dst): r.w
        for r in contract_graph(_edges(spark), partial).collect()
    }
    assert got == {(10, 20): 2}

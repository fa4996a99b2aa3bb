"""partition_quality + graph_growth: closed-form planted inputs."""

from pagerank_spark.operators.graphstats import graph_growth, partition_quality


def test_partition_quality_two_parts_closed_form(spark):
    # p=2 with the pre-modded Knuth hash: part(v) = (v * 2654435761) % 2 =
    # v % 2 (odd multiplier preserves parity)
    edges = [(0, 2), (0, 4), (1, 3), (0, 1)]
    df = spark.createDataFrame(edges, "src long, dst long")
    r = partition_quality(df, p=2).collect()[0]
    assert (r.p, r.n_vertices, r.n_edges) == (2, 5, 4)
    assert r.edge_cut == 1  # only (0,1) crosses
    assert r.cut_micro == 250000
    # parts: evens {0,2,4}=3, odds {1,3}=2 -> balance = 3*2/5
    assert (r.max_part, r.balance_micro) == (3, 1200000)
    # comm volume: vertices 0 and 1 each touch one remote part
    assert r.comm_volume == 2


def test_partition_quality_single_part_no_cut(spark):
    df = spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long")
    r = partition_quality(df, p=1).collect()[0]
    assert (r.edge_cut, r.comm_volume, r.balance_micro) == (0, 0, 1000000)


def test_graph_growth_first_seen_semantics(spark):
    # day 1: edges (1,2),(2,3); day 2: (1,2) again (not new) + (3,4)
    rows = [(1, 2, 1), (2, 3, 1), (1, 2, 2), (3, 4, 2), (5, 5, 1)]
    df = spark.createDataFrame(rows, "src long, dst long, t long")
    got = {
        r.t: (r.new_edges, r.new_vertices, r.cum_edges, r.cum_vertices)
        for r in graph_growth(df).collect()
    }
    assert got == {1: (2, 3, 2, 3), 2: (1, 1, 3, 4)}


def test_graph_growth_edge_reappearing_earlier_day_wins(spark):
    rows = [(1, 2, 5), (1, 2, 3)]
    df = spark.createDataFrame(rows, "src long, dst long, t long")
    got = {r.t: r.new_edges for r in graph_growth(df).collect()}
    assert got == {3: 1}

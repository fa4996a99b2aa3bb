"""Densest subgraph peeling: planted optimum, approximation bound, guards."""

import pytest

from pagerank_spark.algos.densest import densest_subgraph
from pagerank_spark.sources.graphs import DENSEST_K, densest_synth_graph


def test_planted_clique_is_found(spark):
    out = densest_subgraph(densest_synth_graph(spark), rounds=4).collect()
    assert sorted(r.id for r in out) == list(range(DENSEST_K))
    r = out[0]
    k = DENSEST_K
    assert (r.n_vertices, r.n_edges) == (k, k * (k - 1) // 2)
    assert r.density_micro == (k - 1) * 1_000_000 // 2  # 9.5


def test_extra_rounds_are_noops(spark):
    g = densest_synth_graph(spark)
    a = sorted(r.id for r in densest_subgraph(g, rounds=4).collect())
    b = sorted(r.id for r in densest_subgraph(g, rounds=7).collect())
    assert a == b


def test_eps_zero_finds_k4_next_to_path(spark):
    # K4 (rho 1.5) + pendant path; the coarse eps=1/2 peel wipes round 0,
    # eps=0 (threshold = 2*rho exactly) isolates the clique first
    rows = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3), (3, 4), (4, 5)]
    df = spark.createDataFrame(rows, "src long, dst long")
    out = densest_subgraph(df, rounds=5, eps_num=0, eps_den=1).collect()
    assert sorted(r.id for r in out) == [0, 1, 2, 3]
    assert out[0].density_micro == 1_500_000


def test_approximation_bound_on_planted(spark):
    # guarantee: best >= opt / (2(1+eps)); opt here is the K20 at 9.5
    out = densest_subgraph(densest_synth_graph(spark), rounds=4).collect()
    assert out[0].density_micro >= 9_500_000 / 3.0


def test_bad_args(spark):
    df = spark.createDataFrame([(0, 1)], "src long, dst long")
    with pytest.raises(ValueError):
        densest_subgraph(df, rounds=0)
    with pytest.raises(ValueError):
        densest_subgraph(df, eps_num=-1)

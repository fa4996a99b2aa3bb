"""Clustering coefficients, modularity, graph summary — hand fixtures and
NumPy brute-force oracles."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from pagerank_spark.algos.modularity import modularity, modularity_by_community
from pagerank_spark.algos.triangles import clustering_coefficients
from pagerank_spark.operators.graphstats import graph_summary
from pagerank_spark.sources.graphs import er_edges_numpy


def _edges_df(spark, pairs):
    return spark.createDataFrame([(int(s), int(d)) for s, d in pairs], "src long, dst long")


def _brute_coefs(pairs):
    """Per-vertex (triangles, deg, coef) over the undirected simple graph."""
    adj = {}
    for s, d in pairs:
        s, d = int(s), int(d)
        if s == d:
            continue
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    out = {}
    for v, nbrs in adj.items():
        deg = len(nbrs)
        t = sum(len(adj[u] & nbrs) for u in nbrs) // 2
        coef = 2.0 * t / (deg * (deg - 1)) if deg >= 2 else 0.0
        out[v] = (t, deg, coef)
    return out


def test_clustering_triangle_plus_pendant(spark):
    # K3 on {1,2,3} plus pendant 4-1: coefs 1/3 at vertex 1 (deg 3, 1 tri),
    # 1.0 at 2 and 3, 0.0 at the pendant
    df = _edges_df(spark, [(1, 2), (2, 3), (1, 3), (4, 1)])
    rows = {r["id"]: r for r in clustering_coefficients(df).collect()}
    assert rows[1]["triangles"] == 1 and rows[1]["deg"] == 3
    assert rows[1]["coef"] == pytest.approx(1.0 / 3.0)
    assert rows[2]["coef"] == pytest.approx(1.0) and rows[3]["coef"] == pytest.approx(1.0)
    assert rows[4]["triangles"] == 0 and rows[4]["coef"] == 0.0


def test_clustering_matches_bruteforce(spark):
    arr = er_edges_numpy(80, 400, seed=3)
    rows = {r["id"]: r for r in clustering_coefficients(_edges_df(spark, arr)).collect()}
    exp = _brute_coefs(arr)
    assert set(rows) == set(exp)
    for v, (t, deg, coef) in exp.items():
        assert rows[v]["triangles"] == t, v
        assert rows[v]["deg"] == deg, v
        assert rows[v]["coef"] == pytest.approx(coef, abs=1e-12), v


def test_modularity_two_cliques(spark):
    # two K4 cliques bridged by one edge; labels = clique membership.
    # m = 13 edges (6 + 6 + 1); each community: e_c = 6, d_c = 13.
    k4a = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    k4b = [(a + 10, b + 10) for a, b in k4a]
    pairs = k4a + k4b + [(0, 10)]
    labels = spark.createDataFrame(
        [(i, 0) for i in range(4)] + [(i + 10, 1) for i in range(4)], "id long, label long"
    )
    df = _edges_df(spark, pairs)
    rows = {r["label"]: r for r in modularity_by_community(df, labels).collect()}
    m = 13.0
    for lbl in (0, 1):
        assert rows[lbl]["internal_edges"] == 6
        assert rows[lbl]["degree_sum"] == 13
        assert rows[lbl]["q_contrib"] == pytest.approx(6 / m - (13 / (2 * m)) ** 2)
    q = modularity(df, labels)
    assert q == pytest.approx(2 * (6 / m - (13 / (2 * m)) ** 2))
    # sanity: the natural partition scores higher than everything-in-one
    one = labels.select("id", F.lit(0).alias("label"))
    assert q > modularity(df, one)


def test_modularity_matches_bruteforce(spark):
    arr = er_edges_numpy(60, 240, seed=8)
    und = {(min(int(s), int(d)), max(int(s), int(d))) for s, d in arr if s != d}
    ids = sorted({x for e in und for x in e})
    lab = {v: v % 4 for v in ids}
    m = float(len(und))
    deg = {v: 0 for v in ids}
    for a, b in und:
        deg[a] += 1
        deg[b] += 1
    q_exp = 0.0
    for c in range(4):
        e_c = sum(1 for a, b in und if lab[a] == c and lab[b] == c)
        d_c = sum(deg[v] for v in ids if lab[v] == c)
        q_exp += e_c / m - (d_c / (2 * m)) ** 2
    labels = spark.createDataFrame([(v, lab[v]) for v in ids], "id long, label long")
    assert modularity(_edges_df(spark, arr), labels) == pytest.approx(q_exp, abs=1e-12)


def test_graph_summary_fixture(spark):
    # edges: loop (5,5); reciprocal pair 1<->2; chain 2->3, 3->4; dup row
    pairs = [(5, 5), (1, 2), (2, 1), (2, 3), (3, 4), (3, 4)]
    row = graph_summary(_edges_df(spark, pairs)).collect()[0]
    assert row["n_vertices"] == 5
    assert row["n_edges"] == 5          # distinct directed, loop included
    assert row["n_self_loops"] == 1
    assert row["n_undirected"] == 3     # {1,2} {2,3} {3,4}
    assert row["n_reciprocal"] == 2     # 1->2 and 2->1
    assert row["reciprocity"] == pytest.approx(2 / 4)
    assert row["max_out_deg"] == 2      # vertex 2 (or 3): 2 distinct out-edges
    assert row["max_in_deg"] == 1
    assert row["avg_out_deg"] == pytest.approx(round(5 / 4, 6))  # 4 sources, 5 edges


def test_bipartite_project_weights_and_caps(spark):
    from pagerank_spark.operators.graphstats import bipartite_project

    rows = [
        ("g1", 1), ("g1", 2), ("g1", 3),
        ("g2", 1), ("g2", 2),
        ("g3", 2), ("g3", 3),
        ("hub", 1), ("hub", 2), ("hub", 3), ("hub", 4), ("hub", 5),
    ]
    m = spark.createDataFrame(rows, ["order_id", "item"])
    got = {
        (r["a"], r["b"]): r["weight"]
        for r in bipartite_project(m, "order_id", "item").collect()
    }
    # pair (1,2): g1, g2, hub -> 3; (2,3): g1, g3, hub -> 3; (1,3): g1, hub -> 2
    assert got[(1, 2)] == 3 and got[(2, 3)] == 3 and got[(1, 3)] == 2
    assert got[(4, 5)] == 1  # hub-only pair

    capped = {
        (r["a"], r["b"]): r["weight"]
        for r in bipartite_project(m, "order_id", "item", max_group_size=3).collect()
    }
    # hub (size 5) dropped before the self-join
    assert capped == {(1, 2): 2, (2, 3): 2, (1, 3): 1}

    pruned = {
        (r["a"], r["b"]): r["weight"]
        for r in bipartite_project(m, "order_id", "item", min_weight=3).collect()
    }
    assert pruned == {(1, 2): 3, (2, 3): 3}


def test_reciprocity_counts(spark):
    from pagerank_spark.operators.graphstats import reciprocity

    e = spark.createDataFrame([[0, 1], [1, 0], [1, 2], [2, 3], [3, 2], [4, 4]], ["src", "dst"])
    r = reciprocity(e).collect()[0]
    assert (r["n_directed"], r["n_reciprocal"]) == (5, 4)  # self-loop dropped
    assert abs(r["reciprocity"] - 0.8) < 1e-9


def test_hill_alpha_closed_form(spark):
    import math

    from pagerank_spark.operators.graphstats import hill_alpha

    # star on 5 leaves: center deg 5, leaves deg 1 -> tail (d_min=2) = {center}
    e = spark.createDataFrame([[0, i] for i in range(1, 6)], ["src", "dst"])
    r = hill_alpha(e, d_min=2).collect()[0]
    assert r["n_tail"] == 1
    assert abs(r["alpha"] - round(1 + 1 / math.log(5 / 2), 6)) < 1e-9


def test_sample_subgraph_deterministic_and_induced(spark):
    from pagerank_spark.operators.graphstats import sample_subgraph
    from pagerank_spark.operators.packing import KNUTH

    pairs = [[a, b] for a in range(30) for b in range(30) if a < b and (a + b) % 3 == 0]
    e = spark.createDataFrame(pairs, ["src", "dst"])
    got = set(map(tuple, sample_subgraph(e, 50).collect()))
    kept = {v for v in range(30) if ((v * KNUTH) % (1 << 32)) % 100 < 50}
    assert got == {(a, b) for a, b in pairs if a in kept and b in kept}
    assert got == set(map(tuple, sample_subgraph(e.repartition(11), 50).collect()))


def test_approx_triangle_count_unbiased_form(spark):
    from pagerank_spark.algos.triangles import approx_triangle_count, triangle_count
    from pagerank_spark.operators.graphstats import sample_subgraph
    from pagerank_spark.sources.graphs import er_edges_numpy

    arr = er_edges_numpy(80, 500, seed=6)
    edges = spark.createDataFrame([(int(a), int(b)) for a, b in arr], "src long, dst long")
    n, est = approx_triangle_count(edges, pct=50)
    # the estimate is exactly the sampled count x (100/50)^3, and the
    # sampled count is the true count of the deterministic subgraph
    assert est == n * 8.0
    assert n == triangle_count(sample_subgraph(edges, 50, 0))
    # pct=100 degenerates to the exact count
    n_full, est_full = approx_triangle_count(edges, pct=100)
    assert n_full == est_full == triangle_count(edges)


class TestSquareCount:
    def test_closed_forms(self, spark):
        from pagerank_spark.algos.triangles import square_count

        k4 = spark.createDataFrame(
            [(a, b) for a in range(4) for b in range(a + 1, 4)], "src long, dst long"
        )
        assert square_count(k4).collect()[0]["squares"] == 3
        c4 = spark.createDataFrame([(0, 1), (1, 2), (2, 3), (3, 0)], "src long, dst long")
        assert square_count(c4).collect()[0]["squares"] == 1
        # complete bipartite K(2,3): C(2,2)*C(3,2) = 3 squares
        kb = spark.createDataFrame(
            [(a, b) for a in (0, 1) for b in (10, 11, 12)], "src long, dst long"
        )
        assert square_count(kb).collect()[0]["squares"] == 3
        # triangle has no squares
        t = spark.createDataFrame([(0, 1), (1, 2), (0, 2)], "src long, dst long")
        assert square_count(t).collect()[0]["squares"] == 0

    def test_matches_bruteforce_on_er(self, spark):
        from itertools import combinations

        from pagerank_spark.algos.triangles import square_count
        from pagerank_spark.sources.graphs import er_graph

        edges = er_graph(spark, 60, 240, seed=17)
        el = {
            tuple(sorted((r["src"], r["dst"])))
            for r in edges.collect()
            if r["src"] != r["dst"]
        }
        nbrs = {}
        for a, b in el:
            nbrs.setdefault(a, set()).add(b)
            nbrs.setdefault(b, set()).add(a)
        want = 0
        for u, w in combinations(sorted(nbrs), 2):
            c = len(nbrs[u] & nbrs[w])
            want += c * (c - 1) // 2
        want //= 2
        assert square_count(edges).collect()[0]["squares"] == want

    def test_degree_cap_is_lower_bound(self, spark):
        from pagerank_spark.algos.triangles import square_count
        from pagerank_spark.sources.graphs import er_graph

        edges = er_graph(spark, 60, 360, seed=9)
        exact = square_count(edges).collect()[0]["squares"]
        capped = square_count(edges, max_degree=8).collect()[0]["squares"]
        assert capped <= exact


class TestRichClub:
    def test_closed_form_star_plus_clique(self, spark):
        from pagerank_spark.operators.graphstats import rich_club

        # K4 on {0,1,2,3} plus leaves 10..15 hanging off vertex 0
        edges = [(a, b) for a in range(4) for b in range(a + 1, 4)]
        edges += [(0, 10 + i) for i in range(6)]
        df = spark.createDataFrame(edges, "src long, dst long")
        got = {r["k"]: r for r in rich_club(df, ks=[1, 3, 8]).collect()}
        # k=3: vertices with deg>3 = {0 (deg 9)}; no pair -> phi 0
        assert got[3]["n_k"] == 1 and got[3]["e_k"] == 0 and got[3]["phi_micro"] == 0
        # k=1: {0,1,2,3} (deg 3+) induced K4 -> phi = 1
        assert got[1]["n_k"] == 4 and got[1]["e_k"] == 6
        assert got[1]["phi_micro"] == 1_000_000
        # k=8: only vertex 0 qualifies -> n_k = 1
        assert got[8]["n_k"] == 1

    def test_monotone_thresholds_shrink(self, spark):
        from pagerank_spark.operators.graphstats import rich_club
        from pagerank_spark.sources.graphs import er_graph

        df = er_graph(spark, 80, 400, seed=3)
        rows = {r["k"]: r for r in rich_club(df, ks=[1, 2, 4]).collect()}
        assert rows[1]["n_k"] >= rows[2]["n_k"] >= rows.get(4, rows[2])["n_k"]
        assert rows[1]["e_k"] >= rows[2]["e_k"]


def test_collective_influence_hand_graph(spark):
    from pagerank_spark.operators.graphstats import collective_influence

    # star 0-(1,2,3) plus chain 3-4-5: frontiers computed by hand
    e = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3), (3, 4), (4, 5)], "src long, dst long"
    )
    got = {r.id: (r.degree, r.ci) for r in collective_influence(e).collect()}
    # degrees: 0->3, 1->1, 2->1, 3->2, 4->2, 5->1
    assert {k: v[0] for k, v in got.items()} == {0: 3, 1: 1, 2: 1, 3: 2, 4: 2, 5: 1}
    # v=0: frontier {4} -> (3-1)*(2-1) = 2
    assert got[0][1] == 2
    # v=1: frontier {2,3} -> 0 * ... = 0 (leaf)
    assert got[1][1] == 0
    # v=3: frontier {1,2,5} -> (2-1)*(0+0+0) = 0 (all leaves)
    assert got[3][1] == 0
    # v=4: frontier {0} -> (2-1)*(3-1) = 2
    assert got[4][1] == 2
    # v=5: leaf -> 0
    assert got[5][1] == 0


def test_collective_influence_hub_cap_guard(spark):
    from pagerank_spark.operators.graphstats import collective_influence

    # hub 0 with 5 leaves; capping degree 4 removes hub middles, so leaves
    # lose their (only, hub-mediated) frontier
    e = spark.createDataFrame([(0, i) for i in range(1, 6)], "src long, dst long")
    full = {r.id: r.ci for r in collective_influence(e).collect()}
    capped = {r.id: r.ci for r in collective_influence(e, cap_degree=4).collect()}
    assert full[1] == 0 and full[0] == 0  # leaves have k-1=0; hub frontier empty
    assert capped == {i: 0 for i in range(6)}


def test_oddball_flags_star_and_clique_extremes(spark):
    from pagerank_spark.operators.graphstats import oddball_egonet

    # a big star (hub 0) + a K5 clique + some mid-density filler chains
    edges = (
        [(0, i) for i in range(1, 13)]
        + [(a, b) for a in range(100, 105) for b in range(a + 1, 105)]
        + [(200 + i, 201 + i) for i in range(6)]
        + [(200, 203), (202, 205)]
    )
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.id: r for r in oddball_egonet(df).collect()}
    # hub egonet: n=13, e=12 (pure star); clique member egonet: n=5, e=10
    assert (got[0].n_ego, got[0].e_ego) == (13, 12)
    assert (got[100].n_ego, got[100].e_ego) == (5, 10)
    # the two structural extremes outscore every filler vertex
    filler_max = max(r.score_micro for v, r in got.items() if v >= 200)
    assert got[0].score_micro > filler_max
    assert got[100].score_micro > filler_max


def test_oddball_degenerate_single_edge(spark):
    from pagerank_spark.operators.graphstats import oddball_egonet

    df = spark.createDataFrame([(1, 2)], "src long, dst long")
    got = {r.id: r for r in oddball_egonet(df).collect()}
    # both egonets identical -> zero x-variance -> sentinel scores
    assert got[1].score_micro == 0 and got[2].score_micro == 0


def test_triangle_significance_replay(spark):
    import math

    from pagerank_spark.operators.graphstats import triangle_significance

    # K4 plus a pendant: T=4, degrees 3,3,3,4,1
    e = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3), (3, 9)],
        "src long, dst long",
    )
    got = triangle_significance(e).collect()[0]
    assert (got.n_vertices, got.n_triangles) == (5, 4)
    degs = [3, 3, 3, 4, 1]
    s1, s2 = sum(degs), sum(d * (d - 1) for d in degs)
    assert (got.s1, got.s2) == (s1, s2)
    ev = (s2 / s1) ** 3 / 6.0
    assert got.e_micro == round(ev * 1e6)
    assert got.z_micro == round((4 - ev) / math.sqrt(ev) * 1e6)
    # the clique is far denser than its degree sequence predicts
    assert got.z_micro > 1_000_000

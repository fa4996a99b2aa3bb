"""Burt constraint + knn(d): closed-form planted graphs, Python replay."""

from pagerank_spark.operators.graphstats import avg_neighbor_degree, burt_constraint


def _edges_df(spark, edges):
    return spark.createDataFrame(edges, "src long, dst long")


def py_burt(edges):
    """Replay with the exact nano/pico truncation points."""
    und = set()
    for s, d in edges:
        if s != d:
            und.add((min(s, d), max(s, d)))
    nbr = {}
    for a, b in und:
        nbr.setdefault(a, set()).add(b)
        nbr.setdefault(b, set()).add(a)
    deg = {v: len(ns) for v, ns in nbr.items()}
    rq = {v: 1_000_000_000 // d for v, d in deg.items()}
    out = {}
    for i in nbr:
        c = 0
        for j in nbr[i]:
            s_ij = sum(rq[q] for q in nbr[i] & nbr[j] if q not in (i, j))
            u = (1_000_000_000 + s_ij) // deg[i]
            c += (u * u) // 1_000_000
        out[i] = (deg[i], c)
    return out


def test_burt_matches_python_replay(spark):
    # a kite: triangle 0-1-2 + pendant 3 off 0 + square 4-5-6-7 sharing 4=2
    edges = [(0, 1), (1, 2), (2, 0), (0, 3), (2, 4), (4, 5), (5, 6), (6, 7), (7, 4)]
    got = {
        r.id: (r.deg, r.constraint_pico)
        for r in burt_constraint(_edges_df(spark, edges)).collect()
    }
    assert got == py_burt(edges)


def test_burt_star_center_unconstrained_leaves_fully(spark):
    # star: center 0 with 4 leaves, no triangles
    edges = [(0, i) for i in range(1, 5)]
    got = {
        r.id: (r.deg, r.constraint_pico)
        for r in burt_constraint(_edges_df(spark, edges)).collect()
    }
    # center: 4 * (1e9/4)^2 / 1e6 = 4 * 62500000000 / 4... replay check
    assert got == py_burt(edges)
    # leaves (deg 1, one dyad) are maximally constrained vs the center
    assert got[1][1] > got[0][1]


def test_knn_curve_exact_means(spark):
    # star 0-(1,2,3): deg(0)=3, deg(leaf)=1
    got = {
        r.deg: (r.n_edge_ends, r.sum_nbr_deg, r.knn_micro)
        for r in avg_neighbor_degree(_edges_df(spark, [(0, 1), (0, 2), (0, 3)])).collect()
    }
    assert got == {3: (3, 3, 1000000), 1: (3, 9, 3000000)}


def test_knn_ring_is_flat(spark):
    ring = [(v, (v + 1) % 6) for v in range(6)]
    got = {r.deg: r.knn_micro for r in avg_neighbor_degree(_edges_df(spark, ring)).collect()}
    assert got == {2: 2000000}

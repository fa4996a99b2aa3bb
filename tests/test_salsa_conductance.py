"""SALSA NumPy replay, conductance closed form, FD-audit closed form."""

import numpy as np

from pagerank_spark.algos.hits import salsa
from pagerank_spark.algos.modularity import conductance_by_community
from pagerank_spark.operators.constraints import fd_violations


def _salsa_np(edges, k):
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    idx = {v: i for i, v in enumerate(nodes)}
    od = np.zeros(len(nodes))
    idg = np.zeros(len(nodes))
    for u, v in edges:
        od[idx[u]] += 1
        idg[idx[v]] += 1
    hubs = [i for i in range(len(nodes)) if od[i] > 0]
    h = np.zeros(len(nodes))
    h[hubs] = 1.0 / len(hubs)
    a = np.zeros(len(nodes))
    for _ in range(k):
        a = np.zeros(len(nodes))
        for u, v in edges:
            a[idx[v]] += h[idx[u]] / od[idx[u]]
        h = np.zeros(len(nodes))
        for u, v in edges:
            h[idx[u]] += a[idx[v]] / idg[idx[v]]
    return nodes, a, h


def test_salsa_matches_numpy(spark):
    rng = np.random.default_rng(7)
    edges = sorted({(int(rng.integers(0, 30)), int(rng.integers(0, 30))) for _ in range(120)})
    edges = [(u, v) for u, v in edges if u != v]
    df = spark.createDataFrame(edges, "src long, dst long")
    res = salsa(df, max_iters=3, tol=0.0, check_every=3, num_partitions=4)
    nodes, a_np, h_np = _salsa_np(edges, 3)
    got = {r.id: (r.auth, r.hub) for r in res.scores.collect()}
    for v in nodes:
        if v in got:
            ga, gh = got[v]
            assert abs(ga - a_np[nodes.index(v)]) < 1e-12
            assert abs(gh - h_np[nodes.index(v)]) < 1e-12
        else:
            # isolated from both sides can't appear; every node here has an edge
            raise AssertionError(f"missing vertex {v}")
    # mass preservation: hubs sum to 1, auths sum to 1 (up to fp)
    assert abs(sum(h for _, h in got.values()) - 1.0) < 1e-9
    assert abs(sum(a for a, _ in got.values()) - 1.0) < 1e-9


def test_salsa_converges_on_star(spark):
    # star u->c for u in 1..5: auth mass all on the center immediately
    edges = [(u, 0) for u in range(1, 6)]
    df = spark.createDataFrame(edges, "src long, dst long")
    res = salsa(df, max_iters=10, tol=1e-12, check_every=2)
    assert res.converged
    got = {r.id: (r.auth, r.hub) for r in res.scores.collect()}
    assert abs(got[0][0] - 1.0) < 1e-12          # center holds all authority
    for u in range(1, 6):
        assert abs(got[u][1] - 0.2) < 1e-12      # hubs stay uniform


def test_conductance_two_triangles(spark):
    # triangles {0,1,2} and {3,4,5} bridged by 2-3
    tri = [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3)]
    edges = spark.createDataFrame(tri, "src long, dst long")
    labels = spark.createDataFrame(
        [(i, 0) for i in range(3)] + [(i, 1) for i in range(3, 6)], "id long, label long"
    )
    rows = {r.label: r for r in conductance_by_community(edges, labels).collect()}
    # vol = 3 triangle degrees (2+2+3... vertices 2 and 3 have deg 3) = 7
    for c in (0, 1):
        assert rows[c].n_vertices == 3
        assert rows[c].volume == 7
        assert rows[c].cut == 1
        assert rows[c].phi_micro == 1_000_000 // 7


def test_conductance_single_community_zero(spark):
    edges = spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long")
    labels = spark.createDataFrame([(0, 9), (1, 9), (2, 9)], "id long, label long")
    r = conductance_by_community(edges, labels).collect()[0]
    assert r.cut == 0 and r.phi_micro == 0  # min(vol, 2m-vol) == 0 guard


def test_fd_violations_closed_form(spark):
    rows = [
        (1, "a"), (1, "a"), (1, "b"),     # key 1: 3 rows, 2 rhs, fix 1
        (2, "x"), (2, "x"),               # key 2: clean
        (3, "p"), (3, "q"), (3, "q"), (3, "r"),  # key 3: 4 rows, 3 rhs, fix 2
    ]
    df = spark.createDataFrame(rows, "k long, v string")
    r = fd_violations(df, ["k"], "v").collect()[0]
    assert (r.n_keys, r.n_violating_keys, r.rows_to_fix) == (3, 2, 3)

"""Link prediction: brute-force Python oracle on seeded random graphs plus
a hand fixture, including the hub-center degree cap."""

import math

import pytest

from pagerank_spark.algos.linkpred import link_prediction_scores
from pagerank_spark.sources.graphs import er_edges_numpy


def _edges_df(spark, pairs):
    return spark.createDataFrame([(int(s), int(d)) for s, d in pairs], "src long, dst long")


def _brute(pairs, min_common=1, max_center_degree=None):
    adj = {}
    for s, d in pairs:
        s, d = int(s), int(d)
        if s == d:
            continue
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    deg = {v: len(n) for v, n in adj.items()}
    out = {}
    ids = sorted(adj)
    for i, u in enumerate(ids):
        for v in ids[i + 1:]:
            if v in adj[u]:
                continue
            common = adj[u] & adj[v]
            if max_center_degree is not None:
                common = {z for z in common if deg[z] <= max_center_degree}
            cn = len(common)
            if cn < min_common:
                continue
            aa = sum(1.0 / math.log(deg[z]) for z in common)
            out[(u, v)] = (cn, aa, cn / (deg[u] + deg[v] - cn))
    return out


def test_linkpred_square_fixture(spark):
    # 4-cycle 1-2-3-4: diagonals (1,3) and (2,4) each share 2 common
    # neighbors of degree 2; jaccard = 2 / (2+2-2) = 1
    df = _edges_df(spark, [(1, 2), (2, 3), (3, 4), (4, 1)])
    rows = {(r["a"], r["b"]): r for r in link_prediction_scores(df).collect()}
    assert set(rows) == {(1, 3), (2, 4)}
    for k, r in rows.items():
        assert r["cn"] == 2
        assert r["aa"] == pytest.approx(2.0 / math.log(2))
        assert r["jaccard"] == pytest.approx(1.0)


@pytest.mark.parametrize("min_common,cap", [(1, None), (2, None), (1, 6)])
def test_linkpred_matches_bruteforce(spark, min_common, cap):
    arr = er_edges_numpy(50, 250, seed=31)
    got = {
        (r["a"], r["b"]): (r["cn"], r["aa"], r["jaccard"])
        for r in link_prediction_scores(
            _edges_df(spark, arr), min_common=min_common, max_center_degree=cap
        ).collect()
    }
    exp = _brute(arr, min_common=min_common, max_center_degree=cap)
    assert set(got) == set(exp)
    for k, (cn, aa, jac) in exp.items():
        assert got[k][0] == cn, k
        assert got[k][1] == pytest.approx(aa, abs=1e-9), k
        assert got[k][2] == pytest.approx(jac, abs=1e-12), k

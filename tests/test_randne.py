"""RandNE embedding (operators/linalg.py::randne_embedding)."""

import numpy as np

from pagerank_spark.operators.linalg import randne_embedding


def _sign(i, j):
    return 1 - 2 * (((((i * 2654435761) % 4294967296) % 1000003 + j * 7919) * 2654435761) % 4294967296 % 2)


def test_randne_matches_numpy(spark):
    edges = [(0, 1), (1, 2), (2, 3), (3, 0), (0, 2), (2, 2), (1, 0)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    d = 4
    got = {(r["id"], r["dim"]): (r["e1"], r["e2"]) for r in randne_embedding(df, d=d).collect()}
    verts = sorted({x for e in edges for x in e if True})
    # undirected simple adjacency (self-loops dropped, duplicates collapsed)
    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    vs = sorted({x for e in und for x in e})
    idx = {v: i for i, v in enumerate(vs)}
    A = np.zeros((len(vs), len(vs)), dtype=np.int64)
    for a, b in und:
        A[idx[a], idx[b]] = 1
        A[idx[b], idx[a]] = 1
    R = np.array([[_sign(v, j) for j in range(d)] for v in vs], dtype=np.int64)
    E1, E2 = A @ R, A @ A @ R
    for v in vs:
        for j in range(d):
            want = (E1[idx[v], j], E2[idx[v], j])
            if want == (0, 0):
                assert (v, j) not in got
            else:
                assert got[(v, j)] == want, (v, j)


def test_randne_two_hop_separates_structure(spark):
    # a star's leaves share identical 2-hop rows (all walks go via the hub)
    edges = [(0, i) for i in range(1, 5)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    rows = randne_embedding(df, d=3).collect()
    leaf_e2 = {}
    for r in rows:
        if r["id"] != 0:
            leaf_e2.setdefault(r["id"], {})[r["dim"]] = r["e2"]
    vals = list(leaf_e2.values())
    assert all(v == vals[0] for v in vals)

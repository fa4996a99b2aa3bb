"""4-clique counting (algos/triangles.py::four_cliques_per_vertex)."""

from itertools import combinations

from pagerank_spark.algos.triangles import four_cliques_per_vertex


def _brute(edges, n):
    adj = {frozenset(e) for e in edges if e[0] != e[1]}
    verts = sorted({x for e in edges for x in e})
    per = {v: 0 for v in verts}
    total = 0
    for quad in combinations(verts, 4):
        if all(frozenset(p) in adj for p in combinations(quad, 2)):
            total += 1
            for v in quad:
                per[v] += 1
    return total, {v: c for v, c in per.items() if c}


def test_k5_complete_graph(spark):
    edges = [(a, b) for a in range(5) for b in range(5) if a < b]
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r["id"]: r["cliques4"] for r in four_cliques_per_vertex(df).collect()}
    # C(5,4) = 5 cliques, each vertex in C(4,3) = 4 of them
    assert got == {v: 4 for v in range(5)}


def test_matches_bruteforce_hash_graph(spark):
    edges = [((i * 7) % 23, (i * 11 + 3) % 23) for i in range(90)]
    # duplicated + reversed edges must not inflate counts
    edges += [(b, a) for a, b in edges[:20]]
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r["id"]: r["cliques4"] for r in four_cliques_per_vertex(df).collect()}
    _, want = _brute(edges, 23)
    assert got == want


def test_triangle_only_graph_has_none(spark):
    df = spark.createDataFrame([(0, 1), (1, 2), (2, 0)], ["src", "dst"])
    assert four_cliques_per_vertex(df).count() == 0

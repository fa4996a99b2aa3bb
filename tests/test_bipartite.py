"""Bipartiteness: even/odd cycles, star, path, parity values, self-loops."""

from pagerank_spark.algos.bipartite import bipartite_check


def _run(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {r.id: (r.comp, r.side, r.is_bipartite) for r in bipartite_check(df, **kw).collect()}


def test_even_cycle_is_bipartite_with_alternating_sides(spark):
    got = _run(spark, [(v, (v + 1) % 6) for v in range(6)], max_iters=16)
    assert all(c == 0 and b == 1 for c, _, b in got.values())
    assert {v: s for v, (_, s, _) in got.items()} == {v: v % 2 for v in range(6)}


def test_odd_cycle_flagged(spark):
    got = _run(spark, [(v, (v + 1) % 5) for v in range(5)], max_iters=24)
    assert all(c == 0 and b == 0 for c, _, b in got.values())


def test_mixed_components_and_star(spark):
    edges = (
        [(v, (v + 1) % 4) for v in range(4)]          # even ring: bipartite
        + [(10, 10 + i) for i in range(1, 4)]          # star: bipartite
        + [(20, 21), (21, 22), (22, 20)]               # triangle: odd
    )
    got = _run(spark, edges, max_iters=16)
    assert {got[v][2] for v in range(4)} == {1}
    assert {got[v][2] for v in (10, 11, 12, 13)} == {1}
    assert got[10][1] == 0 and all(got[v][1] == 1 for v in (11, 12, 13))
    assert {got[v][2] for v in (20, 21, 22)} == {0}
    assert [got[v][0] for v in (20, 21, 22)] == [20, 20, 20]


def test_self_loops_dropped(spark):
    got = _run(spark, [(0, 0), (0, 1)], max_iters=8)
    assert got == {0: (0, 0, 1), 1: (0, 1, 1)}

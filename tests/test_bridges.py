"""Bridge detection: brute-force removal parity + structure cases."""


def _brute_bridges(edges):
    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}

    def n_comp(es):
        parent = {}

        def find(x):
            while parent.setdefault(x, x) != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        verts = {v for e in und for v in e}
        for a, b in es:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[ra] = rb
        return len({find(v) for v in verts})

    base = n_comp(und)
    return {e for e in und if n_comp(und - {e}) > base}


def test_bridges_brute_force_parity(spark):
    from pagerank_spark.algos.bridges import bridges

    # two triangles joined by a 2-edge path, a pendant, a 4-cycle with a
    # chord, and an isolated bridge component
    edges = [
        (0, 1), (1, 2), (0, 2), (2, 3), (3, 4), (4, 5), (5, 6), (4, 6),
        (6, 7),                       # pendant
        (10, 11), (11, 12), (12, 13), (13, 10), (10, 12),  # chorded 4-cycle
        (20, 21),                     # isolated bridge
    ]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {(r.a, r.b) for r in bridges(df).collect() if r.is_bridge}
    assert got == _brute_bridges(edges)


def test_bridges_pure_tree_all_bridges(spark):
    from pagerank_spark.algos.bridges import bridges

    edges = [(i, i + 1) for i in range(10)]
    df = spark.createDataFrame(edges, "src long, dst long")
    out = bridges(df).collect()
    assert all(r.is_bridge == 1 for r in out)
    assert len(out) == 10


def test_bridges_cycle_none(spark):
    from pagerank_spark.algos.bridges import bridges

    edges = [(i, (i + 1) % 8) for i in range(8)]
    df = spark.createDataFrame(edges, "src long, dst long")
    assert all(r.is_bridge == 0 for r in bridges(df).collect())


def test_two_edge_components_barbell(spark):
    from pagerank_spark.algos.bridges import two_edge_components

    edges = [(0, 1), (1, 2), (0, 2), (2, 3), (3, 4), (4, 5), (5, 6), (4, 6)]
    got = {r.id: r.component for r in two_edge_components(
        spark.createDataFrame(edges, "src long, dst long")).collect()}
    # triangles survive; 3 is isolated by its two bridges
    assert got[0] == got[1] == got[2]
    assert got[4] == got[5] == got[6]
    assert got[3] not in (got[0], got[4])


def test_bridges_diameter_overflow_raises_not_mislabels(spark):
    import pytest

    from pagerank_spark.algos.bridges import bridges

    # 30-edge path with max_iters=5: rooting cannot finish — must raise,
    # never silently report non-bridges
    edges = [(i, i + 1) for i in range(30)]
    df = spark.createDataFrame(edges, "src long, dst long")
    with pytest.raises(ValueError, match="unassigned"):
        bridges(df, max_iters=5)


def test_bridges_tag_no_structured_collisions(spark):
    # Regression (round-5 advice): the old tag pre-modded endpoints by 2^20,
    # so edges whose endpoints differ by multiples of 2^20 got IDENTICAL
    # tags — two such edges crossing the same cut cancel and mislabel a
    # tree edge as a bridge. Assert the mix now separates those edges, and
    # that bridges() stays brute-force-correct on a >2^20-id graph where
    # the only cycle is closed by two formerly-colliding edges.
    from pyspark.sql import functions as F

    from pagerank_spark.algos.bridges import _TAG, bridges

    m = 1 << 20
    pairs = [(5, 9), (5 + m, 9), (5, 9 + m), (5 + 7 * m, 9 + 3 * m)]
    tags = [
        r.t
        for r in spark.createDataFrame(pairs, "a long, b long")
        .select(F.expr(_TAG).alias("t"))
        .collect()
    ]
    assert len(set(tags)) == len(pairs)

    # path 0-x-y-z plus non-tree edges (0,y) and (x,z): with colliding tags
    # t(0,y)==t(x,z) the x-y tree edge's cut XOR would vanish -> false
    # bridge. Use ids spread past 2^20 so the old scheme would collide when
    # endpoints are congruent mod 2^20.
    x, y, z = m + 1, 2 * m + 2, 3 * m + 3
    edges = [(0, x), (x, y), (y, z), (0, y), (x, z)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {(r.a, r.b) for r in bridges(df).collect() if r.is_bridge}
    assert got == _brute_bridges(edges)

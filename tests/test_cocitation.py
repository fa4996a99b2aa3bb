"""Co-citation / bibliographic coupling: planted closed-form graph, hub cap,
mode duality, exact cosine normalization."""

from pagerank_spark.operators.graphstats import cocitation


def _run(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {
        (r.a, r.b): (r.weight, r.deg_a, r.deg_b, r.cos2_micro)
        for r in cocitation(df, **kw).collect()
    }


# sources 0,1,2 each cite both 10 and 11; source 3 cites 10 only;
# source 4 cites 11 and 12.
EDGES = [
    (0, 10), (0, 11),
    (1, 10), (1, 11),
    (2, 10), (2, 11),
    (3, 10),
    (4, 11), (4, 12),
]


def test_cocitation_counts_and_cosine(spark):
    got = _run(spark, EDGES)
    # deg(10)=4 citers (0,1,2,3), deg(11)=4 (0,1,2,4), deg(12)=1 (4)
    # w(10,11)=3 -> cos2_micro = 9e6 // 16 = 562500
    # w(11,12)=1 -> cos2_micro = 1e6 // 4  = 250000
    assert got == {
        (10, 11): (3, 4, 4, 562500),
        (11, 12): (1, 4, 1, 250000),
    }


def test_coupling_is_cocitation_on_reversed_edges(spark):
    rev = [(d, s) for s, d in EDGES]
    assert _run(spark, rev, mode="coupling") == _run(spark, EDGES)


def test_min_weight_prunes_after_count(spark):
    got = _run(spark, EDGES, min_weight=2)
    assert set(got) == {(10, 11)}


def test_hub_cap_drops_big_sources_before_join(spark):
    # source 99 cites 20 items: a hub that would add C(20,2) pairs
    hub = [(99, 100 + i) for i in range(20)]
    capped = _run(spark, EDGES + hub, max_hub_degree=10)
    assert capped == _run(spark, EDGES)
    uncapped = _run(spark, EDGES + hub)
    assert len(uncapped) == 2 + 190


def test_duplicate_edges_and_self_loops_ignored(spark):
    noisy = EDGES + [(0, 10), (0, 10), (5, 5)]
    assert _run(spark, noisy) == _run(spark, EDGES)

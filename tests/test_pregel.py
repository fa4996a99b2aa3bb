"""Generic Pregel engine vs the specialized kernels (exact/allclose parity)."""

import math

from pyspark.sql import functions as F

from pagerank_spark.algos.pregel import (
    aggregate_messages,
    edge,
    global_agg,
    msg,
    pregel,
    src,
)


def _er(spark):
    from pagerank_spark.sources.graphs import er_graph

    return er_graph(spark, v=400, e=1500, seed=7)  # leaves some dangling vertices


def test_pregel_pagerank_matches_kernel(spark):
    from pagerank_spark.algos.pagerank import pagerank, prepare_edges
    from pagerank_spark.operators.degrees import degree_table

    edges = _er(spark)
    deg = degree_table(edges).persist()
    n = deg.count()
    d, k = 0.85, 5
    ep = prepare_edges(edges, deg, 8, "join")
    verts = deg.select("id", (F.col("out_degree") == 0).alias("dang"))
    res = pregel(
        verts,
        ep,
        init={"rank": F.lit(1.0 / n), "dang": F.col("dang")},
        msg_to_dst=src("rank") * edge("coef"),
        agg=F.sum(msg()),
        update={
            "rank": F.lit((1.0 - d) / n)
            + F.lit(d) * F.coalesce(msg(), F.lit(0.0))
            + F.lit(d) * global_agg("dm") / F.lit(float(n))
        },
        global_aggs={"dm": F.sum(F.when(F.col("dang"), F.col("rank")).otherwise(0.0))},
        max_iters=k,
        check_every=3,
    )
    want = {r.id: r.rank for r in pagerank(edges, max_iters=k, tol=0.0).ranks.collect()}
    got = {r.id: r.rank for r in res.vertices.collect()}
    assert set(got) == set(want)
    assert all(math.isclose(got[i], want[i], rel_tol=1e-11, abs_tol=1e-14) for i in got)
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_pregel_cc_matches_components(spark):
    from pagerank_spark.algos.components import connected_components

    edges = _er(spark)
    sym = edges.select("src", "dst").unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).dropDuplicates(["src", "dst"])
    verts = sym.select(F.col("src").alias("id")).dropDuplicates()
    res = pregel(
        verts,
        sym,
        init={"component": F.col("id")},
        msg_to_dst=src("component"),
        agg=F.min(msg()),
        update={"component": F.least(F.col("component"), F.coalesce(msg(), F.col("component")))},
        max_iters=64,
        check_every=8,
        until_converged=True,
    )
    assert res.converged
    want = {r.id: r.component for r in connected_components(edges).collect()}
    got = {r.id: r.component for r in res.vertices.collect()}
    assert got == want


def test_pregel_sssp_matches_bellman_ford(spark):
    from pagerank_spark.algos.paths import shortest_paths

    edges = _er(spark)
    verts = (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .dropDuplicates()
    )
    res = pregel(
        verts,
        edges.select("src", "dst"),
        init={"dist": F.when(F.col("id") == 0, F.lit(0.0))},  # NULL = unreached
        msg_to_dst=src("dist") + F.lit(1.0),
        agg=F.min(msg()),
        update={"dist": F.least(F.col("dist"), msg())},
        max_iters=64,
        check_every=8,
        until_converged=True,
    )
    src_df = spark.createDataFrame([(0,)], "id long")
    want = {r.id: r.dist for r in shortest_paths(edges, src_df, max_iters=64).collect()}
    got = {r.id: r.dist for r in res.vertices.filter(F.col("dist").isNotNull()).collect()}
    assert got == want


def test_aggregate_messages_degrees(spark):
    from pagerank_spark.operators.degrees import degree_table

    edges = _er(spark)
    verts = (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .dropDuplicates()
    )
    am = aggregate_messages(
        verts, edges.select("src", "dst"), agg=F.sum(msg()),
        msg_to_dst=F.lit(1), msg_to_src=F.lit(1),
    )
    got = {r["id"]: r["__pregel_msg__"] for r in am.collect()}
    want = {
        r.id: r.out_degree + r.in_degree
        for r in degree_table(edges).collect()
        if r.out_degree + r.in_degree > 0
    }
    assert got == want


def test_pregel_until_converged_stops_early(spark):
    # a 4-chain converges in <= 4 min-label rounds; max_iters=40 must not run
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4)], "src long, dst long"
    )
    sym = edges.unionByName(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    verts = sym.select(F.col("src").alias("id")).dropDuplicates()
    res = pregel(
        verts,
        sym,
        init={"component": F.col("id")},
        msg_to_dst=src("component"),
        agg=F.min(msg()),
        update={"component": F.least(F.col("component"), F.coalesce(msg(), F.col("component")))},
        max_iters=40,
        check_every=4,
        until_converged=True,
    )
    assert res.converged and res.iterations <= 12
    assert all(r.component == 1 for r in res.vertices.collect())

"""Physical-plan assertions: the optimizations we claim are actually in the
executed plans (predicate pushdown to the parquet scan, column pruning,
shuffle-hash gather join, map-side partial aggregation)."""

import os

import pytest
from pyspark.sql import functions as F

from pagerank_spark.algos.pagerank import _superstep, prepare_edges
from pagerank_spark.operators.degrees import degree_table
from pagerank_spark.sources.graphs import er_edges_numpy, events_graph

SF = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(not os.path.isdir(SF), reason="testdata not present")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_parquet_filter_pushdown_and_pruning(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    q = li.filter(F.col("l_shipdate") <= F.lit("1998-09-02")).select("l_orderkey", "l_quantity")
    plan = _plan(q)
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # column pruning: the scan reads only the 3 needed columns
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "l_orderkey" in read_schema and "l_shipdate" in read_schema
    assert "l_extendedprice" not in read_schema and "l_partkey" not in read_schema


def test_events_graph_scan_pruned(spark):
    plan = _plan(events_graph(spark, SF))
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    for col in ("event_id", "user_id", "ts"):
        assert col in read_schema
    for col in ("event_type", "value", "props"):
        assert col not in read_schema


def test_triangles_per_vertex_single_orientation_subtree(spark):
    """The oriented edge set is referenced 3x (e1, e2, closer); it must be
    materialized once (localCheckpoint leaf), so the final plan holds ONLY
    the 2 wedge joins — an inlined orientation would re-run its 2 joins per
    reference (8 joins total) and recompute the degree agg 3x."""
    from pagerank_spark.algos.triangles import triangles_per_vertex

    arr = er_edges_numpy(120, 600, seed=4)
    edges = spark.createDataFrame([(int(s), int(d)) for s, d in arr], "src long, dst long")
    per = triangles_per_vertex(edges)
    plan = _plan(per)
    assert plan.count("Join") == 2, plan
    # all three references read the checkpointed RDD leaf
    assert "ExistingRDD" in plan or "Scan ExistingRDD" in plan


def test_superstep_plan_shape(spark):
    arr = er_edges_numpy(200, 1000, seed=2)
    edges = spark.createDataFrame([(int(s), int(d)) for s, d in arr], "src long, dst long")
    p = 8
    deg = degree_table(edges).repartition(p, "id").persist()
    n = deg.count()
    edges_p = prepare_edges(edges, deg, p, "join").persist()
    edges_p.count()
    state = deg.select(
        "id", F.lit(1.0 / n).alias("rank"), F.lit(1.0 / n).alias("prev_rank"),
        (F.col("out_degree") == 0).alias("dang"),
    ).localCheckpoint()
    ns = _superstep(edges_p, state, "join", p, 0.85, 0.15 / n, n, True)
    plan = _plan(ns)
    # gather join honors the shuffle_hash hint (state is never broadcastable
    # at target scale; SHJ avoids per-iteration SMJ sorts)
    assert "ShuffledHashJoin" in plan
    # the per-dst sum does map-side partial aggregation before the exchange
    assert "partial_sum" in plan
    # edges come from the persisted cache, not a fresh scan
    assert "InMemoryTableScan" in plan
    edges_p.unpersist()
    deg.unpersist()


def test_decontaminate_broadcasts_eval_grams(spark):
    from pagerank_spark.operators.trainprep import decontaminate

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    ev = docs.filter(F.col("doc_id") % 37 == 0)
    plan = _plan(decontaminate(docs, ev, n=13))
    # the eval gram dictionary is the BROADCAST side; the train corpus is
    # never broadcast and its text is never shuffled
    assert "BroadcastHashJoin" in plan
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "doc_id" in read_schema and "text" in read_schema
    assert "lang" not in read_schema and "source" not in read_schema


def test_tfidf_broadcasts_vocabulary(spark):
    from pagerank_spark.operators.trainprep import tfidf_top_terms

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _plan(tfidf_top_terms(docs, k=3))
    assert "BroadcastHashJoin" in plan  # df vocabulary joined broadcast-side


def test_pmi_single_pass_over_pairs(spark):
    from pagerank_spark.algos.walks import pmi_scores

    pairs = spark.createDataFrame([(1, 2, 3), (2, 1, 3)], ["center", "context", "cnt"])
    plan = _plan(pmi_scores(pairs))
    # both marginals and the total ride broadcast joins: no sort-merge or
    # shuffled hash join re-keys the pair table
    assert plan.count("BroadcastHashJoin") >= 2
    assert "BroadcastNestedLoopJoin" in plan or "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan


def test_dedup_paragraphs_no_exchange(spark):
    from pagerank_spark.operators.trainprep import dedup_paragraphs

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _plan(dedup_paragraphs(docs))
    # pure per-row projection: no shuffle anywhere
    assert "Exchange" not in plan


def test_multi_ppr_state_lineage_truncated(spark):
    from pagerank_spark.algos.ppr import multi_ppr

    edges = spark.createDataFrame([(i, (i + 1) % 12) for i in range(12)], ["src", "dst"])
    seeds = spark.createDataFrame([(0,), (3,)], ["id"])
    res = multi_ppr(edges, seeds, iters=6, num_partitions=4)
    plan = _plan(res.ranks)
    # per-superstep localCheckpoint: the returned state is a flat RDD scan,
    # NOT a 6-superstep join tree (the exponential-plan-growth discipline)
    assert "Scan ExistingRDD" in plan
    assert "Join" not in plan


def test_gnn_gather_stays_in_hash_joins(spark):
    from pagerank_spark.algos.gnn import neighborhood_mean

    edges = spark.createDataFrame([(i, (i + 1) % 10) for i in range(10)], ["src", "dst"])
    feats = spark.createDataFrame([(i, [float(i), 1.0]) for i in range(10)], ["id", "embedding"])
    plan = _plan(neighborhood_mean(edges, feats, hops=2, num_partitions=4))
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    # per-dimension partial aggregation (map-side combine) before the shuffle
    assert "partial_avg" in plan or "HashAggregate" in plan


def test_tpch_q5_q10_join_strategy(spark):
    """Q5: the dimension chain (region->nation->supplier, customer) must
    come in as broadcast joins with no sort-merge anywhere at gate scale;
    Q10's top-20 must be a TakeOrderedAndProject, not a global sort."""
    import __spark_entry__ as entry

    p5 = _plan(entry.q_tpch_q5(spark, SF))
    assert p5.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in p5
    p10 = _plan(entry.q_tpch_q10(spark, SF))
    assert "TakeOrderedAndProject" in p10
    assert p10.count("BroadcastHashJoin") >= 1


def test_tpch_dim_chains_broadcast(spark):
    """The round-4 TPC-H additions keep every dimension chain broadcast at
    gate scale (no sort-merge joins), and the nested-subquery flavors
    (Q16 NOT IN, Q20 double IN) compile to broadcast anti/semi joins
    rather than shuffled ones."""
    import __spark_entry__ as entry

    for q in (entry.q_tpch_q8, entry.q_tpch_q9, entry.q_tpch_q16, entry.q_tpch_q20):
        p = _plan(q(spark, SF))
        assert "SortMergeJoin" not in p, q.__name__
        assert p.count("BroadcastHashJoin") >= 2, q.__name__
    p16 = _plan(entry.q_tpch_q16(spark, SF))
    assert "LeftAnti" in p16
    p20 = _plan(entry.q_tpch_q20(spark, SF))
    assert "LeftSemi" in p20

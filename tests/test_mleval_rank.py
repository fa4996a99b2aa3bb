

def test_map_mrr_hand_computed(spark):
    from pyspark.sql import functions as F

    from pagerank_spark.operators.mleval import map_mrr_at_k

    # ranks 1..6, relevant at 2, 3, 6
    rows = [(1, 0), (2, 1), (3, 2), (4, 0), (5, 0), (6, 1)]
    df = spark.createDataFrame(rows, "rank long, rel long")
    got = map_mrr_at_k(df, "rel", "rank", k=6).collect()[0]
    assert (got.n_ranked, got.n_rel, got.first_rel_rank) == (6, 3, 2)
    assert got.mrr_micro == 1_000_000 // 2
    # AP terms: (1*1e9)//2 + (2*1e9)//3 + (3*1e9)//6; / 3 relevant
    s = (1 * 10**9) // 2 + (2 * 10**9) // 3 + (3 * 10**9) // 6
    assert got.ap_nano == s // 3


def test_map_mrr_no_relevant_sentinels(spark):
    from pagerank_spark.operators.mleval import map_mrr_at_k

    df = spark.createDataFrame([(1, 0), (2, 0)], "rank long, rel long")
    got = map_mrr_at_k(df, "rel", "rank", k=10).collect()[0]
    assert (got.first_rel_rank, got.mrr_micro, got.ap_nano) == (0, 0, 0)
    assert (got.n_ranked, got.n_rel) == (2, 0)


def test_map_mrr_perfect_ranking(spark):
    from pagerank_spark.operators.mleval import map_mrr_at_k

    df = spark.createDataFrame([(1, 5), (2, 1), (3, 0)], "rank long, rel long")
    got = map_mrr_at_k(df, "rel", "rank", k=3).collect()[0]
    # graded labels binarize; prefix precisions are exactly 1
    assert got.mrr_micro == 1_000_000
    assert got.ap_nano == 1_000_000_000


def test_rbo_identical_and_disjoint(spark):
    from pagerank_spark.operators.mleval import rbo_at_k, rbo_weights

    a = spark.createDataFrame([(i, i) for i in range(1, 6)], "doc_id long, rank long")
    got = rbo_at_k(a, a, k=5, p=0.9).collect()[0]
    # identical lists: every doc contributes W[max(r,r)] = W[r]
    assert got.rbo_nano == sum(rbo_weights(5, 0.9)[r - 1] for r in range(1, 6))
    assert got.n_common == 5

    b = spark.createDataFrame([(100 + i, i) for i in range(1, 6)], "doc_id long, rank long")
    got2 = rbo_at_k(a, b, k=5, p=0.9).collect()[0]
    assert (got2.n_common, got2.rbo_nano) == (0, 0)


def test_rbo_partial_overlap_replay(spark):
    from pagerank_spark.operators.mleval import rbo_at_k

    # A: 1,2,3 ; B: 2,1,9 — X_1=0, X_2=2, X_3=2
    a = spark.createDataFrame([(1, 1), (2, 2), (3, 3)], "doc_id long, rank long")
    b = spark.createDataFrame([(2, 1), (1, 2), (9, 3)], "doc_id long, rank long")
    got = rbo_at_k(a, b, k=3, p=0.9).collect()[0]
    p = 0.9
    terms = [(1 - p) * p ** (d - 1) / d for d in (1, 2, 3)]
    # doc1: max(1,2)=2 -> W[2]; doc2: max(2,1)=2 -> W[2]
    w2 = round(sum(terms[1:]) * 1e9)
    assert got.rbo_nano == 2 * w2
    assert got.n_common == 2

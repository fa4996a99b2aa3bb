"""Item-item CF: hand-computed cosine pairs, basket cap, top-k ordering."""

from pagerank_spark.operators.recsys import item_cooccurrence, item_topk_similar

# baskets: 1:{A,B,C} 2:{A,B} 3:{A,B} 4:{C,D} 5:{A} (duplicate membership rows collapse)
ROWS = [
    (1, "A"), (1, "B"), (1, "C"), (1, "A"),
    (2, "A"), (2, "B"),
    (3, "A"), (3, "B"),
    (4, "C"), (4, "D"),
    (5, "A"),
]


def test_cooccurrence_exact(spark):
    df = spark.createDataFrame(ROWS, "b long, i string")
    out = {(r.item_a, r.item_b): (r.n_ab, r.n_a, r.n_b, r.cos2_micro)
           for r in item_cooccurrence(df, "b", "i").collect()}
    # n: A=4 B=3 C=2 D=1
    assert out[("A", "B")] == (3, 4, 3, 9 * 1_000_000 // 12)
    assert out[("A", "C")] == (1, 4, 2, 1_000_000 // 8)
    assert out[("B", "C")] == (1, 3, 2, 1_000_000 // 6)
    assert out[("C", "D")] == (1, 2, 1, 1_000_000 // 2)
    assert set(out) == {("A", "B"), ("A", "C"), ("B", "C"), ("C", "D")}


def test_topk_order_and_cap(spark):
    df = spark.createDataFrame(ROWS, "b long, i string")
    cooc = item_cooccurrence(df, "b", "i")
    top = {(r.item, r.rk): (r.rec, r.cos2_micro) for r in item_topk_similar(cooc, k=2).collect()}
    # A: B (750000) then C (125000)
    assert top[("A", 1)] == ("B", 750_000)
    assert top[("A", 2)] == ("C", 125_000)
    # C: D (500000) > B (166666) > A (125000) — k=2 keeps D, B
    assert top[("C", 1)] == ("D", 500_000)
    assert top[("C", 2)] == ("B", 166_666)
    # basket cap: dropping baskets > 2 removes basket 1 entirely
    capped = {(r.item_a, r.item_b): r.n_ab
              for r in item_cooccurrence(df, "b", "i", max_basket_size=2).collect()}
    assert capped == {("A", "B"): 2, ("C", "D"): 1}


def test_itemsim_plan_broadcasts_counts(spark):
    df = spark.createDataFrame(ROWS, "b long, i string")
    plan = item_cooccurrence(df, "b", "i")._jdf.queryExecution().executedPlan().toString()
    # item-count joins must be broadcast (items << baskets), never shuffled
    assert "BroadcastHashJoin" in plan


def test_hitrate_loo_hand_case(spark):
    from pagerank_spark.operators.recsys import (
        hitrate_loo,
        item_cooccurrence,
        item_topk_similar,
    )

    # items 1,2 always co-bought; baskets holding out 2 should hit via 1
    baskets = [
        (100, 1), (100, 2),
        (101, 1), (101, 2),
        (102, 1), (102, 2), (102, 3),  # holds out 3; recs of {1,2} = each other + 3
        (103, 9),                       # singleton: excluded from eval
    ]
    df = spark.createDataFrame(baskets, "basket long, item long")
    cooc = item_cooccurrence(df, "basket", "item")
    topk = item_topk_similar(cooc, k=3)
    got = hitrate_loo(df, topk).collect()[0]
    assert got.n_baskets == 4
    assert got.n_eval == 3
    # every evaluated basket hits: 100/101 hold out 2 (rec of 1);
    # 102 holds out 3 (3 co-occurs with 1 and 2)
    assert got.n_hits == 3
    assert got.hitrate_micro == 1_000_000


def test_hitrate_loo_no_eval_baskets(spark):
    from pagerank_spark.operators.recsys import hitrate_loo

    df = spark.createDataFrame([(1, 5), (2, 6)], "basket long, item long")
    topk = spark.createDataFrame([], "item long, rec long, n_ab long, cos2_micro long, rk int")
    got = hitrate_loo(df, topk).collect()[0]
    assert (got.n_baskets, got.n_eval, got.n_hits, got.hitrate_micro) == (2, 0, 0, 0)

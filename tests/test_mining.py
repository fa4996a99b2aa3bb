"""Frequent itemsets vs a brute-force pure-Python Apriori oracle."""

from itertools import combinations

import pytest
from pyspark.sql import functions as F

from pagerank_spark.operators.mining import frequent_itemsets


def _brute(baskets: dict[int, set[int]], minsup: int, max_size: int):
    want = {}
    for k in range(2, max_size + 1):
        counts = {}
        for items in baskets.values():
            for combo in combinations(sorted(items), k):
                counts[combo] = counts.get(combo, 0) + 1
        for combo, s in counts.items():
            if s >= minsup:
                want[combo] = s
    return want


def _collect(df):
    got = {}
    for r in df.collect():
        key = (r.a, r.b) if r.c is None else (r.a, r.b, r.c)
        assert r.size == len(key)
        got[key] = r.support
    return got


def _df(spark, baskets):
    rows = [(bid, it) for bid, items in baskets.items() for it in items]
    return spark.createDataFrame(rows, "basket_id long, item long")


def test_matches_bruteforce(spark):
    # seeded synthetic baskets with real overlap structure
    baskets = {
        bid: {(bid * 7 + i * i * 13) % 20 for i in range(2 + bid % 5)}
        for bid in range(60)
    }
    for minsup in (2, 5):
        got = _collect(frequent_itemsets(_df(spark, baskets), minsup=minsup))
        assert got == _brute(baskets, minsup, 3)


def test_duplicate_membership_collapses(spark):
    df = spark.createDataFrame(
        [(1, 10), (1, 10), (1, 20), (2, 10), (2, 20)], "basket_id long, item long"
    )
    got = _collect(frequent_itemsets(df, minsup=2))
    assert got == {(10, 20): 2}


def test_pairs_only_mode(spark):
    baskets = {0: {1, 2, 3}, 1: {1, 2, 3}, 2: {1, 2}}
    got = _collect(frequent_itemsets(_df(spark, baskets), minsup=2, max_size=2))
    assert got == {(1, 2): 3, (1, 3): 2, (2, 3): 2}


def test_hot_basket_cap_drops_whole_basket(spark):
    # two hot baskets so their items survive the level-1 prune at minsup=2
    baskets = {0: {1, 2}, 1: {1, 2}, 2: set(range(100, 150)), 3: set(range(100, 150))}
    capped = _collect(
        frequent_itemsets(_df(spark, baskets), minsup=2, max_basket_size=10)
    )
    # with the hot baskets dropped the only co-occurrence left is (1,2)x2
    assert capped == {(1, 2): 2}
    # uncapped mines the hot baskets' quadratic/cubic sets too
    full = _collect(frequent_itemsets(_df(spark, baskets), minsup=2))
    assert full[(1, 2)] == 2 and full[(100, 101)] == 2 and full[(100, 101, 102)] == 2


def test_minsup_validation(spark):
    df = spark.createDataFrame([(1, 1)], "basket_id long, item long")
    with pytest.raises(ValueError):
        frequent_itemsets(df, minsup=0)
    with pytest.raises(ValueError):
        frequent_itemsets(df, minsup=2, max_size=4)


def test_level1_prune_does_not_change_answer(spark):
    # an item below minsup must not suppress sets among frequent items
    baskets = {0: {1, 2, 99}, 1: {1, 2}, 2: {1, 2}}
    got = _collect(frequent_itemsets(_df(spark, baskets), minsup=3))
    assert got == {(1, 2): 3}


# -- sequential patterns (frequent_sequences) -------------------------------


def _brute_seq_support(rows, pat):
    """rows: (user, [items in order]); support of subsequence pat."""
    n = 0
    for _, seq in rows:
        it = iter(enumerate(seq))
        ok = True
        last = -1
        for p in pat:
            found = False
            for i in range(last + 1, len(seq)):
                if seq[i] == p:
                    last = i
                    found = True
                    break
            if not found:
                ok = False
                break
        if ok:
            n += 1
    return n


def test_frequent_sequences_matches_greedy_brute_force(spark):
    from pagerank_spark.operators.mining import frequent_sequences

    users = {
        1: list("abcab"),
        2: list("bac"),
        3: list("aabb"),
        4: list("cba"),
        5: list("abacus".replace("u", "a").replace("s", "b")),  # abacab
    }
    rows = [
        (u, i, ch) for u, seq in users.items() for i, ch in enumerate(seq)
    ]
    df = spark.createDataFrame(rows, "u long, pos long, it string")
    got = {
        (r.size, r.a, r.b, r.c): r.support
        for r in frequent_sequences(df, "u", "it", ["pos"], minsup=1).collect()
    }
    items = sorted({ch for seq in users.values() for ch in seq})
    urows = list(users.items())
    for a in items:
        for b in items:
            s2 = _brute_seq_support(urows, [a, b])
            assert got.get((2, a, b, "")) == (s2 if s2 >= 1 else None), (a, b)
            for c in items:
                s3 = _brute_seq_support(urows, [a, b, c])
                assert got.get((3, a, b, c)) == (s3 if s3 >= 1 else None), (a, b, c)


def test_frequent_sequences_minsup_filters(spark):
    from pagerank_spark.operators.mining import frequent_sequences

    rows = [(1, 0, "x"), (1, 1, "y"), (2, 0, "x"), (2, 1, "y"), (3, 0, "y"), (3, 1, "x")]
    df = spark.createDataFrame(rows, "u long, pos long, it string")
    got = {
        (r.size, r.a, r.b, r.c): r.support
        for r in frequent_sequences(df, "u", "it", ["pos"], minsup=2).collect()
    }
    assert got == {(2, "x", "y", ""): 2}

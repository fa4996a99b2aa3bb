"""Sorted-neighborhood blocking vs a brute-force sorted sliding window."""

import pytest

from pagerank_spark.operators.blocking import sorted_neighborhood_pairs


def _brute(rows, window):
    # rows: (id, key); total order = (key, id)
    order = [rid for _, rid in sorted((k, i) for i, k in rows)]
    want = {}
    for i, a in enumerate(order):
        for j in range(i + 1, min(i + window, len(order))):
            want[(a, order[j])] = j - i
    return want


def _collect(df):
    return {(r.a, r.b): r.gap for r in df.collect()}


def test_matches_bruteforce(spark):
    rows = [(i, (i * 37) % 11) for i in range(100)]  # heavy key ties
    df = spark.createDataFrame(rows, "id long, k long")
    for w in (2, 4, 7):
        got = _collect(sorted_neighborhood_pairs(df, ["k"], window=w))
        assert got == _brute(rows, w)


def test_pair_count_closed_form(spark):
    n, w = 64, 5
    df = spark.createDataFrame([(i, i) for i in range(n)], "id long, k long")
    got = sorted_neighborhood_pairs(df, ["k"], window=w).count()
    assert got == (w - 1) * n - w * (w - 1) // 2


def test_window_validation(spark):
    df = spark.createDataFrame([(1, 1)], "id long, k long")
    with pytest.raises(ValueError):
        sorted_neighborhood_pairs(df, ["k"], window=1)

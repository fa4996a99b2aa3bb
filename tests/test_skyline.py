"""Skyline: brute-force replay, duplicates, direction handling, guards."""

import random

import pytest

from pagerank_spark.operators.skyline import skyline


def _brute(rows, dirs):
    # rows: (id, v1..vk); dirs: '+1' for min, '-1' for max (sign-normalize)
    def norm(r):
        return tuple(d * v for d, v in zip(dirs, r[1:]))

    def dom(a, b):
        return all(x <= y for x, y in zip(a, b)) and any(
            x < y for x, y in zip(a, b)
        )

    return sorted(
        s[0] for s in rows if not any(dom(norm(r), norm(s)) for r in rows)
    )


def test_matches_bruteforce_3d_mixed(spark):
    random.seed(11)
    rows = [
        (i, random.randint(0, 25), random.randint(0, 25), random.randint(0, 25))
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "id long, x long, y long, z long")
    got = sorted(
        r.id
        for r in skyline(df, [("x", "min"), ("y", "max"), ("z", "min")]).collect()
    )
    assert got == _brute(rows, (1, -1, 1))


def test_duplicates_all_surface(spark):
    rows = [(1, 5, 5), (2, 5, 5), (3, 9, 9)]
    df = spark.createDataFrame(rows, "id long, x long, y long")
    got = sorted(r.id for r in skyline(df, [("x", "min"), ("y", "min")]).collect())
    assert got == [1, 2]


def test_single_criterion_is_min(spark):
    rows = [(1, 7), (2, 3), (3, 3), (4, 9)]
    df = spark.createDataFrame(rows, "id long, v long")
    got = sorted(r.id for r in skyline(df, [("v", "min")]).collect())
    assert got == [2, 3]


def test_constant_column_keeps_everything(spark):
    rows = [(i, 4) for i in range(6)]
    df = spark.createDataFrame(rows, "id long, v long")
    assert skyline(df, [("v", "max")]).count() == 6


def test_candidate_guard_raises(spark):
    # anti-correlated line: every row is on the skyline -> candidates = n
    rows = [(i, i, 100 - i) for i in range(50)]
    df = spark.createDataFrame(rows, "id long, x long, y long")
    with pytest.raises(ValueError, match="max_candidates"):
        skyline(df, [("x", "min"), ("y", "min")], max_candidates=10)


def test_bad_args(spark):
    df = spark.createDataFrame([(1, 2)], "id long, v long")
    with pytest.raises(ValueError):
        skyline(df, [])
    with pytest.raises(ValueError):
        skyline(df, [("v", "up")])
    with pytest.raises(ValueError):
        skyline(df, [("v", "min")], grid=1)

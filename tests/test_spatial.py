"""Grid radius join vs brute-force all-pairs."""

import pytest
from pyspark.sql import functions as F

from pagerank_spark.operators.spatial import radius_join


def _points(n, mx=200, my=137):
    return [(i, (i * mx) % 500, (i * my) % 500) for i in range(n)]


def _brute(pts, r):
    want = {}
    for i, (a, ax, ay) in enumerate(pts):
        for b, bx, by in pts[i + 1 :]:
            d2 = (ax - bx) ** 2 + (ay - by) ** 2
            if d2 <= r * r:
                want[(a, b)] = d2
    return want


def _collect(df):
    return {(r.a, r.b): r.dist2 for r in df.collect()}


def test_matches_bruteforce(spark):
    pts = _points(300)
    df = spark.createDataFrame(pts, "id long, x long, y long")
    for r in (5, 23, 60):
        assert _collect(radius_join(df, r)) == _brute(pts, r)


def test_cell_boundary_pairs_found(spark):
    # pairs straddling cell borders (the 3x3 probe requirement)
    pts = [(1, 9, 9), (2, 10, 10), (3, 19, 0), (4, 21, 0), (5, 100, 100)]
    df = spark.createDataFrame(pts, "id long, x long, y long")
    got = _collect(radius_join(df, 10))
    assert got == {(1, 2): 2, (3, 4): 4}


def test_negative_coordinates(spark):
    # floor (not truncate) cell math must hold across the origin
    pts = [(1, -1, -1), (2, 1, 1), (3, -50, -50)]
    df = spark.createDataFrame(pts, "id long, x long, y long")
    assert _collect(radius_join(df, 5)) == {(1, 2): 8}


def test_hot_cell_cap(spark):
    pts = [(i, 3, 4) for i in range(30)] + [(100, 200, 200), (101, 201, 201)]
    df = spark.createDataFrame(pts, "id long, x long, y long")
    capped = _collect(radius_join(df, 10, max_cell_size=5))
    assert capped == {(100, 101): 2}
    full = _collect(radius_join(df, 10))
    assert len(full) == 30 * 29 // 2 + 1


def test_radius_validation(spark):
    df = spark.createDataFrame([(1, 0, 0)], "id long, x long, y long")
    with pytest.raises(ValueError):
        radius_join(df, 0)

"""Hilbert key: exact xy2d replay + curve-adjacency locality property."""

import pytest
from pyspark.sql import functions as F

from pagerank_spark.functions.layout import hilbert_key


def _xy2d(n: int, x: int, y: int) -> int:
    d, s = 0, n // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x, y = s - 1 - x, s - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_matches_reference_full_grid(spark):
    order, n = 4, 16
    pts = [(x, y) for x in range(n) for y in range(n)]
    df = spark.createDataFrame(pts, "x long, y long")
    got = {
        (r.x, r.y): r.h
        for r in df.select("x", "y", hilbert_key(F.col("x"), F.col("y"), order).alias("h")).collect()
    }
    assert got == {(x, y): _xy2d(n, x, y) for x, y in pts}
    # a space-filling curve is a bijection onto [0, n^2)
    assert sorted(got.values()) == list(range(n * n))


def test_consecutive_keys_are_grid_neighbors(spark):
    # the defining Hilbert property (false for Z-order): |d(p)-d(q)|=1
    # implies p, q are 4-neighbors on the grid
    order, n = 4, 16
    pts = [(x, y) for x in range(n) for y in range(n)]
    inv = {_xy2d(n, x, y): (x, y) for x, y in pts}
    for d in range(n * n - 1):
        (x1, y1), (x2, y2) = inv[d], inv[d + 1]
        assert abs(x1 - x2) + abs(y1 - y2) == 1


def test_order_validation(spark):
    with pytest.raises(ValueError):
        hilbert_key(F.lit(0), F.lit(0), order=16)

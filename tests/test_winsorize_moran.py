"""Winsorize audit + Moran's I: exact closed-form replays."""

import math

from pagerank_spark.operators.outliers import winsorize
from pagerank_spark.operators.spatial import morans_i


def test_winsorize_closed_form(spark):
    vals = list(range(1, 101))  # 1..100: p10 cut = 10, p90 cut = 90
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    r = winsorize(df, "v", (10, 100), (90, 100)).collect()[0]
    assert (r.n, r.lo_cut, r.hi_cut) == (100, 10, 90)
    assert (r.n_clamped_lo, r.n_clamped_hi) == (9, 10)
    exp_after = sum(max(min(v, 90), 10) for v in vals)
    assert (r.sum_before, r.sum_after) == (sum(vals), exp_after)


def _moran_py(cells):
    n = len(cells)
    s = sum(cells.values())
    dev = {c: n * v - s for c, v in cells.items()}
    adj = [
        (dev[a], dev[b])
        for a in cells
        for b in cells
        if abs(a[0] - b[0]) + abs(a[1] - b[1]) == 1
    ]
    w = len(adj)
    num = sum(da * db for da, db in adj)
    den = sum(d * d for d in dev.values())
    return n, w, num, den, math.floor(float(n) * num / (float(w) * den) * 1e6 + 0.5)


def test_morans_i_positive_gradient(spark):
    # 3x3 grid of cells (cell_size=1), value = smooth gradient cx+cy scaled
    pts = [(cx, cy, 10 * (cx + cy) + 1) for cx in range(3) for cy in range(3)]
    df = spark.createDataFrame(pts, "x long, y long, v long")
    r = morans_i(df, "x", "y", "v", 1).collect()[0]
    cells = {(cx, cy): 10 * (cx + cy) + 1 for cx in range(3) for cy in range(3)}
    n, w, num, den, i_micro = _moran_py(cells)
    assert (r.n_cells, r.w_pairs, r.num, r.den, r.i_micro) == (n, w, num, den, i_micro)
    assert r.i_micro > 0  # smooth field: positive autocorrelation


def test_morans_i_checkerboard_negative(spark):
    pts = [(cx, cy, 100 if (cx + cy) % 2 == 0 else 0) for cx in range(4) for cy in range(4)]
    df = spark.createDataFrame(pts, "x long, y long, v long")
    r = morans_i(df, "x", "y", "v", 1).collect()[0]
    assert r.i_micro < 0  # alternating field: negative autocorrelation


def test_morans_i_no_neighbors_null(spark):
    pts = [(0, 0, 5), (10, 10, 9)]  # isolated cells at cell_size=1
    df = spark.createDataFrame(pts, "x long, y long, v long")
    r = morans_i(df, "x", "y", "v", 1).collect()[0]
    assert r.w_pairs == 0 and r.i_micro is None

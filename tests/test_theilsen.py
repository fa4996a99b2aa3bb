"""Theil-Sen: brute-force pairwise-slope median replay."""

import math

from pagerank_spark.operators.regress import theil_sen


def _ts_py(series):
    slopes = sorted(
        math.floor(1_000_000.0 * (x2 - x1) / (t2 - t1))
        for i, (t1, x1) in enumerate(series)
        for (t2, x2) in series[i + 1 :]
        if t2 > t1
    )
    n = len(slopes)
    return n, slopes[(n + 1) // 2 - 1]  # lower median, 1-indexed ceil(n/2)


def test_theilsen_matches_bruteforce(spark):
    series = {
        1: [(1, 10), (2, 13), (4, 20), (7, 28), (9, 31)],       # rising
        2: [(1, 50), (3, 44), (5, 41), (6, 35)],                # falling (negative floor)
        3: [(2, 7), (5, 7), (9, 7)],                            # flat
    }
    rows = [(k, t, x) for k, pts in series.items() for t, x in pts]
    df = spark.createDataFrame(rows, "k long, t long, x long")
    got = {r.grp: r for r in theil_sen(df, "k", "t", "x").collect()}
    for k, pts in series.items():
        n, med = _ts_py(sorted(pts))
        assert (got[k].n_pairs, got[k].med_slope_micro) == (n, med)
    assert got[2].med_slope_micro < 0
    assert got[3].med_slope_micro == 0

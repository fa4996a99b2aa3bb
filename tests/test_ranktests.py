"""KS / Kruskal-Wallis / Pettitt: SciPy-free exact closed-form replays."""

import math
from collections import Counter

from pagerank_spark.operators.ranktests import (
    kruskal_wallis,
    ks_two_sample,
    pettitt_test,
)


def _ks_py(xs, ys):
    na, nb = len(xs), len(ys)
    pooled = sorted(set(xs) | set(ys))
    d_num = max(
        abs(nb * sum(1 for x in xs if x <= v) - na * sum(1 for y in ys if y <= v))
        for v in pooled
    )
    return na, nb, d_num, d_num * 1_000_000 // (na * nb)


def test_ks_matches_replay(spark):
    xs = [1, 2, 2, 3, 5, 8, 8, 9]
    ys = [2, 4, 4, 6, 7, 7]
    rows = [("a", v) for v in xs] + [("b", v) for v in ys] + [("c", 99)]
    df = spark.createDataFrame(rows, "g string, v long")
    r = ks_two_sample(df, "g", "v", "a", "b").collect()[0]
    assert (r.n_a, r.n_b, r.d_num, r.d_micro) == _ks_py(xs, ys)


def test_ks_identical_distributions_zero(spark):
    xs = [3, 1, 4, 1, 5]
    rows = [("a", v) for v in xs] + [("b", v) for v in xs]
    df = spark.createDataFrame(rows, "g string, v long")
    r = ks_two_sample(df, "g", "v", "a", "b").collect()[0]
    assert r.d_num == 0 and r.d_micro == 0


def _kw_py(groups):
    """Pure-Python tie-corrected Kruskal-Wallis via the same doubled-rank
    milli-term algebra (shared floor(x+0.5) rounding)."""
    pooled = sorted(v for vs in groups.values() for v in vs)
    n = len(pooled)
    cnt = Counter(pooled)
    cum, r2 = 0, {}
    for v in sorted(cnt):
        cum += cnt[v]
        r2[v] = 2 * cum - cnt[v] + 1
    h_milli = 0
    for vs in groups.values():
        d = sum(r2[v] for v in vs) - len(vs) * (n + 1)
        h_milli += math.floor(float(d) * d / len(vs) * 1000.0 + 0.5)
    tie_num = sum(t * t * t - t for t in cnt.values())
    h = 3.0 * h_milli / 1000.0 / (float(n) * (n + 1.0))
    denom = float(n) * n * n - n
    return (
        n,
        len(groups),
        tie_num,
        h_milli,
        math.floor(h * 1e6 + 0.5),
        math.floor(h * denom / (denom - tie_num) * 1e6 + 0.5),
    )


def test_kruskal_matches_replay(spark):
    groups = {
        "a": [27, 2, 4, 18, 7, 9],
        "b": [20, 8, 14, 36, 21, 22],
        "c": [34, 31, 3, 23, 30, 21],  # 21 ties across b/c
    }
    rows = [(g, v) for g, vs in groups.items() for v in vs]
    df = spark.createDataFrame(rows, "g string, v long")
    r = kruskal_wallis(df, "g", "v").collect()[0]
    assert (r.n, r.k, r.tie_num, r.h_milli_sum, r.h_micro, r.hc_micro) == _kw_py(groups)


def test_kruskal_identical_groups_zero(spark):
    rows = [("a", v) for v in [5, 5, 5]] + [("b", v) for v in [5, 5, 5]]
    df = spark.createDataFrame(rows, "g string, v long")
    r = kruskal_wallis(df, "g", "v").collect()[0]
    # every value tied: all doubled ranks equal n+1, H == 0
    assert r.h_milli_sum == 0 and r.h_micro == 0


def _pettitt_py(series):
    xs = [x for _, x in sorted(series)]
    ts = [t for t, _ in sorted(series)]
    n = len(xs)
    best_k, best_t = -1, None
    u = 0
    for t in range(1, n + 1):
        u += sum(
            (1 if xs[j] > xs[t - 1] else -1 if xs[j] < xs[t - 1] else 0)
            for j in range(n)
        )
        if abs(u) > best_k:
            best_k, best_t = abs(u), ts[t - 1]
    return n, best_k, best_t


def test_pettitt_matches_bruteforce(spark):
    # level shift at t=6: [5-ish] then [20-ish], with ties
    series = [
        (1, 5), (2, 7), (3, 5), (4, 6), (5, 7), (6, 20),
        (7, 22), (8, 19), (9, 20), (10, 25), (11, 18), (12, 22),
    ]
    df = spark.createDataFrame(series, "t long, x long")
    r = pettitt_test(df, "t", "x").collect()[0]
    n, k, t_star = _pettitt_py(series)
    assert (r.n, r.k_stat, r.t_star) == (n, k, t_star)
    assert r.t_star == 5  # last pre-shift index maximizes |U|


def test_pettitt_constant_series(spark):
    series = [(t, 9) for t in range(1, 8)]
    df = spark.createDataFrame(series, "t long, x long")
    r = pettitt_test(df, "t", "x").collect()[0]
    assert r.k_stat == 0 and r.t_star == 1  # earliest tie-break

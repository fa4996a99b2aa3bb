"""Decision-stump split finding: exact Python replay, NULL bins, argmax."""

from datetime import datetime

from pagerank_spark.operators.trees import best_stump, stump_candidates


def _pur(p, t):
    n = t - p
    return round((float(p) * p + float(n) * n) / t * 1_000_000)


def _replay(rows, feature):
    """rows = [(bin, y)] -> {thr: (t_l, p_l, t_r, p_r, purity, gain)}"""
    hist = {}
    for b, y in rows:
        if b is None:
            continue
        t, p = hist.get(b, (0, 0))
        hist[b] = (t + 1, p + int(y))
    bins = sorted(hist)
    t_all = sum(t for t, _ in hist.values())
    p_all = sum(p for _, p in hist.values())
    parent = _pur(p_all, t_all)
    out, tl, pl = {}, 0, 0
    for b in bins[:-1]:
        tl += hist[b][0]
        pl += hist[b][1]
        pur = _pur(pl, tl) + _pur(p_all - pl, t_all - tl)
        out[(feature, b)] = (tl, pl, t_all - tl, p_all - pl, pur, pur - parent)
    return out


def test_stump_matches_python_replay(spark):
    # y correlates with f1 (f1 >= 2 -> positive); f2 is noise
    data = [(0, 0, 0), (1, 3, 0), (2, 1, 1), (3, 0, 1), (2, 2, 1), (0, 1, 0), (3, 3, 1)]
    df = spark.createDataFrame(data, "f1 long, f2 long, y long")
    got = {
        (r.feature, r.thr): (r.t_left, r.p_left, r.t_right, r.p_right, r.purity_micro, r.gain_micro)
        for r in stump_candidates(df, "y = 1", {"f1": "f1", "f2": "f2"}).collect()
    }
    want = _replay([(a, c) for a, _, c in data], "f1")
    want.update(_replay([(b, c) for _, b, c in data], "f2"))
    assert got == want
    # the perfect split exists on f1 at thr=1 (left all-neg, right all-pos)
    best = best_stump(df, "y = 1", {"f1": "f1", "f2": "f2"}).collect()[0]
    assert (best.feature, best.thr) == ("f1", 1)
    assert (best.p_left, best.p_right) == (0, 4)


def test_stump_null_bins_excluded_per_feature(spark):
    df = spark.createDataFrame(
        [(None, 0, 1), (1, 1, 0), (2, 0, 1), (3, 1, 0)], "f1 long, f2 long, y long"
    )
    got = stump_candidates(df, "y = 1", {"f1": "f1", "f2": "f2"}).collect()
    by_feat = {}
    for r in got:
        by_feat.setdefault(r.feature, []).append(r)
    # f1 histogram saw only 3 rows (NULL dropped); f2 saw all 4
    assert all(r.t_left + r.t_right == 3 for r in by_feat["f1"])
    assert all(r.t_left + r.t_right == 4 for r in by_feat["f2"])


def test_stump_gain_nonnegative_and_tiebreak(spark):
    # constant label: every split has gain ~0 (>= -1 micro-rounding slack);
    # tiebreak picks lexicographically smallest feature, smallest thr
    df = spark.createDataFrame([(i % 4, i % 3, 1) for i in range(12)], "a long, b long, y long")
    cand = stump_candidates(df, "y = 1", {"a": "a", "b": "b"}).collect()
    assert all(r.gain_micro >= -1 for r in cand)
    best = best_stump(df, "y = 1", {"a": "a", "b": "b"}).collect()[0]
    assert (best.feature, best.thr) == ("a", 0)

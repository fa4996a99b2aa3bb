"""Group z-score + naive backtest: exact closed-form replays."""

import math

from pagerank_spark.operators.encoding import group_zscore
from pagerank_spark.operators.temporal import naive_backtest


def test_zscore_closed_form(spark):
    rows = [("a", 0), ("a", 2), ("b", 5), ("b", 5), ("b", 8)]
    df = spark.createDataFrame(rows, "g string, v long")
    got = sorted(
        (r.g, r.v, r.z_micro) for r in group_zscore(df, "g", "v").collect()
    )
    # group a: mean 1, std 1 -> z = -1, +1
    assert got[0] == ("a", 0, -1_000_000)
    assert got[1] == ("a", 2, 1_000_000)
    # group b: n=3 s=18 q=114: z = (3v-18)/sqrt(3*114-324)
    for g, v, z in got[2:]:
        exp = math.floor((3.0 * v - 18) / math.sqrt(18.0) * 1e6 + 0.5)
        assert z == exp


def test_zscore_constant_group_null(spark):
    df = spark.createDataFrame([("c", 4), ("c", 4)], "g string, v long")
    assert all(r.z_micro is None for r in group_zscore(df, "g", "v").collect())


def test_naive_backtest_closed_form(spark):
    # key 'a': grid 0..6 with x = [0,1,3,6,10,15,21] (diffs 1..6)
    xs = [0, 1, 3, 6, 10, 15, 21]
    rows = [("a", t, x) for t, x in enumerate(xs)]
    # key 'b': single point -> no pairs at all
    rows.append(("b", 0, 99))
    df = spark.createDataFrame(rows, "k string, t long, x long")
    got = {r.grp: r for r in naive_backtest(df, "k", "t", "x", season_lag=3).collect()}
    a = got["a"]
    assert (a.n1, a.sae1) == (6, sum(abs(xs[i + 1] - xs[i]) for i in range(6)))
    assert a.mae1_micro == a.sae1 * 1_000_000 // 6
    exp_s = sum(abs(xs[i + 3] - xs[i]) for i in range(4))
    assert (a.ns, a.saes, a.maes_micro) == (4, exp_s, exp_s * 1_000_000 // 4)
    b = got["b"]
    assert (b.n1, b.mae1_micro, b.ns, b.maes_micro) == (0, None, 0, None)

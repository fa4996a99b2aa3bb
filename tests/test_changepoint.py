"""CUSUM change-point (operators/smoothing.py::changepoint)."""

from pagerank_spark.operators.smoothing import changepoint


def _py_cp(series):
    series = sorted(series)
    n = len(series)
    sn = sum(x for _, x in series)
    s = 0
    best = None
    for i, (t, x) in enumerate(series, start=1):
        s += x
        stat = abs(n * s - i * sn)
        key = (-stat, t)
        if best is None or key < best[0]:
            best = (key, (t, i, n, stat))
    return best[1]


def test_changepoint_step_series(spark):
    # level shift at t=50: 10 -> 30
    series = [(t, 10) for t in range(50)] + [(t, 30) for t in range(50, 100)]
    df = spark.createDataFrame(series, ["t", "x"])
    got = changepoint(df, "t", "x").collect()[0]
    want = _py_cp(series)
    assert (got["t_split"], got["i_split"], got["n"], got["stat"]) == want
    assert got["t_split"] == 49  # deviation peaks at the last pre-shift point


def test_changepoint_with_negative_values(spark):
    series = [(t, -5) for t in range(20)] + [(t, 5) for t in range(20, 40)]
    df = spark.createDataFrame(series, ["t", "x"])
    got = changepoint(df, "t", "x").collect()[0]
    assert (got["t_split"], got["i_split"], got["n"], got["stat"]) == _py_cp(series)


def test_changepoint_tiebreak_earliest(spark):
    # symmetric tent: stat ties at the two shoulders -> earliest t wins
    series = [(0, 0), (1, 2), (2, 0)]
    df = spark.createDataFrame(series, ["t", "x"])
    got = changepoint(df, "t", "x").collect()[0]
    assert (got["t_split"], got["i_split"], got["n"], got["stat"]) == _py_cp(series)

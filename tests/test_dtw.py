"""DTW fold: pure-Python DP replay, ordering, degenerate shapes."""

from datetime import datetime, timezone

import pytest

from pagerank_spark.operators.dtw import dtw_to_query

BIG = 1 << 60


def py_dtw(xs, qs):
    prev = [0] + [BIG] * len(qs)
    for x in xs:
        new = [BIG]
        for j, qv in enumerate(qs, 1):
            new.append(abs(x - qv) + min(new[-1], prev[j], prev[j - 1]))
        prev = new
    return prev[-1]


def _ts(i):
    return datetime.fromtimestamp(1700000000 + i * 60, tz=timezone.utc).replace(
        tzinfo=None
    )


def _run(spark, series_by_key, query, scale=1):
    rows = [
        (k, i, _ts(i), float(v))
        for k, xs in series_by_key.items()
        for i, v in enumerate(xs)
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, value double"
    )
    got = dtw_to_query(df, query, scale=scale).collect()
    return {r.user_id: (r.n_events, r.dtw) for r in got}


def test_matches_python_dp_replay(spark):
    q = [2, 5, 3]
    series = {1: [1, 2, 6, 5, 2], 2: [9], 3: [2, 5, 3], 4: [7, 7, 7, 7]}
    got = _run(spark, series, q)
    assert got == {k: (len(xs), py_dtw(xs, q)) for k, xs in series.items()}


def test_exact_match_is_zero(spark):
    assert _run(spark, {1: [4, 8, 1]}, [4, 8, 1]) == {1: (3, 0)}


def test_elastic_alignment_ignores_repeats(spark):
    # [1,1,1,5,5] vs [1,5]: warping absorbs the repeats, distance 0
    assert _run(spark, {1: [1, 1, 1, 5, 5]}, [1, 5])[1] == (5, 0)


def test_order_is_by_ts_then_tiebreak(spark):
    # same values, shuffled timestamps: DP must follow ts order
    rows = [(1, 0, _ts(2), 9.0), (1, 1, _ts(0), 1.0), (1, 2, _ts(1), 5.0)]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, value double"
    )
    got = dtw_to_query(df, [1, 5, 9], scale=1).collect()[0]
    assert (got.n_events, got.dtw) == (3, 0)


def test_scale_quantizes_before_fold(spark):
    got = _run(spark, {1: [0.004, 0.011]}, [0, 1], scale=100)
    # cents: [0, 1] vs query [0, 1] -> 0
    assert got[1] == (2, 0)


def test_empty_query_rejected(spark):
    df = spark.createDataFrame(
        [(1, 0, _ts(0), 1.0)],
        "user_id long, event_id long, ts timestamp, value double",
    )
    with pytest.raises(ValueError):
        dtw_to_query(df, [])

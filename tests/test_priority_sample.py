"""Priority sampling (operators/packing.py:priority_sample): exact integer
replay, grouped/global modes, repartition stability, weight proportionality."""

import pytest

from pagerank_spark.operators.packing import KNUTH, priority_sample

MIX = 2246822519
M31 = 1 << 31


def _mix31(v, salt):
    h1 = (v * KNUTH + salt) % M31
    h1 ^= h1 >> 15
    h2 = (h1 * MIX + 1) % M31
    return h2 ^ (h2 >> 13)


def _pri(i, w, salt=13):
    return (w << 31) // (_mix31(i, salt) + 1)


def _rows():
    return [(i, f"g{i % 3}", (i * 37) % 50 + 1) for i in range(200)]


def _df(spark):
    return spark.createDataFrame(_rows(), "doc_id long, grp string, w long")


def test_global_topk_matches_replay(spark):
    got = [(r["doc_id"], r["pri"]) for r in priority_sample(_df(spark), 10, "w").collect()]
    want = sorted(
        ((i, _pri(i, w)) for i, _, w in _rows()), key=lambda t: (-t[1], t[0])
    )[:10]
    assert sorted(got, key=lambda t: (-t[1], t[0])) == want


def test_grouped_topk_matches_replay(spark):
    got = {
        (r["grp"], r["doc_id"]) for r in priority_sample(_df(spark), 5, "w", group_col="grp").collect()
    }
    want = set()
    for g in ("g0", "g1", "g2"):
        members = [(i, _pri(i, w)) for i, gg, w in _rows() if gg == g]
        members.sort(key=lambda t: (-t[1], t[0]))
        want.update((g, i) for i, _ in members[:5])
    assert got == want


def test_repartition_stable(spark):
    a = {r["doc_id"] for r in priority_sample(_df(spark), 12, "w").collect()}
    b = {r["doc_id"] for r in priority_sample(_df(spark).repartition(13), 12, "w").collect()}
    assert a == b


def test_heavier_rows_win_more(spark):
    # two rows, weights 100 vs 1: over 40 salts the heavy one should take
    # top-1 the overwhelming majority of the time (u-ratio would need to
    # exceed 100x to flip)
    df = spark.createDataFrame([(1, 100), (2, 1)], "doc_id long, w long")
    heavy = sum(
        priority_sample(df, 1, "w", salt=s).collect()[0]["doc_id"] == 1
        for s in range(40)
    )
    assert heavy >= 35


def test_exact_big_weight_no_fp_loss(spark):
    # weight near 2^31: priority must be the exact integer, not a double round
    wbig = (1 << 31) - 1
    df = spark.createDataFrame([(5, wbig)], "doc_id long, w long")
    r = priority_sample(df, 1, "w").collect()[0]
    assert r["pri"] == (wbig << 31) // (_mix31(5, 13) + 1)


def test_bad_k(spark):
    with pytest.raises(ValueError):
        priority_sample(_df(spark), 0, "w")

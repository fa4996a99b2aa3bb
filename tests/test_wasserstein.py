"""distributed_lead + exact Wasserstein-1: pure-Python replay."""

import pytest

from pagerank_spark.operators.cumsum import distributed_lead
from pagerank_spark.operators.ranktests import wasserstein1


def test_distributed_lead_matches_window(spark):
    rows = [(i, (i * 7919) % 400) for i in range(500)]
    df = spark.createDataFrame(rows, "k long, v long")
    for p in (2, 7):
        got = {
            r["k"]: r["nxt"]
            for r in distributed_lead(df, ["k"], "v", "nxt", num_partitions=p).collect()
        }
        want = {k: (rows[k + 1][1] if k + 1 < len(rows) else None) for k, _ in rows}
        assert got == want


def test_distributed_lead_strings(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (4, "d")], "k long, v string"
    )
    got = {r["k"]: r["nxt"] for r in distributed_lead(df, ["k"], "v", "nxt", num_partitions=3).collect()}
    assert got == {1: "b", 2: "c", 3: "d", 4: None}


def _python_w1(rows, a, b):
    va = sorted(v for g, v in rows if g == a)
    vb = sorted(v for g, v in rows if g == b)
    na, nb = len(va), len(vb)
    support = sorted(set(va) | set(vb))
    tot = 0
    for i, v in enumerate(support[:-1]):
        ca = sum(1 for x in va if x <= v)
        cb = sum(1 for x in vb if x <= v)
        tot += abs(ca * nb - cb * na) * (support[i + 1] - v)
    return tot, na, nb


@pytest.mark.parametrize("shift", [0, 13])
def test_wasserstein1_exact(spark, shift):
    rows = [("a", (i * 104729) % 97) for i in range(300)] + [
        ("b", ((i * 7919) % 97) + shift) for i in range(200)
    ]
    df = spark.createDataFrame(rows, "g string, v long")
    got = wasserstein1(df, "g", "v", "a", "b").collect()
    assert len(got) == 1
    w, na, nb = _python_w1(rows, "a", "b")
    r = got[0]
    assert (r["w1_scaled"], r["n_a"], r["n_b"]) == (w, na, nb)
    if shift:
        # a pure location shift of s moves W1 by exactly s (same shapes)
        assert round(r["w1_scaled"] / (na * nb)) == shift


def test_wasserstein1_identical_groups_zero(spark):
    rows = [("a", i % 17) for i in range(100)] + [("b", i % 17) for i in range(100)]
    df = spark.createDataFrame(rows, "g string, v long")
    assert wasserstein1(df, "g", "v", "a", "b").collect()[0]["w1_scaled"] == 0

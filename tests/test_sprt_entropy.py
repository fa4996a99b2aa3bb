"""SPRT (hyptest.sprt_binomial) + transition entropy (infotheory)."""

import datetime as dt
import math

import pytest

from pagerank_spark.operators.hyptest import sprt_binomial
from pagerank_spark.operators.infotheory import transition_entropy


def test_sprt_decisions_and_llr(spark):
    # arm 0: 40/100 successes (way over p1=0.22) -> accept_h1
    # arm 1: 2/100 (way under p0=0.18) -> accept_h0
    # arm 2: 20/100 (between) -> continue
    rows = (
        [(0, 1)] * 40 + [(0, 0)] * 60
        + [(1, 1)] * 2 + [(1, 0)] * 98
        + [(2, 1)] * 20 + [(2, 0)] * 80
    )
    df = spark.createDataFrame(rows, ["arm", "succ"])
    got = {r["arm"]: r for r in sprt_binomial(df, "arm", "succ").collect()}
    assert got[0]["decision"] == "accept_h1"
    assert got[1]["decision"] == "accept_h0"
    assert got[2]["decision"] == "continue"
    la, lb = math.log(0.22 / 0.18), math.log(0.78 / 0.82)
    assert got[2]["llr"] == pytest.approx(20 * la + 80 * lb, abs=1e-12)
    assert got[0]["n"] == 100 and got[0]["successes"] == 40


def test_transition_entropy_matches_python(spark):
    base = dt.datetime(2024, 1, 1)
    seq = ["a", "b", "a", "c", "a", "b", "b"]
    rows = [
        (i, base + dt.timedelta(seconds=i), 1, s, 0.0) for i, s in enumerate(seq)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    got = {r["state"]: r for r in transition_entropy(df).collect()}
    # pairs: a->b, b->a, a->c, c->a, a->b, b->b
    # cur=a: {b:2, c:1}; cur=b: {a:1, b:1}; cur=c: {a:1}
    def h(counts):
        t = sum(counts)
        return round(sum(round(-(c / t) * math.log(c / t) * 1e9) for c in counts))

    assert got["a"]["n_pairs"] == 3 and got["a"]["n_next_states"] == 2
    assert got["a"]["entropy_nano"] == h([2, 1])
    assert got["b"]["entropy_nano"] == h([1, 1])
    assert got["c"]["entropy_nano"] == 0  # deterministic next step
    assert got["c"]["n_next_states"] == 1


def test_transition_entropy_keys_are_independent(spark):
    base = dt.datetime(2024, 1, 1)
    rows = [
        (0, base, 1, "a", 0.0),
        (1, base + dt.timedelta(seconds=1), 1, "b", 0.0),
        (2, base, 2, "a", 0.0),
        (3, base + dt.timedelta(seconds=1), 2, "c", 0.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    got = {r["state"]: r for r in transition_entropy(df).collect()}
    # cross-user pair (b -> a) must NOT exist
    assert set(got) == {"a"}
    assert got["a"]["n_pairs"] == 2 and got["a"]["n_next_states"] == 2

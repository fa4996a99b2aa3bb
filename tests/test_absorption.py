"""Absorption steps: closed form on a deterministic chain + replay."""

import math

from pagerank_spark.operators.sequences import absorption_steps


def _events(spark, seqs):
    rows = []
    eid = 0
    for u, states in enumerate(seqs):
        for i, s in enumerate(states):
            rows.append((u, eid, f"2024-01-01 00:{i:02d}:00", s))
            eid += 1
    df = spark.createDataFrame(rows, "user_id long, event_id long, ts string, event_type string")
    return df.withColumn("ts", df.ts.cast("timestamp"))


def test_absorption_deterministic_chain(spark):
    # every user walks a -> b -> buy: x(b) = 1, x(a) = 2 exactly (k >= 2)
    ev = _events(spark, [["a", "b", "buy"]] * 4)
    got = {r.state: r for r in absorption_steps(ev, absorbing="buy", k_iters=10).collect()}
    assert got["b"].x_micro == 1_000_000
    assert got["a"].x_micro == 2_000_000
    assert got["a"].n_out == 4 and got["b"].n_out == 4


def test_absorption_truncated_replay(spark):
    # a self-loops half the time: transitions a->a x2, a->buy x2 (per data)
    seqs = [["a", "a", "buy"], ["a", "buy"], ["a", "a", "a", "buy"]]
    ev = _events(spark, seqs)
    k = 12
    got = {r.state: r for r in absorption_steps(ev, absorbing="buy", k_iters=k).collect()}
    # replay: p(a->a) = n_aa/rt, x_{t+1} = 1 + p_aa * x_t
    n_aa = sum(s[i] == "a" and s[i + 1] == "a" for s in seqs for i in range(len(s) - 1))
    rt = sum(s[i] == "a" for s in seqs for i in range(len(s) - 1))
    x = 0.0
    for _ in range(k):
        x = 1.0 + (n_aa / rt) * x
    assert got["a"].n_out == rt
    assert got["a"].x_micro == math.floor(x * 1e6 + 0.5)

"""BLEU statistics (operators/mleval.py::bleu_pairs) vs an exact
pure-Python replay, closed-form identity cases, and plan shape."""

import math

import pytest
from pyspark.sql import functions as F


def _half_away_nano(x: float) -> int:
    return math.floor(x * 1e9 + 0.5) if x >= 0 else -math.floor(-x * 1e9 + 0.5)


def _trunc_div(a: int, b: int) -> int:
    return (abs(a) // b) * (1 if a >= 0 else -1)


def _python_bleu(rows, max_n=4):
    out = {}
    for pid, cand, ref in rows:
        ct = cand.strip().split() if cand.strip() else []
        rt = ref.strip().split() if ref.strip() else []
        stats, psum = {}, 0
        for n in range(1, max_n + 1):
            cg, rg = {}, {}
            for i in range(len(ct) - n + 1):
                g = " ".join(ct[i : i + n])
                cg[g] = cg.get(g, 0) + 1
            for i in range(len(rt) - n + 1):
                g = " ".join(rt[i : i + n])
                rg[g] = rg.get(g, 0) + 1
            m = sum(min(c, rg.get(g, 0)) for g, c in cg.items())
            t = sum(cg.values())
            stats[n] = (m, t)
            psum += _half_away_nano(math.log(m + 1)) - _half_away_nano(math.log(t + 1))
        cand_len, ref_len = len(ct), len(rt)
        if cand_len >= ref_len or cand_len == 0:
            bp = 0
        else:
            bp = _half_away_nano(1.0 - ref_len / cand_len)
        out[pid] = (
            cand_len,
            ref_len,
            *[v for n in range(1, max_n + 1) for v in stats[n]],
            bp + _trunc_div(psum, max_n),
        )
    return out


@pytest.fixture(scope="module")
def rows():
    return [
        (0, "the cat sat on the mat", "the cat sat on the mat"),  # identity
        (1, "the cat", "the cat sat on the mat"),  # short cand -> BP < 0
        (2, "a b c d e f g h", "x y z"),  # no overlap
        (3, "", "some reference"),  # empty candidate
        (4, "the the the the", "the cat"),  # clipping: m1 must be 1
        (5, "one two three", ""),  # empty reference
    ]


def test_matches_python_replay(spark, rows):
    from pagerank_spark.operators.mleval import bleu_pairs

    df = spark.createDataFrame(rows, "pair_id long, cand string, ref string")
    got = {
        r["pair_id"]: (
            r["cand_len"], r["ref_len"],
            r["m1"], r["t1"], r["m2"], r["t2"], r["m3"], r["t3"], r["m4"], r["t4"],
            r["log_bleu_nano"],
        )
        for r in bleu_pairs(df).collect()
    }
    assert got == _python_bleu(rows)


def test_identity_and_clipping(spark, rows):
    from pagerank_spark.operators.mleval import bleu_pairs

    df = spark.createDataFrame(rows, "pair_id long, cand string, ref string")
    res = {r["pair_id"]: r for r in bleu_pairs(df).collect()}
    # identical pair: every order fully matched, BP = 0, top score
    r0 = res[0]
    assert all(r0[f"m{i}"] == r0[f"t{i}"] for i in range(1, 5))
    assert r0["log_bleu_nano"] == max(r["log_bleu_nano"] for r in res.values())
    # clipping: 'the' x4 against a ref with one 'the' -> m1 == 1
    assert res[4]["m1"] == 1 and res[4]["t1"] == 4
    # empty candidate: defined zero counts
    assert res[3]["cand_len"] == 0 and res[3]["log_bleu_nano"] == 0
    # disjoint texts: zero matches everywhere
    assert all(res[2][f"m{i}"] == 0 for i in range(1, 5))
    # short candidate has a negative brevity component
    assert res[1]["log_bleu_nano"] < res[0]["log_bleu_nano"]


def test_plan_no_python(spark, rows):
    from pagerank_spark.operators.mleval import bleu_pairs

    df = spark.createDataFrame(rows, "pair_id long, cand string, ref string")
    plan = bleu_pairs(df)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_chrf_replay_and_ceiling(spark, rows):
    """chrf_pairs (operators/mleval.py) vs a pure-Python replay; identity
    pair hits the 1e6 ceiling, disjoint strings score 0."""
    import re as _re

    from pagerank_spark.operators.mleval import chrf_pairs

    def _chrf(cand, ref, max_n=6, beta=2):
        cs = _re.sub(r"\s+", "", cand or "")
        rs = _re.sub(r"\s+", "", ref or "")
        psum = po = rsum = ro = 0
        for n in range(1, max_n + 1):
            cg, rg = {}, {}
            for i in range(len(cs) - n + 1):
                cg[cs[i : i + n]] = cg.get(cs[i : i + n], 0) + 1
            for i in range(len(rs) - n + 1):
                rg[rs[i : i + n]] = rg.get(rs[i : i + n], 0) + 1
            m = sum(min(c, rg.get(g, 0)) for g, c in cg.items())
            ct, rt = sum(cg.values()), sum(rg.values())
            if ct > 0:
                psum += m * 1000000 // ct
                po += 1
            if rt > 0:
                rsum += m * 1000000 // rt
                ro += 1
        p = 0 if po == 0 else psum // po
        r = 0 if ro == 0 else rsum // ro
        b2 = beta * beta
        f = 0 if p == 0 or r == 0 else ((1 + b2) * p * r) // (b2 * p + r)
        return (len(cs), len(rs), p, r, f)

    df = spark.createDataFrame(rows, "pair_id long, cand string, ref string")
    got = {
        x["pair_id"]: (
            x["cand_chars"], x["ref_chars"], x["p_avg_micro"],
            x["r_avg_micro"], x["chrf_micro"],
        )
        for x in chrf_pairs(df).collect()
    }
    for pid, cand, ref in rows:
        assert got[pid] == _chrf(cand, ref), pid
    assert got[0][4] == 1000000  # identity ceiling
    assert got[3][4] == 0  # empty candidate

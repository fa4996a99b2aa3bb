"""ROUGE-L (operators/mleval.py::rouge_l_pairs) vs a pure-Python LCS
replay, closed-form cases, and plan shape."""

import pytest
from pyspark.sql import functions as F


def _lcs(a, b):
    prev = [0] * (len(b) + 1)
    for x in a:
        cur = [0]
        for j, y in enumerate(b, 1):
            cur.append(prev[j - 1] + 1 if x == y else max(prev[j], cur[-1]))
        prev = cur
    return prev[-1]


def _python_rouge(rows):
    out = {}
    for pid, cand, ref in rows:
        ct = cand.strip().split() if cand.strip() else []
        rt = ref.strip().split() if ref.strip() else []
        l = _lcs(ct, rt)
        denom = len(ct) + len(rt)
        out[pid] = (len(ct), len(rt), l, 0 if denom == 0 else (2 * l * 1000000) // denom)
    return out


@pytest.fixture(scope="module")
def rows():
    return [
        (0, "the cat sat on the mat", "the cat sat on the mat"),
        (1, "the cat on mat", "the cat sat on the mat"),  # subsequence
        (2, "a b c", "c b a"),  # reversal: LCS = 1
        (3, "", "some reference"),
        (4, "one two", ""),
        (5, "x a y b z c", "a b c"),  # interleaved: LCS = 3
    ]


def test_matches_python_replay(spark, rows):
    from pagerank_spark.operators.mleval import rouge_l_pairs

    df = spark.createDataFrame(rows, "pair_id long, cand string, ref string")
    got = {
        r["pair_id"]: (r["cand_len"], r["ref_len"], r["lcs"], r["rouge_l_f_micro"])
        for r in rouge_l_pairs(df).collect()
    }
    assert got == _python_rouge(rows)


def test_closed_form(spark, rows):
    from pagerank_spark.operators.mleval import rouge_l_pairs

    df = spark.createDataFrame(rows, "pair_id long, cand string, ref string")
    res = {r["pair_id"]: r for r in rouge_l_pairs(df).collect()}
    assert res[0]["lcs"] == 6 and res[0]["rouge_l_f_micro"] == 1000000
    assert res[1]["lcs"] == 4  # 'the cat on mat' is a subsequence wholly
    assert res[2]["lcs"] == 1
    assert res[3]["lcs"] == 0 and res[3]["rouge_l_f_micro"] == 0
    assert res[5]["lcs"] == 3


def test_plan_no_python(spark, rows):
    from pagerank_spark.operators.mleval import rouge_l_pairs

    df = spark.createDataFrame(rows, "pair_id long, cand string, ref string")
    plan = rouge_l_pairs(df)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # zero shuffles: per-row expression work only
    assert "Exchange" not in plan

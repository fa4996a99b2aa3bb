"""Budgeted SFT context-window planning: exact pure-Python replay."""

import pyspark.sql.functions as F

from pagerank_spark.operators.trainprep import sft_context_window
from pagerank_spark.sources.transcripts import synth_transcripts


def _python_pack(rows, budget, target_role="assistant"):
    by_conv = {}
    for r in rows:
        by_conv.setdefault(r["conv_id"], []).append(r)
    out = []
    for conv, turns in by_conv.items():
        turns.sort(key=lambda r: r["turn_idx"])
        for i, t in enumerate(turns):
            if t["role"] != target_role:
                continue
            cost = 0
            start = i
            for j in range(i - 1, -1, -1):
                if cost + turns[j]["cost"] > budget:
                    break
                cost += turns[j]["cost"]
                start = j
            n = i - start
            out.append(
                (
                    conv,
                    t["turn_idx"],
                    turns[start]["turn_idx"] if n else t["turn_idx"],
                    n,
                    cost,
                )
            )
    return sorted(out)


def _with_cost(df):
    return df.withColumn("cost", F.length("text").cast("long"))


def test_sft_context_window_exact(spark):
    tr = _with_cost(synth_transcripts(spark, 40))
    rows = [r.asDict() for r in tr.collect()]
    for budget in (0, 7, 15, 60, 10_000):
        got = sorted(
            tuple(r)
            for r in sft_context_window(tr, budget, cost_col="cost").collect()
        )
        assert got == _python_pack(rows, budget), budget


def test_sft_context_window_huge_budget_takes_everything(spark):
    tr = _with_cost(synth_transcripts(spark, 10))
    got = {
        (r["conv_id"], r["target_turn"]): r
        for r in sft_context_window(tr, 10**9, cost_col="cost").collect()
    }
    for (conv, t), r in got.items():
        assert r["ctx_start_turn"] == 0
        assert r["n_ctx_turns"] == t

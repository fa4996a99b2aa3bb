"""Shared-prefix template mining (operators/sequences.py::template_prefixes):
planted templates, support threshold, depth cap, and plan shape."""

import pytest
from pyspark.sql import functions as F


def _mk(conv_id, toks):
    return [
        (conv_id, i, t.split(":")[0], None if t.split(":")[1] == "-" else t.split(":")[1])
        for i, t in enumerate(toks)
    ]


@pytest.fixture(scope="module")
def transcripts(spark):
    rows = []
    # 3 conversations sharing a depth-3 template, diverging after
    rows += _mk("c1", ["user:-", "assistant:search", "tool:search", "user:-"])
    rows += _mk("c2", ["user:-", "assistant:search", "tool:search", "assistant:-"])
    rows += _mk("c3", ["user:-", "assistant:search", "tool:search"])
    # 2 conversations sharing only depth-1 with the others
    rows += _mk("c4", ["user:-", "assistant:-"])
    rows += _mk("c5", ["user:-", "assistant:-", "user:-"])
    # a conversation unique from turn 0
    rows += _mk("c6", ["tool:zz"])
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, tool string"
    )


def test_planted_templates(spark, transcripts):
    from pagerank_spark.operators.sequences import template_prefixes

    got = {
        r["conv_id"]: (r["n_turns"], r["tpl_len"], r["template"])
        for r in template_prefixes(transcripts, min_support=2).collect()
    }
    t3 = "user:-,assistant:search,tool:search"
    assert got["c1"] == (4, 3, t3)
    assert got["c2"] == (4, 3, t3)
    assert got["c3"] == (3, 3, t3)
    assert got["c4"] == (2, 2, "user:-,assistant:-")
    assert got["c5"] == (3, 2, "user:-,assistant:-")
    # unique-from-turn-0 conversation has no qualifying prefix
    assert got["c6"] == (1, 0, "")


def test_support_and_depth(spark, transcripts):
    from pagerank_spark.operators.sequences import template_prefixes

    # min_support = 3: only the depth-3 trio still qualifies past depth 1
    got = {
        r["conv_id"]: r["tpl_len"]
        for r in template_prefixes(transcripts, min_support=3).collect()
    }
    assert got["c1"] == 3 and got["c4"] == 1 and got["c6"] == 0
    # depth cap truncates the reported template
    capped = {
        r["conv_id"]: r["tpl_len"]
        for r in template_prefixes(transcripts, min_support=2, max_depth=2).collect()
    }
    assert capped["c1"] == 2
    with pytest.raises(ValueError):
        template_prefixes(transcripts, min_support=0)


def test_plan_no_python(spark, transcripts):
    from pagerank_spark.operators.sequences import template_prefixes

    plan = (
        template_prefixes(transcripts)._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan

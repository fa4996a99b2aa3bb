"""transcript_lint + role_mixing on hand fixtures with planted violations."""

from datetime import datetime

from pagerank_spark.operators.sequences import role_mixing, transcript_lint


def _df(spark, rows):
    data = [
        (c, i, r, f"t-{c}-{i}", tool, datetime(2026, 1, 1, 0, min(i, 59)))
        for c, i, r, tool in rows
    ]
    return spark.createDataFrame(
        data, "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    )


def test_lint_clean_conversation(spark):
    rows = [("c", 0, "user", None), ("c", 1, "assistant", "sql"), ("c", 2, "tool", "sql")]
    r = transcript_lint(_df(spark, rows)).collect()[0]
    assert (r.n_turns, r.n_user, r.n_assistant, r.n_tool) == (3, 1, 1, 1)
    assert (r.n_idx_gaps, r.n_same_role_adjacent, r.n_orphan_tools) == (0, 0, 0)


def test_lint_flags_gap_run_and_orphan(spark):
    rows = [
        ("c", 0, "user", None),
        ("c", 1, "user", None),          # same-role run
        ("c", 3, "tool", "sql"),         # idx gap AND orphan (no assistant w/ sql)
        ("c", 4, "assistant", None),
    ]
    r = transcript_lint(_df(spark, rows)).collect()[0]
    assert r.n_idx_gaps == 1
    assert r.n_same_role_adjacent == 1
    assert r.n_orphan_tools == 1


def test_lint_orphan_requires_same_tool(spark):
    rows = [
        ("c", 0, "assistant", "python"),
        ("c", 1, "tool", "sql"),  # assistant exists but wrong tool -> orphan
        ("c", 2, "tool", "python"),  # matches turn 0 -> not orphan
    ]
    r = transcript_lint(_df(spark, rows)).collect()[0]
    assert r.n_orphan_tools == 1


def test_role_mixing_counts(spark):
    rows = [
        ("a", 0, "user", None), ("a", 1, "assistant", None), ("a", 2, "user", None),
        ("b", 0, "user", None), ("b", 1, "assistant", None),
    ]
    got = {
        (r.role_src, r.role_dst): r.n_pairs
        for r in role_mixing(_df(spark, rows)).collect()
    }
    assert got == {("assistant", "user"): 2, ("user", "assistant"): 1}

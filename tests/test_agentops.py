"""tool_latency / agent_loops / conv_shapes — hand fixtures."""

from pyspark.sql import functions as F

from pagerank_spark.operators.sequences import agent_loops, conv_shapes, tool_latency
from pagerank_spark.sources.transcripts import transcripts_tiny


def _tr(spark, rows):
    # (conv_id, turn_idx, role, tool, ts_offset_seconds)
    df = spark.createDataFrame(
        [(c, i, r, t, s) for c, i, r, t, s in rows],
        "conv_id string, turn_idx int, role string, tool string, off long",
    )
    return df.select(
        "conv_id",
        "turn_idx",
        "role",
        F.lit("x").alias("text"),
        "tool",
        (F.to_timestamp(F.lit("2026-01-01 00:00:00")) + F.make_interval(secs=F.col("off"))).alias("ts"),
    )


def test_tool_latency_tiny_fixture(spark):
    # transcripts_tiny: one search result and one python result, each one
    # minute after the invoking assistant turn
    rows = {r["tool"]: r for r in tool_latency(transcripts_tiny(spark)).collect()}
    assert rows["search"]["n_results"] == 1
    assert rows["search"]["total_latency_us"] == 60_000_000
    assert rows["python"]["max_latency_us"] == 60_000_000


def test_tool_latency_aggregates(spark):
    rows_in = [
        ("a", 0, "user", None, 0),
        ("a", 1, "assistant", "sql", 10),
        ("a", 2, "tool", "sql", 25),      # 15s
        ("b", 0, "user", None, 0),
        ("b", 1, "assistant", "sql", 5),
        ("b", 2, "tool", "sql", 40),      # 35s
    ]
    got = {r["tool"]: r for r in tool_latency(_tr(spark, rows_in)).collect()}
    assert got["sql"]["n_results"] == 2
    assert got["sql"]["total_latency_us"] == 50_000_000
    assert got["sql"]["max_latency_us"] == 35_000_000


def test_agent_loops_runs_and_breaks(spark):
    # conv a: search, search, python, search -> one run (search, len 2, start 1)
    rows_in = [
        ("a", 1, "assistant", "search", 0),
        ("a", 4, "assistant", "search", 0),
        ("a", 7, "assistant", "python", 0),
        ("a", 10, "assistant", "search", 0),
        # conv b: three pythons in a row -> run len 3
        ("b", 1, "assistant", "python", 0),
        ("b", 4, "assistant", "python", 0),
        ("b", 7, "assistant", "python", 0),
        # tool-result rows must not count as invocations
        ("b", 8, "tool", "python", 0),
    ]
    got = {(r["conv_id"], r["tool"]): r for r in agent_loops(_tr(spark, rows_in), min_len=2).collect()}
    assert got[("a", "search")]["run_len"] == 2
    assert got[("a", "search")]["start_turn"] == 1
    assert got[("b", "python")]["run_len"] == 3
    assert ("a", "python") not in got


def test_conv_shapes_groups_identical_templates(spark):
    rows_in = [
        ("a", 0, "user", None, 0),
        ("a", 1, "assistant", "sql", 0),
        ("b", 0, "user", None, 0),
        ("b", 1, "assistant", "sql", 0),
        ("c", 0, "user", None, 0),
        ("c", 1, "assistant", None, 0),
    ]
    got = {r["shape"]: r for r in conv_shapes(_tr(spark, rows_in)).collect()}
    assert got["user:-,assistant:sql"]["n_convs"] == 2
    assert got["user:-,assistant:sql"]["rep_conv"] == "a"
    assert got["user:-,assistant:-"]["n_convs"] == 1


def test_tool_graph_transitions(spark):
    from pagerank_spark.operators.sequences import tool_graph

    rows_in = [
        # conv a: search -> python -> python -> search
        ("a", 1, "assistant", "search", 0),
        ("a", 4, "assistant", "python", 0),
        ("a", 7, "assistant", "python", 0),   # self-transition: excluded
        ("a", 10, "assistant", "search", 0),
        # conv b: search -> python (again)
        ("b", 1, "assistant", "search", 0),
        ("b", 4, "assistant", "python", 0),
        # tool-result rows and plain turns never contribute
        ("b", 5, "tool", "python", 0),
        ("b", 6, "user", None, 0),
    ]
    got = {(r["src"], r["dst"]): r["weight"] for r in tool_graph(_tr(spark, rows_in)).collect()}
    assert got == {("search", "python"): 2.0, ("python", "search"): 1.0}


def test_tool_graph_single_invocation_conv_empty(spark):
    from pagerank_spark.operators.sequences import tool_graph

    rows_in = [("a", 1, "assistant", "sql", 0)]
    assert tool_graph(_tr(spark, rows_in)).count() == 0


def test_curate_conversations_verdicts(spark):
    from pagerank_spark.operators.sequences import curate_conversations

    rows_in = [
        # conv a: clean 4-turn conversation with one tool exchange
        ("a", 0, "user", None, 0),
        ("a", 1, "assistant", "sql", 10),
        ("a", 2, "tool", "sql", 20),
        ("a", 3, "user", None, 30),
        # conv b: stuck loop — three consecutive same-tool invocations
        ("b", 0, "user", None, 0),
        ("b", 1, "assistant", "search", 5),
        ("b", 2, "assistant", "search", 10),
        ("b", 3, "assistant", "search", 15),
        # conv c: index gap (turn 0 then turn 2)
        ("c", 0, "user", None, 0),
        ("c", 2, "assistant", None, 10),
        ("c", 3, "user", None, 20),
        # conv d: slow tool (200s > the 100s budget below)
        ("d", 0, "user", None, 0),
        ("d", 1, "assistant", "py", 10),
        ("d", 2, "tool", "py", 210),
        # conv e: too short
        ("e", 0, "user", None, 0),
        ("e", 1, "assistant", None, 5),
    ]
    tr = _tr(spark, rows_in)
    got = {r.conv_id: r for r in curate_conversations(
        tr, min_turns=3, max_run_len=2, max_latency_us=100_000_000).collect()}
    assert got["a"].keep == 1
    assert got["b"].keep == 0 and got["b"].max_run == 3
    assert got["c"].keep == 0 and got["c"].n_idx_gaps == 1
    assert got["d"].keep == 0 and got["d"].max_latency_us == 200_000_000
    assert got["e"].keep == 0 and got["e"].n_turns == 2


def test_turn_depth_profile(spark):
    from pagerank_spark.operators.sequences import turn_depth_profile

    rows_in = [
        ("a", 0, "user", None, 0),
        ("a", 1, "assistant", "sql", 0),
        ("a", 2, "tool", "sql", 0),
        ("a", 5, "assistant", None, 0),
        ("b", 0, "user", None, 0),
        ("b", 6, "assistant", "py", 0),
    ]
    got = {r.depth_bucket: r for r in turn_depth_profile(_tr(spark, rows_in), bucket=5).collect()}
    b0, b1 = got[0], got[1]
    assert (b0.n_turns, b0.n_convs) == (4, 2)
    assert (b0.n_assistant, b0.n_tool_invocations) == (1, 1)
    assert b0.tool_rate_micro == 1_000_000
    assert (b1.n_turns, b1.n_convs) == (2, 2)
    assert b1.n_assistant == 2 and b1.n_tool_invocations == 1
    assert b1.tool_rate_micro == 500_000
    # text mass counts the literal 'x' placeholder per turn
    assert b0.text_chars == 4

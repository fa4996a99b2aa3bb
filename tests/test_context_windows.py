"""context_windows (operators/sequences.py): SFT-style (context, target)
example extraction — determinism, bounds, transcripts use."""

import pytest
from pyspark.sql import functions as F


def test_closed_form_sequence(spark):
    from pagerank_spark.operators.sequences import context_windows

    rows = [(1, i, f"s{i}", f"2026-01-01 00:0{i}:00") for i in range(5)]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, event_type string, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))
    got = {
        r["event_id"]: (r["n_context"], r["context"], r["target"])
        for r in context_windows(df, n=3).collect()
    }
    # opener (no predecessors) dropped; contexts are the previous <=3 items
    assert 0 not in got
    assert got[1] == (1, "s0", "s1")
    assert got[2] == (2, "s0 s1", "s2")
    assert got[3] == (3, "s0 s1 s2", "s3")
    assert got[4] == (3, "s1 s2 s3", "s4")


def test_equal_timestamps_deterministic(spark):
    from pagerank_spark.operators.sequences import context_windows

    # all the same ts: the tiebreak column must fully order the frame
    rows = [(1, i, f"s{i}", "2026-01-01 00:00:00") for i in range(4)]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, event_type string, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))
    a = sorted(map(tuple, context_windows(df, n=2).collect()))
    b = sorted(map(tuple, context_windows(df.repartition(7), n=2).collect()))
    assert a == b
    assert dict((r[1], r[3]) for r in a)[3] == "s1 s2"


def test_transcripts_shape(spark):
    from pagerank_spark.operators.sequences import context_windows
    from pagerank_spark.sources.transcripts import synth_transcripts

    tr = synth_transcripts(spark, 5)
    ex = context_windows(
        tr, n=4, key_col="conv_id", state_col="text",
        ts_col="turn_idx", tiebreak_col="turn_idx",
    )
    rows = ex.collect()
    assert len(rows) > 0
    per_conv = tr.groupBy("conv_id").count().collect()
    want = {r["conv_id"]: r["count"] - 1 for r in per_conv}  # opener dropped
    got = {}
    for r in rows:
        got[r["conv_id"]] = got.get(r["conv_id"], 0) + 1
        assert 1 <= r["n_context"] <= 4
        assert r["target"].startswith("t-")
    assert got == want


def test_validation(spark):
    from pagerank_spark.operators.sequences import context_windows

    df = spark.createDataFrame([(1, 1, "a", "2026-01-01")], "user_id long, event_id long, event_type string, ts string")
    with pytest.raises(ValueError):
        context_windows(df, n=0)

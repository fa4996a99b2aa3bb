"""transcripts_from_events bridge + SFT pair mining."""

from datetime import datetime, timezone

from pagerank_spark.operators.edges import derive_edges
from pagerank_spark.operators.sequences import sft_pairs
from pagerank_spark.sources.transcripts import transcripts_from_events, transcripts_tiny


def _events(spark, rows):
    def ts(i):
        return datetime.fromtimestamp(1700000000 + i * 60, tz=timezone.utc).replace(tzinfo=None)

    data = [(eid, ts(i), u, et, 0.0, "{}") for eid, (u, i, et) in enumerate(rows)]
    return spark.createDataFrame(
        data, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )


def test_bridge_roles_and_tools(spark):
    # user 0: turns 0..3 -> roles user, assistant, (tool iff (0+1)%3==0 ->
    # no), user; user 2: turn 1 invokes ((2+1)%3==0) so turn 2 is 'tool'
    # and inherits turn 1's event_type
    rows = [(0, 0, "a"), (0, 1, "b"), (0, 2, "c"), (0, 3, "d"),
            (2, 0, "x"), (2, 1, "y"), (2, 2, "z")]
    tr = transcripts_from_events(_events(spark, rows))
    got = {(r.conv_id, r.turn_idx): (r.role, r.tool, r.text) for r in tr.collect()}
    assert got[("conv-0", 1)] == ("assistant", None, "t-0-1")
    assert got[("conv-0", 2)] == ("user", None, "t-0-2")
    assert got[("conv-2", 1)] == ("assistant", "y", "t-2-1")
    assert got[("conv-2", 2)] == ("tool", "y", "t-2-2")


def test_bridge_turn_order_follows_ts(spark):
    rows = [(5, 2, "c"), (5, 0, "a"), (5, 1, "b")]
    tr = transcripts_from_events(_events(spark, rows))
    got = {r.turn_idx: r.role for r in tr.collect()}
    assert got == {0: "user", 1: "assistant", 2: "tool"}  # (5+1)%3 == 0


def test_bridge_feeds_derive_edges(spark):
    rows = [(2, 0, "x"), (2, 1, "y"), (2, 2, "z")]
    edges = derive_edges(transcripts_from_events(_events(spark, rows)))
    got = {(r.src, r.dst) for r in edges.collect()}
    # vids 0,1,2 by (conv, turn); reply 1->0, 2->1; tool turn 2 -> assistant 1
    assert got == {(1, 0), (2, 1)}


def test_sft_pairs_on_tiny_fixture(spark):
    pairs = sft_pairs(transcripts_tiny(spark)).collect()
    got = {(r.conv_id, r.prompt_turn) for r in pairs}
    # c1: user@0 -> assistant@1; c2: user@0 -> assistant@1;
    # c3: user@0 -> assistant@1 and user@3 -> assistant@4
    assert got == {("c1", 0), ("c2", 0), ("c3", 0), ("c3", 3)}
    for r in pairs:
        assert r.prompt.startswith("t-") and r.response.startswith("t-")

"""Edge derivation + id assignment golden tests (FIXTURES.md §2)."""

from pyspark.sql import functions as F

from pagerank_spark.operators.edges import derive_edges, transcripts_to_graph
from pagerank_spark.operators.ids import vertex_ids
from pagerank_spark.sources.transcripts import synth_transcripts, transcripts_tiny

EXPECTED_TINY_EDGES = {(1, 0), (2, 1), (3, 2), (5, 4), (7, 6), (8, 7), (9, 8), (10, 9)}
EXPECTED_TINY_IDS = {
    ("c1", 0): 0, ("c1", 1): 1, ("c1", 2): 2, ("c1", 3): 3,
    ("c2", 0): 4, ("c2", 1): 5,
    ("c3", 0): 6, ("c3", 1): 7, ("c3", 2): 8, ("c3", 3): 9, ("c3", 4): 10,
}


def test_vertex_ids_tiny(spark):
    t = transcripts_tiny(spark)
    got = {(r["conv_id"], r["turn_idx"]): r["vid"] for r in vertex_ids(t).collect()}
    assert got == EXPECTED_TINY_IDS


def test_edges_tiny(spark):
    t = transcripts_tiny(spark)
    edges = derive_edges(t)
    got = {(r["src"], r["dst"]) for r in edges.collect()}
    assert got == EXPECTED_TINY_EDGES


def test_ids_dense_and_stable_on_synth(spark):
    t = synth_transcripts(spark, 50)
    ids = vertex_ids(t).collect()
    n = len(ids)
    vids = sorted(r["vid"] for r in ids)
    assert vids == list(range(n))
    # lexicographic order of keys == id order
    in_key_order = sorted(ids, key=lambda r: (r["conv_id"], r["turn_idx"]))
    assert [r["vid"] for r in in_key_order] == list(range(n))
    # stability: a second derivation gives identical assignments
    again = {(r["conv_id"], r["turn_idx"]): r["vid"] for r in vertex_ids(t).collect()}
    assert again == {(r["conv_id"], r["turn_idx"]): r["vid"] for r in ids}


def test_synth_edges_intra_conversation(spark):
    t = synth_transcripts(spark, 30)
    ids, edges = transcripts_to_graph(t)
    id2conv = {r["vid"]: r["conv_id"] for r in ids.collect()}
    for r in edges.collect():
        assert id2conv[r["src"]] == id2conv[r["dst"]]
        assert r["src"] != r["dst"]
    # simple graph: no duplicate pairs
    pairs = [(r["src"], r["dst"]) for r in edges.collect()]
    assert len(pairs) == len(set(pairs))


def test_text_equality_invariant(spark):
    """input_hint invariant: engine jobs never disturb per-turn text under
    stable (conv_id, turn_idx) ordering."""
    t = synth_transcripts(spark, 20)
    before = [r["text"] for r in t.orderBy("conv_id", "turn_idx").collect()]
    ids, edges = transcripts_to_graph(t)
    edges.count()
    after = [r["text"] for r in t.orderBy("conv_id", "turn_idx").collect()]
    assert before == after


def test_tool_edge_nonadjacent(spark):
    """A tool turn links to the nearest preceding assistant with same tool,
    even when not adjacent."""
    rows = [
        ("cx", 0, "user", None),
        ("cx", 1, "assistant", "sql"),
        ("cx", 2, "user", None),
        ("cx", 3, "tool", "sql"),
    ]
    t = spark.createDataFrame(rows, "conv_id string, turn_idx int, role string, tool string").select(
        "conv_id", "turn_idx", "role", F.lit("x").alias("text"), "tool",
        F.to_timestamp(F.lit("2026-01-01")).alias("ts"),
    )
    got = {(r["src"], r["dst"]) for r in derive_edges(t).collect()}
    # reply chain 1->0, 2->1, 3->2 plus tool edge 3->1
    assert got == {(1, 0), (2, 1), (3, 2), (3, 1)}

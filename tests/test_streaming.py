"""Structured Streaming ingestion test: micro-batched transcript turns
produce exactly the batch-derived edge set (natural keys)."""

import os

from pagerank_spark.sources.transcripts import TRANSCRIPTS_SCHEMA, synth_transcripts
from pagerank_spark.streaming.ingest import incremental_edges, run_ingest, stream_transcripts


def test_streaming_edges_match_batch(spark, tmp_path):
    t = synth_transcripts(spark, 12).cache()

    # batch truth (natural keys): reply + tool edges per FIXTURES.md §2
    from pagerank_spark.operators.edges import derive_edges
    from pagerank_spark.operators.ids import vertex_ids

    ids = vertex_ids(t)
    edges_batch = derive_edges(t, ids)
    vid2key = {r["vid"]: (r["conv_id"], r["turn_idx"]) for r in ids.collect()}
    batch_set = {
        (vid2key[r["src"]][0], vid2key[r["src"]][1], vid2key[r["dst"]][1])
        for r in edges_batch.collect()
    }

    # stream the same rows in two micro-batches (split by conv hash)
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ck_dir = str(tmp_path / "ck")
    os.makedirs(in_dir)
    part1 = t.filter("pmod(xxhash64(conv_id), 2) = 0")
    part2 = t.filter("pmod(xxhash64(conv_id), 2) = 1")
    part1.write.mode("append").parquet(in_dir)
    run_ingest(spark, in_dir, out_dir, ck_dir, TRANSCRIPTS_SCHEMA)
    part2.write.mode("append").parquet(in_dir)
    run_ingest(spark, in_dir, out_dir, ck_dir, TRANSCRIPTS_SCHEMA)

    got = spark.read.parquet(out_dir)
    rows = [(r["conv_id"], r["src_turn"], r["dst_turn"], r["kind"]) for r in got.collect()]
    # exactly-once emission per (edge, kind): NO dedup before checking —
    # consecutive turns in one micro-batch must not double-emit their shared
    # reply edge (a tool edge may coincide with a reply pair; batch dedups
    # across kinds, streaming emits one row per kind)
    assert len(rows) == len(set(rows)), "duplicate edge emissions"
    assert {(c, s, d) for c, s, d, _ in rows} == batch_set


def test_streaming_out_of_order_within_conv(spark, tmp_path):
    """Turns arriving out of order still produce the full reply chain."""
    rows = [
        ("z1", 2, "user", None),
        ("z1", 0, "user", None),
    ]
    later = [
        ("z1", 1, "assistant", "sql"),
        ("z1", 3, "tool", "sql"),
    ]
    import pyspark.sql.functions as F

    def as_df(rws):
        return spark.createDataFrame(rws, "conv_id string, turn_idx int, role string, tool string").select(
            "conv_id", "turn_idx", "role", F.lit("x").alias("text"), "tool",
            F.to_timestamp(F.lit("2026-01-01")).alias("ts"),
        )

    in_dir, out_dir, ck_dir = (str(tmp_path / d) for d in ("in", "out", "ck"))
    os.makedirs(in_dir)
    as_df(rows).write.mode("append").parquet(in_dir)
    run_ingest(spark, in_dir, out_dir, ck_dir, TRANSCRIPTS_SCHEMA)
    as_df(later).write.mode("append").parquet(in_dir)
    run_ingest(spark, in_dir, out_dir, ck_dir, TRANSCRIPTS_SCHEMA)

    all_rows = [(r["src_turn"], r["dst_turn"], r["kind"]) for r in spark.read.parquet(out_dir).collect()]
    got = set(all_rows)
    assert len(all_rows) == len(got), "duplicate edge emissions"
    assert (1, 0, "reply") in got
    assert (2, 1, "reply") in got
    assert (3, 2, "reply") in got
    assert (3, 1, "tool") in got


def test_streaming_tool_edge_retro_and_same_batch_dedup(spark, tmp_path):
    """Assistant arriving AFTER its tool turn still yields the tool edge
    (retro-trigger on prefix completion); consecutive turns in one batch
    emit their shared reply edge exactly once."""
    import pyspark.sql.functions as F

    def as_df(rws):
        return spark.createDataFrame(rws, "conv_id string, turn_idx int, role string, tool string").select(
            "conv_id", "turn_idx", "role", F.lit("x").alias("text"), "tool",
            F.to_timestamp(F.lit("2026-01-01")).alias("ts"),
        )

    in_dir, out_dir, ck_dir = (str(tmp_path / d) for d in ("in", "out", "ck"))
    os.makedirs(in_dir)
    # batch 1: tool turn arrives before its invoking assistant turn
    as_df([("c", 0, "user", None), ("c", 2, "tool", "web")]).write.mode("append").parquet(in_dir)
    run_ingest(spark, in_dir, out_dir, ck_dir, TRANSCRIPTS_SCHEMA)
    mid = {(r["src_turn"], r["dst_turn"], r["kind"]) for r in spark.read.parquet(out_dir).collect()}
    assert (2, 1, "tool") not in mid  # not emitted yet: turn 1 unknown
    # batch 2: the assistant turn lands, plus two consecutive new turns
    as_df([("c", 1, "assistant", "web"), ("c", 3, "user", None), ("c", 4, "assistant", None)]).write.mode(
        "append"
    ).parquet(in_dir)
    run_ingest(spark, in_dir, out_dir, ck_dir, TRANSCRIPTS_SCHEMA)

    all_rows = [(r["src_turn"], r["dst_turn"], r["kind"]) for r in spark.read.parquet(out_dir).collect()]
    assert len(all_rows) == len(set(all_rows)), "duplicate edge emissions"
    got = set(all_rows)
    assert got == {
        (1, 0, "reply"), (2, 1, "reply"), (3, 2, "reply"), (4, 3, "reply"),
        (2, 1, "tool"),
    }


def test_incremental_refresh_job(spark, tmp_path):
    """Two refresh cycles over a growing transcript stream: cycle 2 warm-starts
    from cycle 1's ranks and produces the same ranks as a cold batch run over
    the full data (unique fixed point)."""
    import importlib.util
    import os as _os

    spec = importlib.util.spec_from_file_location(
        "run_incremental", _os.path.join(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))), "jobs", "run_incremental.py")
    )
    job = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(job)

    t = synth_transcripts(spark, 16).cache()
    in_dir = str(tmp_path / "in")
    work = str(tmp_path / "work")
    _os.makedirs(in_dir)

    t.filter("pmod(xxhash64(conv_id), 2) = 0").write.mode("append").parquet(in_dir)
    r1 = job.refresh(spark, in_dir, work, tol=1e-9, max_iters=100)
    assert r1["converged"] and not r1["warm"]

    t.filter("pmod(xxhash64(conv_id), 2) = 1").write.mode("append").parquet(in_dir)
    r2 = job.refresh(spark, in_dir, work, tol=1e-9, max_iters=100)
    assert r2["converged"] and r2["warm"]

    got = {
        (r["conv_id"], r["turn_idx"]): r["rank"]
        for r in spark.read.parquet(str(tmp_path / "work" / "ranks")).collect()
    }

    # cold batch truth over the full transcript set
    from pagerank_spark.algos.pagerank import pagerank
    from pagerank_spark.operators.edges import transcripts_to_graph

    ids, edges = transcripts_to_graph(t)
    res = pagerank(edges, vertices=ids.selectExpr("vid as id"), tol=1e-9, max_iters=100, check_every=3)
    expected = {
        (r["conv_id"], r["turn_idx"]): r["rank"]
        for r in res.ranks.join(ids, res.ranks.id == ids.vid).select("conv_id", "turn_idx", "rank").collect()
    }
    assert set(got) == set(expected)
    for k in expected:
        assert abs(got[k] - expected[k]) < 1e-6, k

"""Checkpoint/resume, skew salting, and multimodal plumbing tests."""

import numpy as np
from pyspark.sql import functions as F

from pagerank_spark.algos.pagerank import pagerank
from pagerank_spark.operators.multimodal import extract_features, synth_media
from pagerank_spark.operators.skew import detect_hubs, partition_histogram, salted_sum
from pagerank_spark.plans.checkpoint import Checkpointer
from pagerank_spark.sources.graphs import er_edges_numpy, hub_skew_graph


def _edges_df(spark, arr):
    return spark.createDataFrame([(int(s), int(d)) for s, d in arr], "src long, dst long")


def test_checkpoint_resume_identical(spark, tmp_path):
    """Kill after superstep k, resume: final ranks identical to an
    uninterrupted run (north_rule resumability)."""
    arr = er_edges_numpy(80, 300, seed=6)
    edges = _edges_df(spark, arr)

    full = pagerank(edges, max_iters=12, tol=0.0)
    ranks_full = {r["id"]: r["rank"] for r in full.ranks.collect()}

    ck = Checkpointer(spark, str(tmp_path / "ck"))
    partial = pagerank(edges, max_iters=5, tol=0.0, checkpointer=ck)  # "killed" after 5
    assert ck.committed_supersteps()[-1] == 5

    resumed = pagerank(edges, max_iters=12, tol=0.0, checkpointer=ck)  # resumes at 5
    ranks_resumed = {r["id"]: r["rank"] for r in resumed.ranks.collect()}

    assert set(ranks_full) == set(ranks_resumed)
    for k in ranks_full:
        assert abs(ranks_full[k] - ranks_resumed[k]) < 1e-12
    # metrics recorded for every superstep
    assert [m["superstep"] for m in ck.metrics()] == list(range(1, 13))


def test_checkpoint_ignores_uncommitted(spark, tmp_path):
    """A superstep directory without the _SUCCESS marker (crash mid-write)
    is invisible to resume."""
    arr = er_edges_numpy(30, 100, seed=8)
    ck = Checkpointer(spark, str(tmp_path / "ck2"))
    pagerank(_edges_df(spark, arr), max_iters=3, tol=0.0, checkpointer=ck)
    import os

    os.remove(ck._marker(3))
    assert ck.committed_supersteps() == [1, 2]
    k, df, extra = ck.latest()
    assert k == 2 and df.count() > 0


def test_hub_detection_and_salting(spark):
    edges = hub_skew_graph(spark, v=20000, e=60000, n_hubs=2, seed=3).persist()
    hubs = detect_hubs(edges, "dst", threshold=1000)
    hub_ids = {r["hub_id"] for r in hubs.collect()}
    assert 1 <= len(hub_ids) <= 4  # the synthetic hubs, nothing else

    # correctness: salted sum == plain sum
    plain = {
        r["dst"]: r["total"]
        for r in edges.groupBy("dst").agg(F.count(F.lit(1)).cast("double").alias("total")).collect()
    }
    salted = {r["dst"]: r["total"] for r in salted_sum(edges, "dst", F.lit(1.0), hubs, n_salts=16).collect()}
    assert plain == salted

    # scale property: phase-1 shuffle keys are bounded — the hot key fans out
    phase1 = edges.join(hubs.withColumnRenamed("hub_id", "dst"), "dst", "left_semi")
    hot_rows = phase1.count()
    assert hot_rows > 10000  # the skew is real
    # after salting, the max per-(key,salt) group is ~hot_rows/n_salts
    grouped = (
        edges.withColumn("salt", F.pmod(F.xxhash64("src", "dst"), F.lit(16)))
        .groupBy("dst", "salt")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(F.max("c").alias("mx"))
        .first()
    )
    assert grouped["mx"] < hot_rows  # no single reducer sees a whole hub
    edges.unpersist()


def test_multimodal_plumbing(spark):
    media = synth_media(spark, 64)
    feats = extract_features(media, fake_decode=True).collect()
    assert len(feats) == 64
    assert all(len(r["feature"]) == 8 for r in feats)
    assert all(r["decode_ok"] for r in feats)
    # determinism: same media id -> same feature on rerun
    again = extract_features(synth_media(spark, 64), fake_decode=True).collect()
    f1 = {r["media_id"]: tuple(r["feature"]) for r in feats}
    f2 = {r["media_id"]: tuple(r["feature"]) for r in again}
    assert f1 == f2


def test_multimodal_real_decode_stubbed(spark):
    # sha2-derived payloads are not PPM: the real-decode path flags them
    media = synth_media(spark, 4)
    rows = extract_features(media, fake_decode=False).collect()
    assert all(not r["decode_ok"] for r in rows)


def test_multimodal_ppm_real_decode(spark):
    """Non-fake decode of real P6 PPM payloads, verified against NumPy."""
    from pagerank_spark.operators.multimodal import decode_ppm, encode_ppm

    rng = np.random.default_rng(17)
    imgs = [rng.integers(0, 256, size=(16, 24, 3), dtype=np.uint8) for _ in range(3)]
    rows = [(i, bytearray(encode_ppm(img))) for i, img in enumerate(imgs)]
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r["media_id"]: r for r in extract_features(media, fake_decode=False).collect()}
    assert all(got[i]["decode_ok"] for i in range(3))
    for i, img in enumerate(imgs):
        gray = img.astype(np.float32).mean(axis=2)
        expect = [float(b.mean()) for b in np.array_split(gray, 8, axis=1)]
        assert np.allclose(got[i]["feature"], expect, atol=1e-4)
        # round-trip parity of the decoder itself
        assert np.array_equal(decode_ppm(bytes(rows[i][1])), img.astype(np.float32))


def test_multimodal_wav_real_decode(spark):
    """WAV/PCM16 decode: 8-band RMS of a synthesized two-level signal."""
    from pagerank_spark.operators.multimodal import encode_wav, extract_audio_features

    sr = 8000
    quiet = 0.1 * np.sin(2 * np.pi * 440 * np.arange(sr // 2) / sr)
    loud = 0.8 * np.sin(2 * np.pi * 440 * np.arange(sr // 2) / sr)
    wave = np.concatenate([quiet, loud]).astype(np.float32)
    media = spark.createDataFrame(
        [(0, bytearray(encode_wav(wave, sr))), (1, bytearray(b"not audio"))],
        "media_id long, payload binary",
    )
    got = {r["media_id"]: r for r in extract_audio_features(media).collect()}
    assert got[0]["decode_ok"] and not got[1]["decode_ok"]
    f = got[0]["feature"]
    # first half quiet, second half loud: band RMS ratio ~ 8x
    assert f[0] < 0.12 and f[7] > 0.4


def test_async_commit_matches_sync_and_resumes(spark, tmp_path):
    """async_commit overlaps commits with the next block but publishes the
    identical sequence of committed supersteps, and a run resumed from an
    async-committed checkpoint matches the uninterrupted run exactly."""
    arr = er_edges_numpy(80, 300, seed=6)
    edges = _edges_df(spark, arr)

    full = pagerank(edges, max_iters=12, tol=0.0)
    ranks_full = {r["id"]: r["rank"] for r in full.ranks.collect()}

    ck_s = Checkpointer(spark, str(tmp_path / "sync"))
    pagerank(edges, max_iters=6, tol=0.0, checkpointer=ck_s)
    ck_a = Checkpointer(spark, str(tmp_path / "async"))
    pagerank(edges, max_iters=6, tol=0.0, checkpointer=ck_a, async_commit=True)
    assert ck_a.committed_supersteps() == ck_s.committed_supersteps() == list(range(1, 7))
    ks, dfs, _ = ck_s.latest()
    ka, dfa, _ = ck_a.latest()
    assert ks == ka
    rs = {r["id"]: r["rank"] for r in dfs.collect()}
    ra = {r["id"]: r["rank"] for r in dfa.collect()}
    assert rs.keys() == ra.keys()
    for k in rs:
        assert abs(rs[k] - ra[k]) < 1e-15

    resumed = pagerank(edges, max_iters=12, tol=0.0, checkpointer=ck_a, async_commit=True)
    ranks_resumed = {r["id"]: r["rank"] for r in resumed.ranks.collect()}
    for k in ranks_full:
        assert abs(ranks_full[k] - ranks_resumed[k]) < 1e-12
    assert [m["superstep"] for m in ck_a.metrics()] == list(range(1, 13))


def test_float32_shuffle_close_to_double(spark):
    """The float32 contribution shuffle tracks the double run to float
    precision (~1e-7 relative) — a throughput trade, not a correctness one."""
    arr = er_edges_numpy(200, 900, seed=4)
    edges = _edges_df(spark, arr)
    d = {r["id"]: r["rank"] for r in pagerank(edges, max_iters=8, tol=0.0).ranks.collect()}
    f = {
        r["id"]: r["rank"]
        for r in pagerank(edges, max_iters=8, tol=0.0, float32_shuffle=True).ranks.collect()
    }
    assert d.keys() == f.keys()
    for k in d:
        assert abs(d[k] - f[k]) <= 1e-6 * max(abs(d[k]), 1e-3)


# -- chunked_self_pairs -----------------------------------------------------


def test_chunked_self_pairs_equals_bare_join(spark):
    from pyspark.sql import functions as F

    from pagerank_spark.operators.skew import chunked_self_pairs

    # one hot bucket (600 entries, forces multiple chunks at chunk_size=64)
    # plus several cold buckets
    rows = [(i, "hot") for i in range(600)] + [
        (1000 + i, f"cold{i % 7}") for i in range(70)
    ]
    df = spark.createDataFrame(rows, "id long, g string")
    got = {
        (r.a_id, r.b_id)
        for r in chunked_self_pairs(df, "g", "id", chunk_size=64).collect()
    }
    a = df.select(F.col("id").alias("x"), "g")
    b = df.select(F.col("id").alias("y"), "g")
    exp = {
        (r.x, r.y)
        for r in a.join(b, "g").filter(F.col("x") < F.col("y")).collect()
    }
    assert got == exp


def test_chunked_self_pairs_multicol_key_and_extras(spark):
    from pyspark.sql import functions as F

    from pagerank_spark.operators.skew import chunked_self_pairs

    rows = [(i, i % 3, i % 2, i * 10) for i in range(40)]
    df = spark.createDataFrame(rows, "id long, k1 long, k2 long, sz long")
    got = {
        (r.a_id, r.b_id, r.a_sz, r.b_sz)
        for r in chunked_self_pairs(
            df, ["k1", "k2"], "id", extra_cols=("sz",), chunk_size=4
        ).collect()
    }
    a = df.select(F.col("id").alias("x"), "k1", "k2", F.col("sz").alias("sx"))
    b = df.select(F.col("id").alias("y"), "k1", "k2", F.col("sz").alias("sy"))
    exp = {
        (r.x, r.y, r.sx, r.sy)
        for r in a.join(b, ["k1", "k2"]).filter(F.col("x") < F.col("y")).collect()
    }
    assert got == exp

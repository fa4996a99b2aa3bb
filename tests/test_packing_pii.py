"""Sequence packing placement, deterministic hash split, PII scrub."""

import pytest
from pyspark.sql import functions as F

from pagerank_spark.operators.packing import KNUTH, hash_split, pack_chunks
from pagerank_spark.operators.textops import pii_scrub


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_pack_chunks_hand_fixture(spark):
    # token counts: 3, 250, 10, 0, 600 with budget 256
    rows = [
        (0, "a b c"),
        (1, " ".join(["t"] * 250)),
        (2, " ".join(["u"] * 10)),
        (3, "   "),
        (4, " ".join(["v"] * 600)),
    ]
    got = {r["doc_id"]: r for r in pack_chunks(_docs(spark, rows), budget=256).collect()}
    assert (got[0]["start_offset"], got[0]["first_chunk"], got[0]["last_chunk"]) == (0, 0, 0)
    # doc1: offsets [3, 253) -> chunk 0 only
    assert (got[1]["first_chunk"], got[1]["last_chunk"], got[1]["n_chunks"]) == (0, 0, 1)
    # doc2: offsets [253, 263) -> straddles chunks 0-1
    assert (got[2]["first_chunk"], got[2]["last_chunk"], got[2]["n_chunks"]) == (0, 1, 2)
    # doc3: zero tokens -> no chunk, sentinels
    assert (got[3]["n_tokens"], got[3]["first_chunk"], got[3]["n_chunks"]) == (0, -1, 0)
    # doc4: offsets [263, 863) -> chunks 1..3
    assert (got[4]["start_offset"], got[4]["first_chunk"], got[4]["last_chunk"], got[4]["n_chunks"]) == (263, 1, 3, 3)


def test_pack_chunks_sharded_independent_streams(spark):
    df = spark.createDataFrame(
        [(i, "w " * 100, i % 3) for i in range(30)], "doc_id long, text string, shard int"
    )
    out = pack_chunks(df, budget=256, shard_col="shard").collect()
    by_shard = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(r)
    for shard, rows in by_shard.items():
        rows.sort(key=lambda r: r["doc_id"])
        # each shard is its own stream starting at offset 0
        assert rows[0]["start_offset"] == 0
        for a, b in zip(rows, rows[1:]):
            assert b["start_offset"] == a["start_offset"] + a["n_tokens"]


def test_pack_chunks_rejects_bad_budget(spark):
    with pytest.raises(ValueError, match="budget"):
        pack_chunks(_docs(spark, [(0, "x")]), budget=0)


def test_hash_split_deterministic_and_proportional(spark):
    df = spark.range(20000).select(F.col("id").alias("doc_id"))
    a = {r["doc_id"]: r["split"] for r in hash_split(df).collect()}
    b = {r["doc_id"]: r["split"] for r in hash_split(df.repartition(13)).collect()}
    assert a == b  # stable under repartitioning
    n = len(a)
    frac_train = sum(1 for s in a.values() if s == "train") / n
    frac_val = sum(1 for s in a.values() if s == "val") / n
    assert abs(frac_train - 0.90) < 0.02
    assert abs(frac_val - 0.05) < 0.01
    # matches the closed-form bucket arithmetic
    for i in (0, 1, 17, 19999):
        bucket = ((i * KNUTH) % (1 << 32)) % 100
        expect = "train" if bucket < 90 else ("val" if bucket < 95 else "test")
        assert a[i] == expect


def test_hash_split_salt_changes_assignment(spark):
    df = spark.range(5000).select(F.col("id").alias("doc_id"))
    a = {r["doc_id"]: r["split"] for r in hash_split(df, salt=0).collect()}
    b = {r["doc_id"]: r["split"] for r in hash_split(df, salt=1).collect()}
    assert a != b


def test_pii_scrub_fixture(spark):
    rows = [
        (0, "mail me at jo.doe+x@sub.example.org or call 415-555-1234 from 192.168.0.1"),
        (1, "no pii here at all"),
        (2, "two mails: a@b.co and c.d@e-f.io"),
    ]
    got = {r["doc_id"]: r for r in pii_scrub(_docs(spark, rows)).collect()}
    assert (got[0]["n_email"], got[0]["n_phone"], got[0]["n_ipv4"]) == (1, 1, 1)
    assert got[0]["scrubbed"] == "mail me at <email> or call <phone> from <ipv4>"
    assert (got[1]["n_email"], got[1]["n_phone"], got[1]["n_ipv4"]) == (0, 0, 0)
    assert got[1]["scrubbed"] == "no pii here at all"
    assert got[2]["n_email"] == 2
    assert got[2]["scrubbed"] == "two mails: <email> and <email>"


def test_quantile_bins_equal_frequency_and_determinism(spark):
    from pagerank_spark.operators.packing import quantile_bins

    rows = [(i, float((i * 7) % 20)) for i in range(40)]
    df = spark.createDataFrame(rows, ["doc_id", "v"])
    got = {r["doc_id"]: r["bin"] for r in quantile_bins(df, "v", 4).collect()}
    # equal frequency: 10 per bin
    from collections import Counter

    assert Counter(got.values()) == {1: 10, 2: 10, 3: 10, 4: 10}
    # rank order respected: every bin-1 value <= every bin-4 value
    v = dict(rows)
    assert max(v[i] for i, b in got.items() if b == 1) <= min(v[i] for i, b in got.items() if b == 4)
    got2 = {r["doc_id"]: r["bin"] for r in quantile_bins(df.repartition(9), "v", 4).collect()}
    assert got == got2  # id tiebreak makes ties deterministic


def test_stratified_sample_deterministic_and_exact(spark):
    from pagerank_spark.operators.packing import KNUTH, stratified_sample

    rows = [(i, "en" if i % 3 == 0 else "de") for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = {(r.doc_id, r.lang) for r in stratified_sample(df, "lang", {"en": 25}, default_pct=80).collect()}
    exp = {
        (i, l)
        for i, l in rows
        if ((i * KNUTH) % (1 << 32)) % 100 < (25 if l == "en" else 80)
    }
    assert out == exp
    # repartitioning must not change membership
    out2 = {(r.doc_id, r.lang) for r in stratified_sample(df.repartition(7), "lang", {"en": 25}, default_pct=80).collect()}
    assert out2 == exp


def test_stratified_sample_default_drops_unlisted_groups(spark):
    from pagerank_spark.operators.packing import stratified_sample

    df = spark.createDataFrame([(1, "en"), (2, "fr")], "doc_id long, lang string")
    kept = stratified_sample(df, "lang", {"en": 100}).collect()  # default_pct=0
    assert {r.lang for r in kept} == {"en"}


def test_quantile_bins_approx_no_window_and_error_bound(spark):
    """Approx mode: no Window node anywhere in the physical plan (the exact
    mode's single-partition NTILE sort is the known 100-TB cliff), and at
    full sketch accuracy the comparison binning reproduces NTILE's bin for
    every row that is not tied with a cutpoint value."""
    from pagerank_spark.operators.packing import quantile_bins

    rows = [(i, float((i * 37) % 1000)) for i in range(2000)]
    df = spark.createDataFrame(rows, ["doc_id", "v"])

    approx = quantile_bins(df, "v", 8, mode="approx")
    plan = approx._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan

    got_a = {r["doc_id"]: r["bin"] for r in approx.collect()}
    got_e = {r["doc_id"]: r["bin"] for r in quantile_bins(df, "v", 8).collect()}
    # error contract: bins agree except where the exact NTILE splits a tie
    # group across bins (comparison binning puts the whole tie group on one
    # side of the cut); with 2000 distinct-ish values and accuracy 10k the
    # disagreement set is confined to cutpoint-tied rows
    diffs = [i for i in got_a if got_a[i] != got_e[i]]
    assert len(diffs) <= 16  # <= n_bins-1 cut ties x tie-group width (2)
    from collections import Counter

    sizes = Counter(got_a.values())
    assert set(sizes) == set(range(1, 9))
    assert all(abs(c - 250) <= 5 for c in sizes.values())


def test_quantile_bins_bad_mode(spark):
    import pytest as _pytest

    from pagerank_spark.operators.packing import quantile_bins

    df = spark.createDataFrame([(1, 1.0)], ["doc_id", "v"])
    with _pytest.raises(ValueError):
        quantile_bins(df, "v", 4, mode="median-of-medians")

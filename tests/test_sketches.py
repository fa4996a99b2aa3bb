"""Count-min + Bloom sketches (operators/sketches.py): bit-exact pure-Python
replay, overestimate/no-false-negative guarantees, mergeability."""

from collections import Counter

from pyspark.sql import functions as F

from pagerank_spark.operators.sketches import (
    KNUTH,
    M31,
    MIX,
    bloom_build,
    bloom_probe,
    cms_build,
    cms_estimate,
)

WORDS = [f"tok{i % 13}" for i in range(200)] + ["rare", "rare", "unique"]


def _poly31(s):
    h = 0
    for c in s:
        h = (h * 31 + ord(c)) % M31
    return h


def _mix31(v, salt):
    h1 = (v * KNUTH + salt) % M31
    h1 ^= h1 >> 15
    h2 = (h1 * MIX + 1) % M31
    return h2 ^ (h2 >> 13)


def _cms_replay(words, depth, width, salt):
    cells = Counter()
    for w in words:
        v = _poly31(w)
        for i in range(depth):
            cells[(i, _mix31(v, salt + i) % width)] += 1
    return cells


def _df(spark, words):
    return spark.createDataFrame([(w,) for w in words], ["tok"])


def test_cms_cells_match_python_replay(spark):
    sk = cms_build(_df(spark, WORDS), "tok", depth=3, width=16, salt=17)
    got = {(r["row"], r["col"]): r["cnt"] for r in sk.collect()}
    assert got == dict(_cms_replay(WORDS, 3, 16, 17))


def test_cms_estimate_overestimates_and_tightens(spark):
    df = _df(spark, WORDS)
    exact = Counter(WORDS)
    keys = _df(spark, sorted(exact))
    # narrow sketch: estimates never BELOW the truth
    sk = cms_build(df, "tok", depth=3, width=8)
    est = {r["tok"]: r["est"] for r in cms_estimate(sk, keys, "tok", 3, 8).collect()}
    assert all(est[w] >= c for w, c in exact.items())
    # wide sketch (no collisions at 15 distinct keys): exact
    sk2 = cms_build(df, "tok", depth=4, width=4096)
    est2 = {r["tok"]: r["est"] for r in cms_estimate(sk2, keys, "tok", 4, 4096).collect()}
    assert est2 == dict(exact)


def test_cms_unseen_key_estimates_zero_when_cells_empty(spark):
    sk = cms_build(_df(spark, ["a"]), "tok", depth=2, width=4096)
    est = {r["tok"]: r["est"] for r in cms_estimate(sk, _df(spark, ["zzz"]), "tok", 2, 4096).collect()}
    assert est["zzz"] == 0


def test_cms_merges_by_cell_sum(spark):
    a, b = WORDS[:100], WORDS[100:]
    whole = {(r["row"], r["col"]): r["cnt"] for r in cms_build(_df(spark, a + b), "tok", 3, 16).collect()}
    pa = cms_build(_df(spark, a), "tok", 3, 16)
    pb = cms_build(_df(spark, b), "tok", 3, 16)
    merged = {
        (r["row"], r["col"]): r["cnt"]
        for r in pa.unionByName(pb).groupBy("row", "col").agg(F.sum("cnt").alias("cnt")).collect()
    }
    assert merged == whole


def test_bloom_no_false_negatives_and_replay(spark):
    members = sorted(set(WORDS))
    bl = bloom_build(_df(spark, members), "tok", m_bits=64, k_hashes=3, salt=29)
    probes = members + ["nope1", "nope2", "xyzzy", "qq"]
    got = {
        r["tok"]: r["maybe"]
        for r in bloom_probe(_df(spark, probes), bl, "tok", 64, 3, 29).collect()
    }
    # replay: build the bit set in python
    bits = set()
    for w in members:
        v = _poly31(w)
        for j in range(3):
            bits.add(_mix31(v, 29 + j) % 64)
    for w in probes:
        v = _poly31(w)
        want = int(all((_mix31(v, 29 + j) % 64) in bits for j in range(3)))
        assert got[w] == want
    assert all(got[w] == 1 for w in members)  # never a false negative


def test_bloom_definite_absence_with_sparse_filter(spark):
    bl = bloom_build(_df(spark, ["only"]), "tok", m_bits=4096, k_hashes=4)
    got = {
        r["tok"]: r["maybe"]
        for r in bloom_probe(_df(spark, ["only", "other"]), bl, "tok", 4096, 4).collect()
    }
    assert got == {"only": 1, "other": 0}


# ---- HyperLogLog ----

from pagerank_spark.operators.sketches import hll_build, hll_estimate, hll_merge


def _hll_replay(keys, p, salt):
    regs = {}
    for kx in keys:
        h = _mix31(_poly31(kx), salt)
        reg = h % (1 << p)
        w = h >> p
        rho = (31 - p + 1) - w.bit_length()
        regs[reg] = max(regs.get(reg, 0), rho)
    return regs


def _words_df(spark):
    return spark.createDataFrame([(w,) for w in WORDS], "word string")


def test_hll_registers_match_replay(spark):
    got = {
        (r["reg"], r["rho"])
        for r in hll_build(_words_df(spark), "word", p=4, salt=37).collect()
    }
    assert got == set(_hll_replay(WORDS, 4, 37).items())


def test_hll_grouped_and_merge(spark):
    df = spark.createDataFrame(
        [(w, "a" if i % 2 == 0 else "b") for i, w in enumerate(WORDS)],
        "word string, g string",
    )
    whole = hll_build(df, "word", p=5)
    parts = hll_merge(
        hll_build(df.filter(F.col("g") == "a"), "word", p=5),
        hll_build(df.filter(F.col("g") == "b"), "word", p=5),
    )
    assert sorted(map(tuple, whole.collect())) == sorted(map(tuple, parts.collect()))


def test_hll_estimate_accuracy(spark):
    # 5000 distinct keys at p=8 (m=256): expected rel-error ~1.04/16 ≈ 6.5%;
    # assert within 4 sigma
    df = spark.range(5000).select(F.concat(F.lit("key"), F.col("id")).alias("word"))
    est = hll_estimate(hll_build(df, "word", p=8), p=8).collect()[0]["est"]
    assert abs(est - 5000) / 5000 < 0.26


def test_hll_small_range_linear_counting(spark):
    df = spark.createDataFrame([(f"k{i}",) for i in range(10)], "word string")
    row = hll_estimate(hll_build(df, "word", p=8), p=8).collect()[0]
    # 10 distinct at m=256 -> linear-counting branch; very tight there
    assert abs(row["est"] - 10) < 3
    assert row["zeros"] >= 256 - 10


def test_hll_denom_is_exact_integer(spark):
    df = _words_df(spark)
    row = hll_estimate(hll_build(df, "word", p=4, salt=37), p=4).collect()[0]
    regs = _hll_replay(WORDS, 4, 37)
    want = sum(1 << (32 - r) for r in regs.values()) + (16 - len(regs)) * (1 << 32)
    assert row["denom_scaled"] == want
    assert row["zeros"] == 16 - len(regs)

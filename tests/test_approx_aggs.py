"""Approximate-aggregate scale paths vs their exact counterparts.

The gates pin EXACT semantics (quantiles_lineitem vs quantile_cont); at
100 TB the engine swaps in the sketch versions — percentile_approx
(t-digest-style, single pass, mergeable partials) and
approx_count_distinct (HyperLogLog++). These tests pin the swap's error
contract so the substitution is a measured trade, not a hope."""

from pyspark.sql import functions as F


def _values(spark, n=20000):
    # deterministic long-tailed positives: x = (h % 1000)^2 / 100
    return spark.range(n).select(
        (F.pow(F.pmod(F.xxhash64("id"), F.lit(1000)).cast("double"), F.lit(2.0)) / 100.0).alias("x"),
        F.pmod(F.xxhash64("id", F.lit("k")), F.lit(3)).alias("g"),
    )


def test_percentile_approx_within_accuracy_contract(spark):
    df = _values(spark)
    row = df.agg(
        F.expr("percentile(x, array(0.5D, 0.95D))").alias("exact"),
        F.expr("percentile_approx(x, array(0.5D, 0.95D), 10000)").alias("approx"),
    ).first()
    n = df.count()
    # percentile_approx(accuracy=a) guarantees rank error <= n/a; convert the
    # returned values to ranks and check the bound (value-space comparison
    # would be scale-dependent on a long tail)
    xs = sorted(r["x"] for r in df.collect())
    for exact, approx, q in zip(row["exact"], row["approx"], (0.5, 0.95)):
        import bisect

        # the returned value occupies the rank interval [lo, hi) (duplicate
        # runs); error is the distance from the target rank to that interval
        lo, hi = bisect.bisect_left(xs, approx), bisect.bisect_right(xs, approx)
        err = max(lo - q * n, q * n - (hi - 1), 0)
        assert err <= n / 10000 + 2, (q, exact, approx, lo, hi)


def test_approx_count_distinct_within_rsd(spark):
    df = _values(spark, 50000).select(F.pmod(F.xxhash64("x"), F.lit(7919)).alias("k"))
    row = df.agg(
        F.countDistinct("k").alias("exact"),
        F.approx_count_distinct("k", rsd=0.02).alias("approx"),
    ).first()
    # HLL++ rsd=0.02 -> generous 5-sigma-ish tolerance
    assert abs(row["approx"] - row["exact"]) <= 0.1 * row["exact"] + 5


def test_grouped_approx_percentile_matches_exact_shape(spark):
    df = _values(spark)
    exact = {
        r["g"]: r["p"]
        for r in df.groupBy("g").agg(F.expr("percentile(x, 0.5D)").alias("p")).collect()
    }
    approx = {
        r["g"]: r["p"]
        for r in df.groupBy("g").agg(F.expr("percentile_approx(x, 0.5D, 10000)").alias("p")).collect()
    }
    assert set(exact) == set(approx) == {0, 1, 2}
    for g in exact:
        # within 1% of the group's exact median on this distribution
        assert abs(approx[g] - exact[g]) <= 0.01 * max(1.0, exact[g])


def test_ams_f2_exact_and_unbiased_shape(spark):
    from pagerank_spark.operators.sketches import ams_f2

    # planted stream: token t_i appears i times, i = 1..6 -> F2 = sum i^2 = 91
    rows = [(f"t{i}",) for i in range(1, 7) for _ in range(i)]
    df = spark.createDataFrame(rows, ["tok"])
    out = ams_f2(df, "tok", reps=8, salt=53).collect()
    assert len(out) == 8
    assert all(r.f2_exact == 91 for r in out)
    assert all(r.est == r.z * r.z for r in out)
    # replay the signs in pure Python (poly31 + mix31)
    M31, KNUTH, MIX = 1 << 31, 2654435761, 2246822519

    def poly31(s):
        a = 0
        for c in s:
            a = (a * 31 + ord(c)) % M31
        return a

    def mix31(v, salt):
        h1 = (v * KNUTH + salt) % M31
        h1 ^= h1 >> 15
        h2 = (h1 * MIX + 1) % M31
        return h2 ^ (h2 >> 13)

    got = {r.rep: r.z for r in out}
    for rep in range(8):
        z = sum(
            (1 - 2 * (mix31(poly31(t), 53 + rep) % 2))
            for t, in rows
        )
        assert got[rep] == z, rep

"""Edit-distance join (operators/stringjoin.py) vs brute force."""

import itertools

import pytest
from pyspark.sql import functions as F

from pagerank_spark.operators.stringjoin import edit_distance_join


def _lev(a: str, b: str) -> int:
    dp = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        prev, dp[0] = dp[0], i
        for j, cb in enumerate(b, 1):
            cur = dp[j]
            dp[j] = min(dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb))
            prev = cur
    return dp[-1]


def _brute(rows, k):
    return sorted(
        (i, j, _lev(a, b))
        for (i, a), (j, b) in itertools.combinations(rows, 2)
        if _lev(a, b) <= k
    )


CORPUS = [
    "alpha particle", "alpha particel", "beta decay", "beta decoy",
    "ab", "abc", "ac", "zzz", "", "a",
    "gamma ray burst", "gamma ray bursts", "gamma ray bursts",
    "muon", "muons", "meson",
]


@pytest.mark.parametrize("k", [1, 2])
def test_matches_brute_force(spark, k):
    rows = [(i, s) for i, s in enumerate(CORPUS)]
    df = spark.createDataFrame(rows, "id long, s string")
    got = sorted(tuple(r) for r in edit_distance_join(df, k=k, q=3).collect())
    assert got == _brute(rows, k)


def test_short_strings_exact(spark):
    # everything below the prefix-filter length cutoff
    rows = [(i, s) for i, s in enumerate(["", "a", "b", "ab", "ba", "abc", "abd", "xy"])]
    df = spark.createDataFrame(rows, "id long, s string")
    got = sorted(tuple(r) for r in edit_distance_join(df, k=1, q=3).collect())
    assert got == _brute(rows, 1)


def test_hot_bucket_guard_only_drops_documented(spark):
    rows = [(i, f"prefix shared {i}") for i in range(30)] + [(100, "unique zebra"), (101, "unique zebrb")]
    df = spark.createDataFrame(rows, "id long, s string")
    exact = sorted(tuple(r) for r in edit_distance_join(df, k=1, q=3).collect())
    with pytest.warns(UserWarning, match="precision trade"):
        capped = sorted(
            tuple(r) for r in edit_distance_join(df, k=1, q=3, max_gram_bucket=5).collect()
        )
    # capped result is a subset of the exact result
    assert set(capped) <= set(exact)
    # the rare pair survives capping
    assert (100, 101, 1) in capped


def test_parts_count_matches_banded_bruteforce_count(spark):
    parts = spark.read.parquet("/root/testdata/sf0.001/part.parquet").select(
        F.col("p_partkey").alias("id"), F.col("p_name").alias("s")
    )
    rows = [(r.id, r.s) for r in parts.collect()]
    got = edit_distance_join(parts, k=1, q=3).count()
    assert got == len(_brute(rows, 1))

"""Systematic PPS sampling: Python probe replay, certainty rows, edges."""

import pytest

from pagerank_spark.operators.packing import pps_systematic_sample


def py_pps(weights, k):
    """ids -> multiplicity via exact rational probe walk."""
    tot = sum(weights.values())
    out = {}
    cum = 0
    for i in sorted(weights):
        lo, cum = cum, cum + weights[i]
        # probes: (2j+1)*tot / (2k) in [lo, cum)
        m = sum(1 for j in range(k) if lo * 2 * k <= (2 * j + 1) * tot < cum * 2 * k)
        if m:
            out[i] = m
    return out


def _run(spark, weights, k):
    df = spark.createDataFrame(
        [(i, w) for i, w in weights.items()], "id long, w long"
    )
    got = pps_systematic_sample(df, ["id"], "w", k=k).collect()
    return {r.id: r.multiplicity for r in got}


def test_matches_python_probe_replay(spark):
    weights = {i: (i * 37) % 11 + 1 for i in range(40)}
    for k in (1, 3, 7, 40):
        assert _run(spark, weights, k) == py_pps(weights, k), k


def test_heavy_row_sampled_multiple_times(spark):
    weights = {1: 1, 2: 1, 3: 100, 4: 1, 5: 1}
    got = _run(spark, weights, 10)
    assert got[3] >= 9  # certainty overflow: w >> W/k
    assert sum(got.values()) == 10


def test_total_multiplicity_is_k(spark):
    weights = {i: i + 1 for i in range(25)}
    for k in (2, 5, 13):
        assert sum(_run(spark, weights, k).values()) == k


def test_zero_weight_rows_never_sampled(spark):
    weights = {1: 0, 2: 5, 3: 0, 4: 5}
    got = _run(spark, weights, 4)
    assert set(got) <= {2, 4} and sum(got.values()) == 4


def test_k_nonpositive_rejected(spark):
    df = spark.createDataFrame([(1, 1)], "id long, w long")
    with pytest.raises(ValueError):
        pps_systematic_sample(df, ["id"], "w", k=0)

"""CEM: hand-built strata with a known planted effect."""

import pytest
from pyspark.sql import functions as F

from pagerank_spark.operators.causal import cem_att, cem_strata


def _units(spark, rows):
    return spark.createDataFrame(rows, "stratum long, t int, y long")


def test_unmatched_strata_are_dropped_and_gap_is_exact(spark):
    rows = [
        # stratum 0: treated mean 100, control mean 60 -> gap 40
        (0, 1, 100), (0, 0, 50), (0, 0, 70),
        # stratum 1: treated-only -> dropped
        (1, 1, 999),
        # stratum 2: control-only -> dropped
        (2, 0, 999),
    ]
    got = cem_strata(
        _units(spark, rows),
        treated=F.col("t") == 1,
        outcome=F.col("y"),
        strata={"s": F.col("stratum")},
    ).collect()
    assert len(got) == 1
    r = got[0]
    assert (r.s, r.n_treated, r.n_control) == (0, 1, 2)
    assert r.diff_micro == 100 * 1_000_000 - 60 * 1_000_000


def test_att_is_treated_weighted(spark):
    rows = [
        (0, 1, 10), (0, 0, 0),            # gap 10, 1 treated
        (1, 1, 40), (1, 1, 40), (1, 0, 10),  # gap 30, 2 treated
    ]
    tbl = cem_strata(
        _units(spark, rows),
        treated=F.col("t") == 1,
        outcome=F.col("y"),
        strata={"s": F.col("stratum")},
    )
    att = cem_att(tbl).collect()[0]
    assert att.n_treated_matched == 3 and att.n_control_matched == 2
    assert att.att == pytest.approx((1 * 10 + 2 * 30) / 3, abs=1e-6)


def test_negative_gap_is_stable(spark):
    rows = [(0, 1, 10), (0, 0, 25), (0, 0, 26)]  # control mean 25.5 > treated
    r = cem_strata(
        _units(spark, rows),
        treated=F.col("t") == 1,
        outcome=F.col("y"),
        strata={"s": F.col("stratum")},
    ).collect()[0]
    assert r.diff_micro == 10 * 1_000_000 - (51 * 1_000_000) // 2

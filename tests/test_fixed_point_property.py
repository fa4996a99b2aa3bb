"""Property-based test: reference-exact fixed-point PageRank is bit-exact
vs the NumPy oracle on arbitrary small simple digraphs (min outdeg 1)."""

import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pagerank_spark.algos.pagerank import pagerank_fixed_point
from pagerank_spark.sources.graphs import ensure_min_outdeg, er_edges_numpy

from .oracles import fixed_point_oracle


@st.composite
def graph_params(draw):
    v = draw(st.integers(min_value=4, max_value=48))
    e = draw(st.integers(min_value=v, max_value=min(3 * v, v * (v - 1) // 2)))
    seed = draw(st.integers(min_value=0, max_value=10**6))
    rounds = draw(st.integers(min_value=1, max_value=5))
    return v, e, seed, rounds


@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(graph_params())
def test_fixed_point_bit_exact_random_graphs(spark, params):
    v, e, seed, rounds = params
    arr = ensure_min_outdeg(er_edges_numpy(v, e, seed), v)
    golden = fixed_point_oracle(v, arr, n_rounds=rounds)
    df = spark.createDataFrame([(int(s), int(d)) for s, d in arr], "src long, dst long")
    got = {r["id"]: r["rank_fp"] for r in pagerank_fixed_point(df, rounds).collect()}
    got_arr = np.array([got.get(i, 0) for i in range(v)], dtype=np.int64)
    assert (got_arr == golden).all(), (v, e, seed, rounds)


def _df_from_arr(spark, arr):
    import pandas as pd

    return spark.createDataFrame(
        pd.DataFrame({"src": arr[:, 0].astype("int64"), "dst": arr[:, 1].astype("int64")})
    )


def test_fixed_point_at_2_16_boundary(spark):
    """V = 2^16 exactly: the last legal size. init_val degenerates to 1
    (floor(2^16 / 2^16)) — the reference's arithmetic is near-vacuous here
    but still defined, and the engine must match it bit-exactly."""
    v = 1 << 16
    arr = ensure_min_outdeg(er_edges_numpy(v, 2 * v, seed=3), v)
    golden = fixed_point_oracle(v, arr, n_rounds=2)
    got = {r["id"]: r["rank_fp"] for r in pagerank_fixed_point(_df_from_arr(spark, arr), 2).collect()}
    got_arr = np.array([got.get(i, 0) for i in range(v)], dtype=np.int64)
    assert (got_arr == golden).all()


def test_fixed_point_just_below_boundary(spark):
    """V = 2^16 - 1: largest size where init_val is still 1 via flooring a
    non-power-of-two ratio (floor(65536/65535)); three rounds of the
    near-vacuous arithmetic must stay bit-exact."""
    v = (1 << 16) - 1
    arr = ensure_min_outdeg(er_edges_numpy(v, 2 * v, seed=5), v)
    golden = fixed_point_oracle(v, arr, n_rounds=3)
    got = {r["id"]: r["rank_fp"] for r in pagerank_fixed_point(_df_from_arr(spark, arr), 3).collect()}
    got_arr = np.array([got.get(i, 0) for i in range(v)], dtype=np.int64)
    assert (got_arr == golden).all()


def test_fixed_point_rejects_above_2_16(spark):
    """V = 2^16 + 1 must raise: above the boundary init_val floors to 0 and
    every rank is identically zero (SURVEY.md §2a degeneracy guard)."""
    import pandas as pd
    import pytest

    v = (1 << 16) + 1
    ring = pd.DataFrame({"src": np.arange(v, dtype="int64"), "dst": (np.arange(v, dtype="int64") + 1) % v})
    df = spark.createDataFrame(ring)
    with pytest.raises(ValueError, match="degenerates"):
        pagerank_fixed_point(df, 2)

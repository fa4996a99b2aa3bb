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

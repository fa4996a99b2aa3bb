"""CSR layout parity tests against the decoded ``graphgen 6 10`` fixture
(FIXTURES.md §4) — pure NumPy, no Spark session needed."""

import numpy as np

from pagerank_spark.operators.csr import build_csr_inedges, decode_csr_inedges

# graphgen 6 10 decoded output (FIXTURES.md §4, [verified] against the
# reference generator): vertex records (offset, outdeg) and edge list.
FIX_OFFSETS = [0, 2, 5, 6, 7, 9]
FIX_OUTDEG = [0, 1, 1, 2, 1, 5]
FIX_EDGES = [(1, 4), (2, 1), (3, 1), (3, 5), (4, 0), (5, 0), (5, 1), (5, 2), (5, 3), (5, 4)]


def test_csr_build_matches_reference_fixture():
    edges = np.asarray(FIX_EDGES, dtype=np.int64)
    offsets, outdeg, srcs = build_csr_inedges(edges, 6)
    assert offsets.tolist() == FIX_OFFSETS
    assert outdeg.tolist() == FIX_OUTDEG
    # in-edge array grouped by dst (sources ascending within each group):
    # dst0 <- {4,5}, dst1 <- {2,3,5}, dst2 <- {5}, dst3 <- {5},
    # dst4 <- {1,5}, dst5 <- {3}
    assert srcs.tolist() == [4, 5, 2, 3, 5, 5, 5, 1, 5, 3]


def test_csr_roundtrip():
    edges = np.asarray(FIX_EDGES, dtype=np.int64)
    offsets, outdeg, srcs = build_csr_inedges(edges, 6)
    back = decode_csr_inedges(offsets, srcs)
    assert {tuple(e) for e in back} == set(FIX_EDGES)
    # offset-differencing recovers in-degrees (pagerank.v:1028-1033)
    bounds = np.concatenate([offsets, [len(srcs)]])
    indeg = (bounds[1:] - bounds[:-1]).tolist()
    assert indeg == [2, 3, 1, 1, 2, 1]

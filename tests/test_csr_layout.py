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


# Verbatim output of the compiled reference generator (`graphgen 6 10`,
# graphgen.cpp — unseeded glibc rand, deterministic on this platform),
# captured for decoder parity. Note the in-edge section is in the
# reference's unordered_set iteration order, NOT ascending.
REF_HEX_IMAGE = (
    "00000000000000000000000000000000000000000000000200000000000000010000000000000005000000000000000100000000000000060000000000000002\n"
    "00000000000000070000000000000001000000000000000900000000000000050000000000000000000000000000000000000000000000000000000000000000\n"
    "00000000000000050000000000000004000000000000000200000000000000050000000000000003000000000000000500000000000000050000000000000005\n"
    "00000000000000010000000000000003000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000\n"
    + "0" * 128
)


def test_decode_reference_hex_image():
    """Our decoder parses the real reference tool's image to the known graph."""
    from pagerank_spark.operators.csr import decode_hex_image

    offsets, outdeg, srcs = decode_hex_image(REF_HEX_IMAGE, 6, 10)
    assert offsets.tolist() == FIX_OFFSETS
    assert outdeg.tolist() == FIX_OUTDEG
    # per-group membership equals the fixture edge set (order within a group
    # is unordered_set iteration order in the reference — semantics-free)
    bounds = np.concatenate([offsets, [10]])
    got = {(int(s), v) for v in range(6) for s in srcs[bounds[v]: bounds[v + 1]]}
    assert got == set(FIX_EDGES)


def test_encode_hex_image_roundtrip_and_shape():
    from pagerank_spark.operators.csr import decode_hex_image, encode_hex_image

    edges = np.asarray(FIX_EDGES, dtype=np.int64)
    img = encode_hex_image(edges, 6)
    # identical line/word shape as the reference image: 8 16-hex words per
    # line, final pad without trailing newline
    ref_lines = REF_HEX_IMAGE.split("\n")
    lines = img.split("\n")
    assert [len(l) for l in lines] == [len(l) for l in ref_lines]
    # vertex section (offsets/outdeg + alignment pad) is byte-identical
    assert lines[0] == ref_lines[0] and lines[1] == ref_lines[1]
    offsets, outdeg, srcs = decode_hex_image(img, 6, 10)
    assert offsets.tolist() == FIX_OFFSETS
    assert outdeg.tolist() == FIX_OUTDEG
    bounds = np.concatenate([offsets, [10]])
    got = {(int(s), v) for v in range(6) for s in srcs[bounds[v]: bounds[v + 1]]}
    assert got == set(FIX_EDGES)


def test_reference_params_map():
    from pagerank_spark.operators.csr import reference_params

    p = reference_params(6, 10)
    # exact parity with the reference's params.txt for graphgen 6 10
    # (including its waddr1 overlap bug, SURVEY.md §8)
    assert (p["vaddr"], p["ieaddr"], p["waddr0"], p["waddr1"]) == (0, 128, 208, 176)
    assert p["waddr1_correct"] == 256

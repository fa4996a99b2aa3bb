"""Temporal motifs: brute-force replay on a hand-sized stream."""

from itertools import product

from pagerank_spark.operators.temporal import temporal_motif_counts
from pagerank_spark.sources.graphs import temporal_stream


def _brute(edges, delta):
    n2 = nr = nt = 0
    for (u, v, t1), (s2, w, t2) in product(edges, repeat=2):
        if v == s2 and t1 < t2 <= t1 + delta:
            if w == u:
                nr += 1
            else:
                n2 += 1
                for (s3, d3, t3) in edges:
                    if s3 == u and d3 == w and t2 < t3 <= t1 + delta:
                        nt += 1
    return n2, nr, nt


def test_handmade_stream(spark):
    edges = [(0, 1, 0), (1, 2, 1), (0, 2, 2), (1, 0, 3), (2, 0, 9), (0, 1, 10)]
    df = spark.createDataFrame(edges, "src long, dst long, t long")
    row = temporal_motif_counts(df, 5).collect()[0]
    assert (row.n_2path, row.n_return, row.n_triangle) == _brute(edges, 5)


def test_synth_stream_matches_bruteforce(spark):
    df = temporal_stream(spark, 200, 8)
    edges = [(r.src, r.dst, r.t) for r in df.collect()]
    row = temporal_motif_counts(df, 20).collect()[0]
    assert (row.n_2path, row.n_return, row.n_triangle) == _brute(edges, 20)
    assert row.n_2path > 0  # stream is dense enough to exercise the motif


def test_delta_zero_is_empty(spark):
    df = temporal_stream(spark, 100, 5)
    row = temporal_motif_counts(df, 0).collect()[0]
    assert (row.n_2path or 0, row.n_return or 0, row.n_triangle) == (0, 0, 0)

"""Sliding token windows (operators/packing.py:sliding_windows): exact
pure-Python replay of the coverage rule and offsets."""

import math

import pytest

from pagerank_spark.operators.packing import sliding_windows


def _replay(docs, window, stride):
    out = {}
    for did, text in docs:
        t = [w for w in text.lower().split() if w]
        L = len(t)
        if L == 0:
            continue
        n_win = 1 + math.ceil(max(L - window, 0) / stride)
        for c in range(n_win):
            s = c * stride
            chunk = t[s : s + window]
            out[(did, c)] = (s, len(chunk), " ".join(chunk))
    return out


DOCS = [
    (1, "a b c d e f g h i j"),  # L=10
    (2, "x y z"),  # shorter than window
    (3, ""),  # empty: no rows
    (4, "  p   q  r s t u v  "),  # messy whitespace, L=7
    (5, "m " * 64),  # L=64, exact multiple
]


def _got(spark, window, stride):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    return {
        (r["doc_id"], r["chunk_idx"]): (r["start_tok"], r["n_tokens"], r["chunk"])
        for r in sliding_windows(df, window=window, stride=stride).collect()
    }


@pytest.mark.parametrize("window,stride", [(4, 3), (4, 4), (8, 2), (64, 16)])
def test_matches_python_replay(spark, window, stride):
    assert _got(spark, window, stride) == _replay(DOCS, window, stride)


def test_every_token_covered_and_overlap(spark):
    got = _got(spark, 4, 3)
    covered = set()
    for (did, _), (s, n, _) in got.items():
        if did == 1:
            covered.update(range(s, s + n))
    assert covered == set(range(10))
    # overlap: window 4 stride 3 -> consecutive chunks share 1 token
    assert got[(1, 0)][2].split()[-1] == got[(1, 1)][2].split()[0]


def test_empty_doc_emits_nothing(spark):
    assert all(did != 3 for did, _ in _got(spark, 4, 3))


def test_bad_params_rejected(spark):
    df = None
    with pytest.raises(ValueError):
        sliding_windows(df, window=0, stride=1)
    with pytest.raises(ValueError):
        sliding_windows(df, window=4, stride=5)

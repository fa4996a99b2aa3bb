"""Bradley-Terry MM (operators/mleval.py::bradley_terry) vs an exact
pure-Python replay and the planted-ordering property."""

import math

import pytest


def _round_half_away(x: float) -> int:
    return math.floor(x + 0.5) if x >= 0 else -math.floor(-x + 0.5)


def _python_bt(outcomes, iters):
    outcomes = [(w, l) for w, l in outcomes if w != l]
    pairs, wins = {}, {}
    for w, l in outcomes:
        i, j = min(w, l), max(w, l)
        pairs[(i, j)] = pairs.get((i, j), 0) + 1
        wins[w] = wins.get(w, 0) + 1
    items = sorted({x for o in outcomes for x in o})
    n_items = len(items)
    sym = {}
    for (i, j), n in pairs.items():
        sym.setdefault(i, []).append((j, n))
        sym.setdefault(j, []).append((i, n))
    w_s = {it: wins.get(it, 0) + 1 for it in items}
    s = {it: 10**9 for it in items}
    for _ in range(iters):
        raw = {}
        for it in items:
            opps = sym.get(it, [])
            if not opps:
                raw[it] = s[it]
                continue
            denom = sum(
                _round_half_away(float(n) * 1e12 / float(s[it] + s[j])) for j, n in opps
            )
            raw[it] = max(_round_half_away(float(w_s[it]) * 1e12 / float(denom) * 1e9), 1)
        total = sum(raw.values())
        s = {
            it: max(_round_half_away(float(v) * (float(n_items) * 1e9) / float(total)), 1)
            for it, v in raw.items()
        }
    games = {it: sum(n for _, n in sym.get(it, [])) for it in items}
    return {
        it: (w_s[it] - 1, games.get(it, 0), s[it]) for it in items
    }


@pytest.fixture(scope="module")
def outcomes():
    out = []
    out += [("A", "B")] * 9 + [("B", "A")] * 1
    out += [("B", "C")] * 9 + [("C", "B")] * 1
    out += [("A", "C")] * 8 + [("C", "A")] * 2
    out += [("C", "C")] * 3  # self-games must be ignored
    return out


def test_matches_python_replay(spark, outcomes):
    from pagerank_spark.operators.mleval import bradley_terry

    df = spark.createDataFrame(outcomes, "winner string, loser string")
    got = {
        r["item"]: (r["wins"], r["games"], r["strength_nano"])
        for r in bradley_terry(df, iters=6).collect()
    }
    assert got == _python_bt(outcomes, 6)


def test_planted_ordering(spark, outcomes):
    from pagerank_spark.operators.mleval import bradley_terry

    df = spark.createDataFrame(outcomes, "winner string, loser string")
    s = {r["item"]: r["strength_nano"] for r in bradley_terry(df, iters=6).collect()}
    assert s["A"] > s["B"] > s["C"]
    # rescale keeps the nano total at ~n_items * 1e9 (rounding slack only)
    assert abs(sum(s.values()) - 3 * 10**9) <= 3


def test_self_games_ignored(spark):
    from pagerank_spark.operators.mleval import bradley_terry

    df = spark.createDataFrame(
        [("A", "A")] * 5 + [("A", "B")], "winner string, loser string"
    )
    rows = {r["item"]: r for r in bradley_terry(df, iters=3).collect()}
    assert rows["A"]["wins"] == 1 and rows["A"]["games"] == 1
    assert rows["B"]["wins"] == 0

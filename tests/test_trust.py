"""TrustRank / spam mass — NumPy two-chain replica and semantic checks."""

import numpy as np

from pagerank_spark.algos.trust import spam_mass


def _np_chains(pairs, trusted, iters, d=0.85):
    """Replica of both rank chains: uniform-teleport PR and seed-teleport TR."""
    ids = sorted({v for p in pairs for v in p})
    idx = {v: i for i, v in enumerate(ids)}
    n = len(ids)
    out = np.zeros(n)
    for s, _ in set(pairs):
        out[idx[s]] += 1
    tele_pr = np.full(n, 1.0 / n)
    seeds = [idx[v] for v in trusted if v in idx]
    tele_tr = np.zeros(n)
    tele_tr[seeds] = 1.0 / len(seeds)
    res = {}
    for name, tele in (("pr", tele_pr), ("tr", tele_tr)):
        r = tele.copy()
        for _ in range(iters):
            contrib = np.zeros(n)
            for s, t in set(pairs):
                contrib[idx[t]] += r[idx[s]] / out[idx[s]]
            m = r[out == 0].sum()
            r = (1 - d) * tele + d * contrib + d * m * tele
        res[name] = r
    return ids, res


def _run(spark, pairs, trusted, iters=3):
    edges = spark.createDataFrame([(int(s), int(t)) for s, t in pairs], "src long, dst long")
    tdf = spark.createDataFrame([(int(v),) for v in trusted], "id long")
    rows = {r["id"]: r for r in spam_mass(edges, tdf, iters=iters).collect()}
    ids, res = _np_chains(pairs, trusted, iters)
    for v in ids:
        i = ids.index(v)
        assert abs(rows[v]["pr"] - res["pr"][i]) < 1e-6
        assert abs(rows[v]["tr"] - res["tr"][i]) < 1e-6
        want_mass = (res["pr"][i] - res["tr"][i]) / res["pr"][i]
        assert abs(rows[v]["spam_mass"] - want_mass) < 1e-6
    return rows


def test_spam_farm_has_high_mass(spark):
    # trusted hub 0 -> {1, 2}; spam farm {10..14} all pointing at 20:
    # 20's rank is entirely non-trusted, so its spam mass is near 1
    pairs = [(0, 1), (0, 2), (1, 0)] + [(s, 20) for s in range(10, 15)]
    rows = _run(spark, pairs, trusted=[0])
    assert rows[20]["spam_mass"] > 0.9
    # the trusted seed itself holds concentrated trust: mass well below 0
    assert rows[0]["spam_mass"] < 0.0


def test_all_trusted_degenerates_to_zero_mass(spark):
    # every vertex trusted -> TR == PR exactly -> mass 0 everywhere
    pairs = [(1, 2), (2, 3), (3, 1), (1, 3)]
    rows = _run(spark, pairs, trusted=[1, 2, 3])
    assert all(abs(r["spam_mass"]) < 1e-9 for r in rows.values())


def test_seeds_outside_graph_ignored(spark):
    pairs = [(1, 2), (2, 1), (3, 1)]
    a = _run(spark, pairs, trusted=[1, 99])  # 99 not in graph
    b = _run(spark, pairs, trusted=[1])
    assert all(abs(a[v]["tr"] - b[v]["tr"]) < 1e-12 for v in a)

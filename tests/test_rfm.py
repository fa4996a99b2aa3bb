"""RFM segmentation: closed-form replay on a hand-built order history."""

from pagerank_spark.operators.segmentation import rfm_scores


def _rfm_py(facts, n_bins=5):
    from collections import defaultdict

    last, freq, mon = {}, defaultdict(int), defaultdict(int)
    for k, d, v in facts:
        last[k] = max(last.get(k, -1), d)
        freq[k] += 1
        mon[k] += v
    asof = max(last.values())
    prof = {k: (asof - last[k], freq[k], mon[k]) for k in last}
    n = len(prof)

    def cutpoints(vals):
        s = sorted(vals)
        return [s[(i * n + n_bins - 1) // n_bins - 1] for i in range(1, n_bins)]

    cr = cutpoints([p[0] for p in prof.values()])
    cf = cutpoints([p[1] for p in prof.values()])
    cmn = cutpoints([p[2] for p in prof.values()])
    out = {}
    for k, (r, f, m) in prof.items():
        rs = n_bins - sum(1 for c in cr if c < r)
        fs = 1 + sum(1 for c in cf if c < f)
        ms = 1 + sum(1 for c in cmn if c < m)
        out[k] = (r, f, m, rs, fs, ms, 100 * rs + 10 * fs + ms)
    return out


def test_rfm_matches_replay(spark):
    # (customer, epoch_day, cents): 10 customers with varied profiles
    facts = []
    for k in range(10):
        for j in range(k + 1):                       # frequency 1..10
            facts.append((k, 19000 + k * 3 + j, 1000 * (k + 1) + j))
    df = spark.createDataFrame(
        [(k, d * 86400, v) for k, d, v in facts], "o_custkey long, sec long, cents long"
    ).selectExpr("o_custkey", "CAST(timestamp_seconds(sec) AS TIMESTAMP) AS ts", "cents")
    got = {r.o_custkey: r for r in rfm_scores(df, "o_custkey", "ts", "cents").collect()}
    exp = _rfm_py(facts)
    for k, (r, f, m, rs, fs, ms, seg) in exp.items():
        g = got[k]
        assert (
            g.recency_days, g.frequency, g.monetary,
            g.r_score, g.f_score, g.m_score, g.segment,
        ) == (r, f, m, rs, fs, ms, seg)
    # customer 9: most recent, most frequent, biggest spender -> 555
    assert got[9].segment == 555

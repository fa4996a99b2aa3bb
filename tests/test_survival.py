"""Kaplan-Meier / Nelson-Aalen: pure-Python replay on planted subjects with
ties, censoring, and a bucketed curve."""

from pagerank_spark.operators.survival import kaplan_meier, subjects_from_events


def _km_py(subjects, bucket=1):
    # subjects: list of (duration, event)
    per_t = {}
    for dur, e in subjects:
        t = (dur // bucket) * bucket
        d, c = per_t.get(t, (0, 0))
        per_t[t] = (d + e, c + 1)
    total = len(subjects)
    out, left, s, h = [], 0, 1.0, 0.0
    for t in sorted(per_t):
        d, c = per_t[t]
        n = total - left
        s = s * (1.0 - float(d) / float(n))
        h = h + float(d) / float(n)
        left += c
        if d > 0:
            out.append((t, d, n, round(s * 1e6), round(h * 1e6)))
    return out


# ties at t=10 (2 events + 1 censored), censoring interleaved, a final
# event at the max duration (n_risk == 1 -> surv hits exactly 0)
PLANTED = [
    (5, 1), (5, 0), (10, 1), (10, 1), (10, 0),
    (20, 0), (25, 1), (30, 0), (40, 1),
]


def _run(spark, subjects, **kw):
    df = spark.createDataFrame(subjects, "duration_s long, event int")
    rows = kaplan_meier(df, **kw).orderBy("t").collect()
    return [(r.t, r.d, r.n_risk, r.surv_micro, r.hazard_micro) for r in rows]


def test_km_matches_replay(spark):
    assert _run(spark, PLANTED) == _km_py(PLANTED)


def test_km_final_event_drives_surv_to_zero(spark):
    rows = _run(spark, PLANTED)
    assert rows[-1] == (40, 1, 1, 0, _km_py(PLANTED)[-1][4])


def test_km_bucketing_merges_ties(spark):
    got = _run(spark, PLANTED, bucket_s=10)
    assert got == _km_py(PLANTED, bucket=10)
    # bucket 10 folds t=5 into t=0 and t=25 into t=20
    assert [r[0] for r in got] == [0, 10, 20, 40]


def test_km_all_censored_emits_nothing(spark):
    assert _run(spark, [(3, 0), (7, 0)]) == []
    # ...but events_only=False still reports the at-risk curve
    got = _run(spark, [(3, 0), (7, 0)], events_only=False)
    assert got == [(3, 0, 2, 1_000_000, 0), (7, 0, 1, 1_000_000, 0)]


def test_subjects_from_events_span_and_flag(spark):
    import datetime as dt

    base = dt.datetime(2026, 1, 1)
    rows = [
        (1, base, "view"),
        (1, base + dt.timedelta(seconds=90), "purchase"),
        (2, base, "click"),
        (2, base + dt.timedelta(seconds=30), "view"),
        (3, base, "purchase"),
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    got = {r.id: (r.duration_s, r.event) for r in subjects_from_events(ev).collect()}
    assert got == {1: (90, 1), 2: (30, 0), 3: (0, 1)}


def _logrank_replay(rows):
    # rows: (duration, event, group) -> (o1, e1_nano, v_nano, chi2_micro)
    times = sorted({t for t, e, g in rows if e})
    o1 = sum(e * g for _, e, g in rows)
    e1n = vn = 0
    for t in sorted({t for t, _, _ in rows}):
        n = sum(1 for d, _, _ in rows if d >= t)
        n1 = sum(1 for d, _, g in rows if d >= t and g)
        d = sum(e for dd, e, _ in rows if dd == t)
        e1n += round((d * n1) / n * 1e9)
        if n > 1:
            vn += round(((d * (n1 / n)) * ((n - n1) / n)) * ((n - d) / (n - 1)) * 1e9)
    diff = (o1 * 10**9 - e1n) / 1e9
    chi2 = round(diff * diff / (vn / 1e9) * 1e6) if vn > 0 else 0
    return o1, e1n, vn, chi2


def test_logrank_matches_python_replay(spark):
    from pagerank_spark.operators.survival import logrank

    rows = [
        # (duration, event, group): group 1 dies systematically earlier
        (2, 1, 1), (3, 1, 1), (4, 1, 1), (9, 0, 1), (5, 1, 1),
        (7, 1, 0), (8, 1, 0), (10, 0, 0), (12, 1, 0), (12, 0, 0),
    ]
    subj = spark.createDataFrame(rows, "duration_s long, event long, g long")
    got = logrank(subj).collect()[0]
    o1, e1n, vn, chi2 = _logrank_replay(rows)
    assert (got.n1, got.n2) == (5, 5)
    assert got.o1 == o1 and got.o2 == sum(e for _, e, g in rows if not g)
    assert got.e1_nano == e1n
    assert got.v_nano == vn
    assert got.chi2_micro == chi2
    # the early-death arm separates (chi2 well away from 0)
    assert got.chi2_micro > 3_000_000


def test_logrank_identical_groups_null(spark):
    from pagerank_spark.operators.survival import logrank

    # two identical copies of one arm -> O1 == E1 exactly, chi2 == 0
    arm = [(2, 1), (5, 1), (7, 0), (11, 1)]
    rows = [(d, e, g) for g in (0, 1) for d, e in arm]
    subj = spark.createDataFrame(rows, "duration_s long, event long, g long")
    got = logrank(subj).collect()[0]
    assert got.o1 * 10**9 == got.e1_nano
    assert got.chi2_micro == 0


def test_rmst_hand_curve(spark):
    from pagerank_spark.operators.survival import rmst

    # events at t=2 (4 at risk: S -> 3/4) and t=6 (3 at risk, 2 events:
    # S -> 3/4 * 1/3 = 1/4); censor at 9
    rows = [(2, 1), (6, 1), (6, 1), (9, 0)]
    subj = spark.createDataFrame(rows, "duration_s long, event long")
    # tau=8: 1*2 + 0.75*(6-2) + 0.25*(8-6) = 5.5
    got = rmst(subj, tau=8).collect()[0]
    assert (got.tau, got.n_points) == (8, 2)
    assert got.rmst_micro == round(5.5 * 1e6)
    # tau beyond the last event: last step extends to tau
    got2 = rmst(subj, tau=20).collect()[0]
    assert got2.rmst_micro == round((2 + 0.75 * 4 + 0.25 * 14) * 1e6)
    # tau before the first event: pure unit survival
    got3 = rmst(subj, tau=1).collect()[0]
    assert got3.rmst_micro == 1_000_000


def test_rmst_no_events_full_horizon(spark):
    from pagerank_spark.operators.survival import rmst

    subj = spark.createDataFrame([(5, 0), (9, 0)], "duration_s long, event long")
    got = rmst(subj, tau=100).collect()[0]
    assert got.n_points == 0
    assert got.rmst_micro == 100 * 1_000_000

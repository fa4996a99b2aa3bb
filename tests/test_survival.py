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

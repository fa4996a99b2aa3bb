"""dyad_census (graphstats) and interevent_stats (temporal) fixtures."""

from pyspark.sql import functions as F


def test_dyad_census_closed_form(spark):
    from pagerank_spark.operators.graphstats import dyad_census

    # 5 vertices: mutual 1<->2, asym 3->4; 0 isolated except via edge 0->1
    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (3, 4), (0, 1), (1, 1)], "src long, dst long"
    )
    row = dyad_census(edges).collect()[0]
    assert row["n_vertices"] == 5
    assert row["mutual"] == 1
    assert row["asym"] == 2  # 3->4 and 0->1
    assert row["null_dyads"] == 10 - 1 - 2


def test_dyad_census_duplicate_edges_collapse(spark):
    from pagerank_spark.operators.graphstats import dyad_census

    edges = spark.createDataFrame([(1, 2)] * 4 + [(2, 1)], "src long, dst long")
    row = dyad_census(edges).collect()[0]
    assert (row["mutual"], row["asym"], row["null_dyads"]) == (1, 0, 0)


def test_interevent_closed_form(spark):
    from pagerank_spark.operators.temporal import interevent_stats

    rows = [
        (1, 10, "2026-01-01 00:00:00"),
        (1, 11, "2026-01-01 00:00:05"),
        (1, 12, "2026-01-01 00:01:05"),
        (2, 20, "2026-01-01 09:00:00"),  # single event: no gaps, dropped
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, event_id long, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))
    got = {r["user_id"]: r for r in interevent_stats(ev).collect()}
    assert set(got) == {1}
    r = got[1]
    assert (r["n_gaps"], r["sum_gap_s"], r["sum_gap_sq"]) == (2, 65, 25 + 3600)
    assert (r["min_gap_s"], r["max_gap_s"]) == (5, 60)


def test_interevent_equal_ts_tiebreak_deterministic(spark):
    from pagerank_spark.operators.temporal import interevent_stats

    rows = [(1, i, "2026-01-01 00:00:00") for i in range(4)]
    ev = spark.createDataFrame(
        rows, "user_id long, event_id long, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))
    a = interevent_stats(ev).collect()[0]
    b = interevent_stats(ev.repartition(5)).collect()[0]
    assert tuple(a) == tuple(b)
    assert a["n_gaps"] == 3 and a["sum_gap_s"] == 0


def test_self_excitation_bursty_vs_spread(spark):
    import math
    from datetime import datetime, timedelta

    from pagerank_spark.operators.temporal import self_excitation

    base = datetime(2024, 1, 1)
    rows = []
    # user 1: burst — 5 events 10s apart; user 2: spread — 5 events 1h apart
    for i in range(5):
        rows.append((i, base + timedelta(seconds=10 * i), 1, "view", 0.0, ""))
        rows.append((100 + i, base + timedelta(hours=i), 2, "view", 0.0, ""))
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    got = {r.user_id: r for r in self_excitation(ev, tau_s=600).collect()}
    want1 = 4 * round(math.exp(-10 / 600) * 1e9)
    want2 = 4 * round(math.exp(-3600 / 600) * 1e9)
    assert got[1].n_gaps == 4 and got[1].excite_nano == want1
    assert got[2].excite_nano == want2
    assert got[1].excite_nano > 100 * got[2].excite_nano
    assert got[1].mean_excite_nano == want1 // 4

"""Stream-stream interval join (streaming/joins.py): streamed union of
micro-batch outputs == batch interval join on the same rows, including
matches that straddle a checkpoint restart (state persistence)."""

import datetime as dt

from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from pagerank_spark.streaming.joins import interval_join, run_interval_join_stream

SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
    ]
)

BASE = dt.datetime(2026, 1, 5, 12, 0, 0)


def _rows(ids, etype):
    # deterministic: user i%5, timestamps 7 minutes apart
    return [
        Row(
            event_id=int(i),
            ts=BASE + dt.timedelta(minutes=7 * int(i)),
            user_id=int(i) % 5,
            event_type=etype,
        )
        for i in ids
    ]


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _key(r):
    return (r["user_id"], r["l_event_id"], r["r_event_id"])


def _batch_want(spark, left_rows, right_rows):
    out = interval_join(
        _df(spark, left_rows), _df(spark, right_rows), lookback="1 hour", watermark="4 hours"
    )
    return {_key(r) for r in out.collect()}


def test_batch_interval_join_semantics(spark):
    # user 0: click at +70m, views at +0m/+35m -> only the +35m view is
    # inside [click-1h, click]
    left = _rows([10], "click")  # user 0, ts +70m
    right = [
        Row(event_id=1, ts=BASE, user_id=0, event_type="view"),
        Row(event_id=2, ts=BASE + dt.timedelta(minutes=35), user_id=0, event_type="view"),
        Row(event_id=3, ts=BASE + dt.timedelta(minutes=35), user_id=1, event_type="view"),
        Row(event_id=4, ts=BASE + dt.timedelta(minutes=80), user_id=0, event_type="view"),
    ]
    got = _batch_want(spark, left, right)
    assert got == {(0, 10, 2)}  # not the stale view, wrong user, or future view


def test_streamed_matches_batch_single_drain(spark, tmp_path):
    lp, rp, op, ck = (str(tmp_path / d) for d in ("l", "r", "o", "ck"))
    left, right = _rows(range(0, 20), "click"), _rows(range(3, 23), "view")
    _df(spark, left).write.parquet(lp)
    _df(spark, right).write.parquet(rp)
    run_interval_join_stream(
        spark, lp, rp, op, ck, SCHEMA, lookback="1 hour", watermark="4 hours"
    )
    got = {_key(r) for r in spark.read.parquet(op).collect()}
    want = _batch_want(spark, left, right)
    assert got == want and len(want) > 0


def test_streamed_matches_batch_across_restart(spark, tmp_path):
    # left arrives in drain 1, the matching right side only in drain 2:
    # the match must still be emitted (buffered left state survives the
    # checkpoint restart), and nothing is emitted twice.
    lp, rp, op, ck = (str(tmp_path / d) for d in ("l2", "r2", "o2", "ck2"))
    left1, right2 = _rows(range(0, 12), "click"), _rows(range(0, 12), "view")
    _df(spark, left1).write.mode("append").parquet(lp)
    _df(spark, right2).limit(0).write.mode("append").parquet(rp)  # right dir exists, empty
    run_interval_join_stream(
        spark, lp, rp, op, ck, SCHEMA, lookback="1 hour", watermark="4 hours"
    )
    assert spark.read.parquet(op).count() == 0  # no right rows yet

    _df(spark, right2).write.mode("append").parquet(rp)
    run_interval_join_stream(
        spark, lp, rp, op, ck, SCHEMA, lookback="1 hour", watermark="4 hours"
    )
    got = sorted(_key(r) for r in spark.read.parquet(op).collect())
    want = sorted(_batch_want(spark, left1, right2))
    assert got == want and len(want) > 0  # exactly-once, batch-equal


def test_self_interval_join_events_shape(spark):
    # the gate shape: purchases joined to the preceding hour's views
    ev = _df(spark, _rows(range(0, 30), "view") + _rows(range(2, 30, 3), "purchase"))
    out = interval_join(
        ev.filter(F.col("event_type") == "purchase"),
        ev.filter(F.col("event_type") == "view"),
        lookback="1 hour",
    )
    rows = out.collect()
    assert all(
        r["l_ts"] - dt.timedelta(hours=1) <= r["r_ts"] <= r["l_ts"] for r in rows
    )
    assert len(rows) > 0

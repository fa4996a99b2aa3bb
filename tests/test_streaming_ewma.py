"""Streaming EWMA == batch EWMA when micro-batches arrive in event-time
order (state carried across batches)."""

import os
import time
from datetime import datetime

from pyspark.sql import functions as F

from pagerank_spark.operators.smoothing import ewma
from pagerank_spark.streaming.metrics import streaming_ewma

SCHEMA = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"


def _rows():
    rows = []
    eid = 0
    for minute in range(8):
        for u in (1, 2, 3):
            rows.append(
                (eid, datetime(2024, 1, 1, 0, minute), u, "m", float((eid * 7) % 50) / 2, "")
            )
            eid += 1
    return rows


def test_streaming_ewma_matches_batch_fold(spark, tmp_path):
    rows = _rows()
    df = spark.createDataFrame(rows, SCHEMA)
    batch = {r.user_id: (r.n_events, r.ewma_micro) for r in ewma(df).collect()}

    # two event-time-ordered chunks as separate files -> two micro-batches
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    early = df.filter("minute(ts) < 4")
    late = df.filter("minute(ts) >= 4")
    early.coalesce(1).write.mode("append").parquet(in_dir)
    time.sleep(1.1)  # distinct file mtimes -> deterministic batch order
    late.coalesce(1).write.mode("append").parquet(in_dir)

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    out = streaming_ewma(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("ewma_updates")
        .outputMode("update")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    q.awaitTermination(120)
    upd = spark.sql("SELECT * FROM ewma_updates").collect()
    # one update row per key per micro-batch that touched it
    assert len(upd) >= 3
    final = {}
    for r in upd:
        if r.user_id not in final or r.n_events > final[r.user_id][0]:
            final[r.user_id] = (r.n_events, r.ewma_micro)
    assert final == batch

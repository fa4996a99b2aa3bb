"""Streaming CMS maintenance (streaming/sketch.py): summed micro-batch
partials == one-shot batch sketch over the same rows, across incremental
drains and restarts."""

from pyspark.sql.types import LongType, StringType, StructField, StructType

from pagerank_spark.operators.sketches import cms_build, cms_estimate
from pagerank_spark.streaming.sketch import read_cms, run_cms_stream

SCHEMA = StructType([StructField("k", LongType()), StructField("tok", StringType())])


def _rows(spark, lo, hi):
    return spark.createDataFrame(
        [(i, f"tok{i % 17}") for i in range(lo, hi)], SCHEMA
    )


def test_streamed_cells_equal_batch(spark, tmp_path):
    ip, op, ck = (str(tmp_path / d) for d in ("in", "out", "ck"))
    _rows(spark, 0, 400).write.mode("append").parquet(ip)
    run_cms_stream(spark, ip, op, ck, SCHEMA, "tok", depth=3, width=8)
    _rows(spark, 400, 1000).write.mode("append").parquet(ip)
    run_cms_stream(spark, ip, op, ck, SCHEMA, "tok", depth=3, width=8)

    got = {(r["row"], r["col"]): r["cnt"] for r in read_cms(spark, op).collect()}
    want = {
        (r["row"], r["col"]): r["cnt"]
        for r in cms_build(_rows(spark, 0, 1000), "tok", depth=3, width=8).collect()
    }
    assert got == want

    # estimates off the streamed sketch behave like the batch sketch
    keys = spark.createDataFrame([(f"tok{i}",) for i in range(17)], ["tok"])
    est = {
        r["tok"]: r["est"]
        for r in cms_estimate(read_cms(spark, op), keys, "tok", 3, 8).collect()
    }
    exact = {f"tok{i}": sum(1 for j in range(1000) if j % 17 == i) for i in range(17)}
    assert all(est[t] >= c for t, c in exact.items())

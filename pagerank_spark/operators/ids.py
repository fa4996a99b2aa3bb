"""Stable dense vertex-id assignment — the engine's u64-vertex-ID analogue.

The reference addresses vertices by position in a flat array (README:1-10);
we need the same property — dense 0-based longs, deterministic under any
cluster size — for ``(conv_id, turn_idx)`` keys.

A global ``row_number()`` window would collapse to one partition, so ids are
assigned with the scalable two-pass pattern:

  1. range-repartition + sort by key (Spark's range partitioner keeps global
     order across partitions),
  2. count rows per partition, prefix-sum the counts on the driver (one tiny
     collect of <= #partitions rows),
  3. per-partition offset + local 0..n-1 via ``mapInPandas`` (vectorized,
     no per-row Python).

Deterministic because range partition boundaries only affect *which*
partition a key lands in, never the global sort position that defines its id.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def assign_dense_ids(df: DataFrame, key_cols: list[str], id_col: str = "vid", num_partitions: int | None = None) -> DataFrame:
    """Assign dense 0-based longs ordered lexicographically by ``key_cols``.

    Input must be distinct on ``key_cols``. Output: input columns + ``id_col``.
    """
    n = num_partitions or df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    n = int(n)
    keyed = df.repartitionByRange(n, *[F.col(c) for c in key_cols]).sortWithinPartitions(*key_cols)
    keyed = keyed.withColumn("__pid", F.spark_partition_id())
    # persist + materialize BEFORE the two passes: RangePartitioner samples
    # with a per-execution seed, so without pinning the partitioning here the
    # count job and the numbering job could see different boundaries (and the
    # driver-computed offsets would mismatch actual partitions)
    keyed = keyed.persist()
    keyed.count()

    # Pass 1: per-partition counts -> driver prefix sum (tiny: one row/partition)
    counts = {
        r["__pid"]: r["cnt"]
        for r in keyed.groupBy("__pid").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    offsets = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]

    out_schema = keyed.drop("__pid").schema.add(id_col, "long", False)
    boff = df.sparkSession.sparkContext.broadcast(offsets)

    def number(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pos = 0
        for pdf in batches:
            if len(pdf) == 0:
                continue
            pid = int(pdf["__pid"].iloc[0])
            base = boff.value[pid] + pos
            pdf = pdf.drop(columns=["__pid"])
            pdf[id_col] = range(base, base + len(pdf))
            pos += len(pdf)
            yield pdf

    out = keyed.mapInPandas(number, schema=out_schema).localCheckpoint()
    keyed.unpersist()
    return out


def vertex_ids(transcripts: DataFrame, id_col: str = "vid") -> DataFrame:
    """Vertex-id table for a transcripts DataFrame.

    Returns ``(conv_id, turn_idx, vid)`` with ids dense, 0-based, ordered by
    (conv_id asc, turn_idx asc) — FIXTURES.md §2 semantics.
    """
    keys = transcripts.select("conv_id", "turn_idx").dropDuplicates()
    return assign_dense_ids(keys, ["conv_id", "turn_idx"], id_col=id_col)

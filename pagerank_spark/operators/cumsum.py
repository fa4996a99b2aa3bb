"""Exact distributed cumulative sum over a global ordering.

``SUM(x) OVER (ORDER BY k)`` in Spark plans as a SINGLE-partition window —
the whole table through one task, the classic scale cliff. This operator
computes the identical result with the textbook two-phase prefix-sum:

1. ``repartitionByRange`` on the ordering key — partitions are ordered
   ranges of the key (one shuffle, the same one a global sort needs);
2. per-partition running sums via ``mapInPandas`` that carries the running
   total ACROSS Arrow batches inside each partition (a genuinely imperative
   per-partition loop — the documented mapInPandas tier of the engine's
   custom-operator ladder);
3. per-partition totals (p rows) to the driver, exclusive prefix offsets
   broadcast back, one more ``mapInPandas`` pass adding ``offset[pid]``.

Every row is touched exactly twice and the only full shuffle is the range
partitioning; driver traffic is p rows. Output values are a function of the
global order alone, so they are deterministic even though range-boundary
sampling is not (callers must make the ordering total — pass tiebreak
columns in ``order_cols``).

Determinism caveat inherited from floating-point addition: for double
values the within-order summation sequence is fixed (left-to-right in key
order), so results are bit-stable run-to-run; they can differ from a
different-order reference by float associativity — use integers (or
decimals) where exactness across engines matters, as the oracle gate does.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def distributed_cumsum(
    df: DataFrame,
    order_cols: list[str],
    value_col: str,
    out_col: str = "cumsum",
    num_partitions: int | None = None,
) -> DataFrame:
    """Append ``out_col`` = inclusive cumulative sum of ``value_col`` in the
    total order given by ``order_cols`` (must be a total order — add a
    tiebreak column if the leading keys can repeat). ``value_col`` must be
    non-null (a null would poison every later running sum, exactly like the
    window form)."""
    p = num_partitions or max(df.sparkSession.sparkContext.defaultParallelism, 2)
    ranged = df.repartitionByRange(p, *[F.col(c) for c in order_cols]).sortWithinPartitions(
        *[F.col(c) for c in order_cols]
    )
    ranged = ranged.withColumn("__pid", F.spark_partition_id())

    is_double = dict(df.dtypes)[value_col] == "double"
    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    # NB StructType.add MUTATES the receiver — never call it on a live
    # DataFrame's .schema (it corrupts the DataFrame's cached column list)
    schema_local = StructType(
        list(ranged.schema.fields)
        + [StructField("__local", DoubleType() if is_double else LongType())]
    )

    def _local(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        run = 0
        for b in batches:
            if len(b):
                c = b[value_col].cumsum() + run
                run = int(c.iloc[-1]) if c.dtype.kind in "iu" else float(c.iloc[-1])
                b = b.assign(__local=c)
            else:
                b = b.assign(__local=b[value_col])
            yield b

    local = ranged.mapInPandas(_local, schema=schema_local).localCheckpoint(eager=False)

    # partition total = sum of the values (NOT max of the running sum —
    # negative values make the running max diverge from the total)
    totals = (
        local.groupBy("__pid").agg(F.sum(value_col).alias("__tot")).orderBy("__pid").collect()
    )
    offs = {}
    acc = 0.0 if is_double else 0
    for r in totals:
        offs[r["__pid"]] = acc
        acc += r["__tot"]
    # offsets joined via a broadcast p-row relation (pure DataFrame; no UDF)
    off_df = df.sparkSession.createDataFrame(
        [(int(k), v) for k, v in offs.items()],
        f"__pid int, __off {'double' if is_double else 'long'}",
    )
    out = (
        local.join(F.broadcast(off_df), "__pid")
        .withColumn(out_col, F.col("__local") + F.col("__off"))
        .drop("__pid", "__local", "__off")
    )
    return out


def distributed_lead(
    df: DataFrame,
    order_cols: list[str],
    value_col: str,
    out_col: str = "lead",
    num_partitions: int | None = None,
) -> DataFrame:
    """Append ``out_col`` = the NEXT row's ``value_col`` in the total order
    given by ``order_cols`` (NULL on the last row) — ``LEAD(x) OVER (ORDER
    BY k)`` without the single-partition window.

    Same two-phase shape as :func:`distributed_cumsum`: range partition on
    the ordering key, per-partition pandas ``shift(-1)``, then the ONLY
    cross-partition dependency — each partition's last row needs the FIRST
    value of the next non-empty partition — is served by collecting one
    (pid, first_value) row per partition (p rows of driver traffic) and
    broadcasting the successor map back. ``order_cols`` must be a total
    order (add a tiebreak column otherwise).
    """
    p = num_partitions or max(df.sparkSession.sparkContext.defaultParallelism, 2)
    ranged = df.repartitionByRange(p, *[F.col(c) for c in order_cols]).sortWithinPartitions(
        *[F.col(c) for c in order_cols]
    )
    ranged = ranged.withColumn("__pid", F.spark_partition_id())

    from pyspark.sql.types import StructField, StructType

    vfield = next(f for f in df.schema.fields if f.name == value_col)
    schema_local = StructType(
        list(ranged.schema.fields) + [StructField("__shift", vfield.dataType)]
    )

    def _local(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # carry across Arrow batches: a batch's last row leads into the
        # next batch's first row, so buffer one batch at a time
        prev = None
        for b in batches:
            if len(b) == 0:
                continue
            b = b.assign(__shift=b[value_col].shift(-1))
            if prev is not None:
                prev.iloc[-1, prev.columns.get_loc("__shift")] = b[value_col].iloc[0]
                yield prev
            prev = b
        if prev is not None:
            yield prev

    local = ranged.mapInPandas(_local, schema=schema_local).localCheckpoint(eager=False)

    firsts = (
        local.groupBy("__pid")
        .agg(
            F.min(
                F.struct(
                    *[F.col(c) for c in order_cols], F.col(value_col).alias("__val")
                )
            ).alias("__f")
        )
        .select("__pid", F.col("__f.__val").alias("__first"))
        .orderBy("__pid")
        .collect()
    )
    # successor map: partition pid's boundary row takes the first value of
    # the next NON-EMPTY partition (empty ranges simply don't appear)
    succ = []
    for i, r in enumerate(firsts):
        nxt = firsts[i + 1]["__first"] if i + 1 < len(firsts) else None
        succ.append((int(r["__pid"]), nxt))
    typ = vfield.dataType.simpleString()
    succ_df = df.sparkSession.createDataFrame(succ, f"__pid int, __succ {typ}")

    # the boundary row of each partition is the one whose __shift is null;
    # a genuine global-last row gets the final NULL successor
    out = (
        local.join(F.broadcast(succ_df), "__pid", "left")
        .withColumn(out_col, F.coalesce(F.col("__shift"), F.col("__succ")))
        .drop("__pid", "__shift", "__succ")
    )
    return out

"""Data-layout functions: Z-order (Morton) interleaving for
multi-dimensional clustering.

Writing 100-TB tables sorted by a single column gives min/max file skipping
on that column only; interleaving the bits of several columns into one
Z-value and sorting by IT clusters the layout so range predicates on ANY
of the interleaved dimensions prune files (the technique behind
Delta/Iceberg OPTIMIZE ZORDER). The engine exposes the key as a pure
column expression — `df.repartitionByRange(F.col("z")).sortWithinPartitions
("z").write...` is then the whole layout job, and the key arithmetic is
plain BIGINT ops, SQL-replayable for the oracle gate.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _spread2(col: Column, bits: int) -> Column:
    """Insert a zero bit after each of the low ``bits`` bits of ``col``
    (the classic Morton spread), as a fold over plain shifts/masks."""
    out = F.lit(0).cast("long")
    for i in range(bits):
        out = out.bitwiseOR(
            F.shiftleft(col.bitwiseAND(F.lit(1 << i)).cast("long"), i)
        )
    return out


def zorder_key(a: Column, b: Column, bits: int = 21) -> Column:
    """64-bit Morton key interleaving the low ``bits`` bits of two
    non-negative integer columns (a in the even positions). Values must
    already be rank/bucket-encoded into [0, 2^bits); interleave the BUCKET
    of a skewed column (e.g. ntile output), not raw values, or the curve
    degenerates to a single dimension."""
    if not 1 <= bits <= 31:
        raise ValueError("bits must be in [1, 31]")
    return _spread2(a.cast("long"), bits).bitwiseOR(
        F.shiftleft(_spread2(b.cast("long"), bits), 1)
    )

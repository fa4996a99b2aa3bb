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


def hilbert_key(x: Column, y: Column, order: int = 8) -> Column:
    """Hilbert-curve index of ``(x, y)`` on the 2^order x 2^order grid.

    The Hilbert curve preserves locality strictly better than Z-order (no
    long diagonal jumps between quadrant boundaries), so range predicates
    on either dimension touch fewer distinct key ranges — the better
    clustering key when the extra arithmetic is affordable. Computed as
    the classic per-bit rotate-and-reflect walk (Wikipedia ``xy2d``),
    expressed as one ``F.aggregate`` fold over the bit levels with the
    (x, y, d) state packed into a single BIGINT — pure JVM integer ops,
    whole-stage-codegen friendly, and bit-replayable in SQL.

    Inputs must already be bucket-encoded into [0, 2^order); fields are
    masked to ``order`` bits each step, so reflect-step negatives (benign
    two's-complement artifacts of the textbook algorithm) never leak
    across the packed-field boundaries.
    """
    if not 1 <= order <= 15:
        raise ValueError("order must be in [1, 15] (d needs 2*order bits)")
    mask = (1 << order) - 1
    yshift, dshift = order, 2 * order

    def step(acc: Column, s: Column) -> Column:
        cx = acc.bitwiseAND(F.lit(mask))
        cy = F.shiftright(acc, yshift).bitwiseAND(F.lit(mask))
        d = F.shiftright(acc, dshift)
        rx = F.when(cx.bitwiseAND(s) > 0, F.lit(1)).otherwise(F.lit(0))
        ry = F.when(cy.bitwiseAND(s) > 0, F.lit(1)).otherwise(F.lit(0))
        d2 = d + s * s * (rx * 3).bitwiseXOR(ry)
        nx = F.when(ry == 0, F.when(rx == 1, s - 1 - cy).otherwise(cy)).otherwise(cx)
        ny = F.when(ry == 0, F.when(rx == 1, s - 1 - cx).otherwise(cx)).otherwise(cy)
        return (
            nx.bitwiseAND(F.lit(mask))
            + (ny.bitwiseAND(F.lit(mask))) * F.lit(1 << yshift)
            + d2 * F.lit(1 << dshift)
        )

    levels = F.array([F.lit(1 << i) for i in range(order - 1, -1, -1)])
    init = (x.cast("long") + y.cast("long") * F.lit(1 << yshift)).cast("long")
    return F.shiftright(F.aggregate(levels, init, step), dshift)

"""Signed random projection (Johnson-Lindenstrauss / SRP-LSH family) for
embedding columns.

Dimensionality reduction as a ZERO-SHUFFLE projection: each output dimension
is ``proj[j] = sum_i sign(i, j) * q_i`` where ``q_i`` is the embedding
component snapped to the integer grid (``clustering.quantize_vectors``) and
``sign(i, j) in {+1, -1}`` comes from the repo's engine-neutral 31-bit hash
(same two-round multiplicative + xor-shift mixer as
``algos/neighborhood._h31``) on the flattened index ``i * k + j``. Everything
is exact BIGINT arithmetic — reduction-order independent, bit-reproducible
across engines and repartitionings, SQL-replayable (the DuckDB oracle gate
replays the hash and the sums verbatim).

Why signs instead of Gaussians: Achlioptas (JDSS'03) showed +-1 entries give
the same JL distance-preservation guarantees as Gaussian matrices; signs keep
the arithmetic integer-exact and the "matrix" never materializes — it is a
hash function, so the operator is a pure per-row projection at any corpus
size (the 100-TB shape: no broadcast, no shuffle, no Python).

``srp_code`` packs the projection's sign bits into one BIGINT — the classic
SRP-LSH bucket key (cos-similar vectors collide with probability
``1 - theta/pi`` per bit), usable directly as a bucketing front end for the
ANN operators in operators/similarity.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .clustering import quantize_vectors

KNUTH = 2654435761  # 2^32 / phi, the repo-wide multiplicative-hash constant
MIX = 2246822519  # xxhash PRIME32_2, independent odd multiplier
M31 = 1 << 31

__all__ = ["signed_random_projection", "srp_code"]


def _sign31(idx_col, salt: int):
    """+1/-1 from the parity of the engine-neutral 31-bit hash of ``idx``."""
    h1 = F.pmod(idx_col * F.lit(KNUTH) + F.lit(salt), F.lit(M31))
    h1 = h1.bitwiseXOR(F.shiftright(h1, 15))
    h2 = F.pmod(h1 * F.lit(MIX) + F.lit(1), F.lit(M31))
    h2 = h2.bitwiseXOR(F.shiftright(h2, 13))
    return F.when(F.pmod(h2, F.lit(2)) == 1, F.lit(1)).otherwise(F.lit(-1)).cast("long")


def _proj_expr(j: int, k: int, salt: int):
    """Exact integer projection onto hashed sign row ``j`` of the implicit
    +-1 matrix: left-fold sum of ``sign(i*k + j) * qvec[i]``."""
    signed = F.transform(
        F.col("qvec"),
        lambda x, i: _sign31(i.cast("long") * k + j, salt) * x,
    )
    return F.aggregate(signed, F.lit(0).cast("long"), lambda acc, x: acc + x)


def signed_random_projection(
    emb: DataFrame,
    k: int = 16,
    scale: int = 1024,
    salt: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """``(vec_id, dim, proj)`` — the input embedding reduced to ``k`` exact
    integer dimensions, one output row per (vector, dim).

    Long format keeps every value a scalar BIGINT (hash-stable in the oracle
    gate); ``groupBy(id).pivot`` or ``collect_list`` reassembles arrays when
    a caller wants them. The whole operator is one codegen'd projection +
    posexplode: zero shuffles, zero Python (plan-asserted in tests).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    q = quantize_vectors(emb, scale, vec_col, "qvec")
    projs = F.array(*[_proj_expr(j, k, salt) for j in range(k)])
    return q.select(
        F.col(id_col).alias("vec_id"), F.posexplode(projs).alias("dim", "proj")
    )


def srp_code(
    emb: DataFrame,
    k: int = 16,
    scale: int = 1024,
    salt: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """``(vec_id, code)`` — the ``k`` projection sign bits packed into one
    BIGINT (bit ``j`` = 1 iff ``proj[j] > 0``): the SRP-LSH bucket key.

    Same hash family and quantization as :func:`signed_random_projection`,
    so codes and projections are mutually consistent; requires ``k <= 62``
    to keep the packed code positive in an int64.
    """
    if not 1 <= k <= 62:
        raise ValueError(f"k must be in [1, 62] for a packed BIGINT code, got {k}")
    q = quantize_vectors(emb, scale, vec_col, "qvec")
    code = None
    for j in range(k):
        bit = F.when(_proj_expr(j, k, salt) > 0, F.lit(1 << j).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        code = bit if code is None else code + bit
    return q.select(F.col(id_col).alias("vec_id"), code.alias("code"))

"""Deduplication operators for training-data pipelines.

Five tiers, cheapest first — each returns assignments a caller can use to
keep one canonical doc per group:

- :func:`exact_dedup` — hash-groupBy on normalized text. One shuffle.
- :func:`minhash_lsh_candidates` / :func:`minhash_dedup` — shingle ->
  minhash signature -> banded LSH -> bucket self-join -> verified Jaccard.
  The scale path: candidate generation never compares all pairs; the
  band-bucket join only pairs docs sharing a band signature.
- :func:`simhash` — 64-bit simhash from token hashes (Hamming-ball near-dup).
- :func:`ngram_jaccard` — exact n-gram Jaccard for a candidate pair set
  (verification kernel; also usable standalone on small inputs).
- embedding-cosine near-dup: see operators/similarity.py
  (:func:`~pagerank_spark.operators.similarity.cosine_near_dup_pairs`).

Hot-path discipline: shingling/minhashing runs as Arrow-batched pandas UDFs
(NumPy matrix ops per batch, no per-row Python); banding/bucketing is pure
DataFrame (posexplode + groupBy); verification joins only candidate pairs.
"""

from __future__ import annotations

from hashlib import blake2b

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.pandas.functions import pandas_udf

from ..functions.text import normalize_text

# -- exact ----------------------------------------------------------------


def exact_dedup(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """``(doc_id, canonical_id)``: canonical = min doc_id among docs with
    identical normalized text. Single hash shuffle on the text key."""
    w = Window.partitionBy(normalize_text(text_col))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.min(id_col).over(w).alias("canonical_id"),
    )


# -- minhash + LSH --------------------------------------------------------

_MERSENNE = (1 << 61) - 1


def _minhash_batch(texts: pd.Series, n_hashes: int, shingle_k: int, seed: int) -> np.ndarray:
    """(len(texts), n_hashes) int64 minhash signatures; vectorized per batch."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=n_hashes, dtype=np.int64)
    b = rng.integers(0, _MERSENNE, size=n_hashes, dtype=np.int64)
    out = np.empty((len(texts), n_hashes), dtype=np.int64)
    for i, t in enumerate(texts):
        toks = (t or "").lower().split()
        if len(toks) < shingle_k:
            shingles = {" ".join(toks)} if toks else {""}
        else:
            shingles = {" ".join(toks[j : j + shingle_k]) for j in range(len(toks) - shingle_k + 1)}
        hv = np.fromiter(
            (int.from_bytes(blake2b(s.encode(), digest_size=8).digest(), "little") & 0x7FFFFFFFFFFFFFFF for s in shingles),
            dtype=np.int64,
            count=len(shingles),
        )
        # affine family over a Mersenne prime; min over shingles per hash fn
        m = ((hv[:, None] % _MERSENNE) * (a[None, :] % _MERSENNE) + b[None, :]) % _MERSENNE
        out[i] = m.min(axis=0)
    return out


def minhash_signatures(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    n_hashes: int = 64, shingle_k: int = 3, seed: int = 11,
) -> DataFrame:
    """``(doc_id, sig array<long>)`` minhash signatures (Arrow-batched).

    Shingle hashing uses blake2b-64 — deterministic across processes,
    executors, and Python versions (no PYTHONHASHSEED dependence).
    """

    @pandas_udf("array<long>")
    def sig_udf(texts: pd.Series) -> pd.Series:
        mat = _minhash_batch(texts, n_hashes, shingle_k, seed)
        return pd.Series(list(mat))

    return docs.select(F.col(id_col).alias("doc_id"), sig_udf(F.col(text_col)).alias("sig"))


def minhash_lsh_candidates(sigs: DataFrame, n_bands: int = 16) -> DataFrame:
    """Candidate near-dup pairs ``(a, b)`` (a < b) sharing >= 1 LSH band.

    Banding is pure DataFrame: slice the signature into ``n_bands`` chunks,
    hash each chunk, groupBy (band, bucket) and self-join within buckets.
    """
    n_hashes = len(sigs.select("sig").first()["sig"])
    rows_per_band = max(1, n_hashes // n_bands)
    banded = sigs.select(
        "doc_id",
        F.posexplode(
            F.array(*[
                F.xxhash64(F.slice("sig", i * rows_per_band + 1, rows_per_band))
                for i in range(n_bands)
            ])
        ).alias("band", "bucket"),
    )
    l = banded.alias("l")
    r = banded.alias("r")
    return (
        l.join(r, (F.col("l.band") == F.col("r.band")) & (F.col("l.bucket") == F.col("r.bucket")))
        .filter(F.col("l.doc_id") < F.col("r.doc_id"))
        .select(F.col("l.doc_id").alias("a"), F.col("r.doc_id").alias("b"))
        .dropDuplicates(["a", "b"])
    )


def estimated_jaccard(sigs: DataFrame, pairs: DataFrame) -> DataFrame:
    """``(a, b, est_jaccard)`` — fraction of agreeing minhash positions."""
    sa = sigs.select(F.col("doc_id").alias("a"), F.col("sig").alias("sig_a"))
    sb = sigs.select(F.col("doc_id").alias("b"), F.col("sig").alias("sig_b"))
    j = pairs.join(sa, "a").join(sb, "b")
    agree = F.size(F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda v: v))
    return j.select("a", "b", (agree / F.size("sig_a")).alias("est_jaccard"))


def minhash_dedup(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    threshold: float = 0.8, n_hashes: int = 64, n_bands: int = 16,
    shingle_k: int = 3, seed: int = 11,
) -> DataFrame:
    """``(doc_id, canonical_id)`` near-dup groups at estimated Jaccard >=
    threshold. Groups are formed by treating passing pairs as edges and
    taking min-id connected components (reusing the graph engine!)."""
    from ..algos.components import connected_components

    sigs = minhash_signatures(docs, id_col, text_col, n_hashes, shingle_k, seed).persist()
    pairs = minhash_lsh_candidates(sigs, n_bands)
    passing = estimated_jaccard(sigs, pairs).filter(F.col("est_jaccard") >= threshold)
    edges = passing.select(F.col("a").alias("src"), F.col("b").alias("dst"))
    verts = docs.select(F.col(id_col).alias("id"))
    comp = connected_components(edges, vertices=verts)
    sigs.unpersist()
    return comp.select(F.col("id").alias("doc_id"), F.col("component").alias("canonical_id"))


# -- simhash --------------------------------------------------------------


def simhash(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """``(doc_id, simhash long)`` — 64-bit simhash over token xxhash64s.

    Pure DataFrame implementation: explode tokens, xxhash64 each, unpack the
    64 bits with shift/and, sum signed bits per doc, repack via bit ops —
    no Python at all (the whole thing is codegen'd).
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.trim(F.lower(F.col(text_col))), r"\s+")).alias("tok"),
    ).withColumn("h", F.xxhash64("tok"))
    bits = toks.select(
        "doc_id",
        *[
            (F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)).alias(f"b{i}")
            for i in range(64)
        ],
    )
    summed = bits.groupBy("doc_id").agg(*[F.sum(f"b{i}").alias(f"b{i}") for i in range(64)])
    packed = summed.select(
        "doc_id",
        sum(
            [F.when(F.col(f"b{i}") > 0, F.lit(1).cast("long") * (2**i if i < 63 else -(2**63))).otherwise(F.lit(0).cast("long"))
             for i in range(64)],
            F.lit(0).cast("long"),
        ).alias("simhash"),
    )
    return packed


def hamming64(a, b):
    return F.bit_count(a.bitwiseXOR(b))


# -- exact n-gram jaccard -------------------------------------------------


def ngram_jaccard(docs: DataFrame, pairs: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3) -> DataFrame:
    """Exact token-n-gram Jaccard ``(a, b, jaccard)`` for given pairs.

    Shingle sets are built once per doc as array columns (JVM-side), then
    intersected with ``array_intersect``/``array_union`` after the pair
    join — verification only touches candidate pairs.
    """
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    shingles = F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)))
    )
    sh = docs.select(F.col(id_col).alias("doc_id"), shingles.alias("sh"))
    a = sh.select(F.col("doc_id").alias("a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col("doc_id").alias("b"), F.col("sh").alias("sh_b"))
    j = pairs.join(a, "a").join(b, "b")
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return j.select("a", "b", F.when(union == 0, F.lit(0.0)).otherwise(inter / union).alias("jaccard"))

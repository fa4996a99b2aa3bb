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

Hot-path discipline: shingling/minhashing is pure JVM column expressions
(split/transform/xxhash64 — zero Python, zero shuffle); banding/bucketing is
pure DataFrame (posexplode + groupBy); verification joins only candidate
pairs; grouping iterates only over docs that appear in a passing pair.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import normalize_text

log = logging.getLogger(__name__)


def _capped_bucket_pairs(
    banded: DataFrame,
    key_cols: list[str],
    max_bucket_size: int | None,
    hot_bucket_mode: str,
    extra_cols: list[str] | None = None,
) -> DataFrame:
    """Bucket self-join with a hot-bucket bound — the shared candidate
    kernel of :func:`minhash_lsh_candidates` and :func:`simhash_near_dups`.

    ``banded`` holds one row per (doc, bucket) with bucket key ``key_cols``
    and a ``doc_id`` column (plus ``extra_cols`` carried through, e.g. the
    simhash value). Returns raw candidate pairs (``a`` < ``b``) with the
    left/right ``extra_cols`` suffixed ``_a``/``_b``; callers dedupe.

    The quadratic hazard is a hot bucket: boilerplate/templated corpora
    put thousands of near-identical docs into ONE (band, bucket) group, and
    an uncapped self-join then emits g^2/2 pairs from it (same hazard as a
    hub group in :func:`~.graphstats.bipartite_project`, same pre-join cap).
    With ``max_bucket_size`` set, buckets above the cap are handled by mode:

    - ``"star"`` (default): every member pairs with the bucket's min-id
      representative — O(g) pairs that keep the bucket CONNECTED, so any
      downstream connected-components grouping (``minhash_dedup``) forms
      the same groups as all-pairs whenever the verify filter accepts the
      star edges (true for the near-identical docs that create hot buckets
      in the first place). Nothing is dropped.
    - ``"drop"``: hot buckets are excluded entirely — exact pair semantics
      for the survivors, and the dropped bucket/doc counts are computed
      EAGERLY and logged (no silent truncation).

    Both modes add one map-side-combined aggregate on the bucket key (the
    same shuffle key the join already uses) and a co-partitioned join —
    no new shuffle axis.
    """
    extra_cols = extra_cols or []

    def chunked_pairs(src: DataFrame) -> DataFrame:
        # bounded-chunk enumeration (skew.chunked_self_pairs) instead of a
        # bare bucket self-join — same broadcast-explode hazard and fix as
        # jaccard_similarity_join / edit_distance_join (BENCH/BASELINE.md)
        from .skew import chunked_self_pairs

        out = chunked_self_pairs(src, key_cols, "doc_id", tuple(extra_cols))
        return out.select(
            *key_cols,
            F.col("a_id").alias("a"),
            *[F.col(f"a_{c}").alias(f"{c}_a") for c in extra_cols],
            F.col("b_id").alias("b"),
            *[F.col(f"b_{c}").alias(f"{c}_b") for c in extra_cols],
        )

    if max_bucket_size is None:
        return chunked_pairs(banded)

    if hot_bucket_mode not in ("star", "drop"):
        raise ValueError(f"hot_bucket_mode must be 'star' or 'drop', got {hot_bucket_mode!r}")
    sizes = banded.groupBy(*key_cols).agg(
        F.count(F.lit(1)).alias("__n"), F.min("doc_id").alias("__rep")
    )
    small = sizes.filter(F.col("__n") <= max_bucket_size).select(*key_cols)
    cold = banded.join(small, key_cols, "left_semi")
    pairs = chunked_pairs(cold)

    hot = sizes.filter(F.col("__n") > max_bucket_size)
    if hot_bucket_mode == "drop":
        # eager, driver-side: a dropped bucket must never be silent
        stats = hot.agg(
            F.count(F.lit(1)).alias("buckets"), F.sum("__n").alias("doc_slots")
        ).first()
        if stats["buckets"]:
            log.warning(
                "dropping %d hot LSH buckets (> %d members, %d doc-slots) from the candidate join",
                stats["buckets"], max_bucket_size, stats["doc_slots"],
            )
        return pairs

    star = (
        banded.join(hot.select(*key_cols, "__rep"), key_cols)
        .filter(F.col("doc_id") != F.col("__rep"))
        .select(
            F.col("__rep").alias("a"),  # rep = min id, so a < b always holds
            F.col("doc_id").alias("b"),
            *key_cols,
            *[F.col(c).alias(f"{c}_b") for c in extra_cols],
        )
    )
    if extra_cols:
        # re-attach the representative's carried columns (one join keyed
        # the same way; rep rows per hot bucket << corpus)
        rep_vals = banded.select(
            F.col("doc_id").alias("a"), *key_cols,
            *[F.col(c).alias(f"{c}_a") for c in extra_cols],
        )
        star = star.join(rep_vals, ["a", *key_cols])
    return pairs.unionByName(star.select(*pairs.columns))

# -- exact ----------------------------------------------------------------


def exact_dedup(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """``(doc_id, canonical_id)``: canonical = min doc_id among docs with
    identical normalized text.

    Single hash shuffle keyed by ``(xxhash64(normalized), normalized)``:
    the 64-bit fingerprint leads the key, so partition routing and in-group
    sorting compare 8-byte hashes, and the trailing text component only
    breaks the (2^-64 per pair) hash collisions — exact-text semantics
    without making the full document text the effective sort key.
    """
    fp = F.xxhash64(normalize_text(text_col))
    w = Window.partitionBy(fp, normalize_text(text_col))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.min(id_col).over(w).alias("canonical_id"),
    )


# -- minhash + LSH --------------------------------------------------------


def minhash_signatures(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    n_hashes: int = 64, shingle_k: int = 3, seed: int = 11,
) -> DataFrame:
    """``(doc_id, sig array<long>)`` minhash signatures — 100% JVM-side.

    Two projections, zero shuffles, no UDFs, no Python:

    1. shingle-hash array: tokenize with ``split``, build token k-gram
       shingles with ``transform``/``slice`` and hash each ONCE with
       ``xxhash64(shingle, seed)`` — one 8-byte value per shingle. This
       stage ends in a lazy ``localCheckpoint`` plan barrier: without it,
       Catalyst's CollapseProject inlines the array into stage 2 and
       rebuilds every shingle string once per hash index (measured 40x
       slower on long documents).
    2. signature: ``transform(sequence(0, n-1), i -> array_min(transform(
       hs, h -> xxhash64(h, i))))`` — per-index salting of the fixed-width
       pre-hash realizes hash family *i* (a standard min-wise family, no
       modular-multiply overflow), and the min runs over 8-byte longs.

    A 64-column ``min`` hash-aggregation variant was also measured: ~6x
    slower than this projection (per-row update of 64 aggregate buffers).

    Short docs (< shingle_k tokens) contribute their whole text as a single
    shingle; empty/null docs hash the empty string.

    Small-input spread: because the ``localCheckpoint`` barrier freezes the
    input partitioning, a corpus that arrives in fewer partitions than the
    session has cores (e.g. one small parquet file) would run the whole
    signature projection on ONE core (measured 8x slower at bench scale,
    and the single hot core is what driver-contention amplifies) — see
    :mod:`.spread`; a no-op at corpus scale.
    """
    from .spread import spread_small_input

    docs = spread_small_input(docs)
    toks = F.split(F.trim(F.lower(F.coalesce(F.col(text_col), F.lit("")))), r"\s+")
    # one start index per shingle; clamps to [0] when the doc is short
    starts = F.sequence(F.lit(0), F.greatest(F.size(toks) - shingle_k, F.lit(0)))
    shingles = F.transform(starts, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, shingle_k)))
    hs = docs.select(
        F.col(id_col).alias("doc_id"),
        F.transform(shingles, lambda s: F.xxhash64(s, F.lit(seed))).alias("__hs"),
    ).localCheckpoint(eager=False)
    sig = F.transform(
        F.sequence(F.lit(0), F.lit(n_hashes - 1)),
        lambda i: F.array_min(F.transform(F.col("__hs"), lambda h: F.xxhash64(h, i))),
    )
    return hs.select("doc_id", sig.alias("sig"))


def minhash_lsh_candidates(
    sigs: DataFrame,
    n_bands: int = 16,
    n_hashes: int | None = None,
    max_bucket_size: int | None = None,
    hot_bucket_mode: str = "star",
) -> DataFrame:
    """Candidate near-dup pairs ``(a, b)`` (a < b) sharing >= 1 LSH band.

    Banding is pure DataFrame: slice the signature into ``n_bands`` chunks,
    hash each chunk, groupBy (band, bucket) and self-join within buckets.

    ``n_hashes`` is the signature width; callers that built the signatures
    (``minhash_dedup``) pass it through so no probe job runs. When omitted
    (standalone use on a foreign signature table), one ``.first()`` probe
    reads it from the data.

    ``max_bucket_size`` bounds the per-bucket join width — the defence
    against boilerplate mega-buckets going quadratic; see
    :func:`_capped_bucket_pairs` for the ``"star"``/``"drop"`` semantics.
    """
    if n_hashes is None:
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
    return (
        _capped_bucket_pairs(banded, ["band", "bucket"], max_bucket_size, hot_bucket_mode)
        .select("a", "b")
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
    shingle_k: int = 3, seed: int = 11, max_bucket_size: int | None = None,
) -> DataFrame:
    """``(doc_id, canonical_id)`` near-dup groups at estimated Jaccard >=
    threshold. Groups are formed by treating passing pairs as edges and
    taking min-id connected components (reusing the graph engine!).

    ``max_bucket_size`` (recommended at corpus scale, e.g. 500) star-caps
    hot LSH buckets: a boilerplate mega-bucket emits O(g) rep-to-member
    candidates instead of O(g^2), and because grouping is connectivity-based
    the near-identical docs that form hot buckets still land in one group.
    """
    from ..algos.components import connected_components

    sigs = minhash_signatures(docs, id_col, text_col, n_hashes, shingle_k, seed).persist()
    pairs = minhash_lsh_candidates(
        sigs, n_bands, n_hashes=n_hashes, max_bucket_size=max_bucket_size
    )
    passing = estimated_jaccard(sigs, pairs).filter(F.col("est_jaccard") >= threshold)
    edges = passing.select(F.col("a").alias("src"), F.col("b").alias("dst")).persist()
    # CC runs ONLY over docs that appear in a passing pair — at corpus scale
    # >99% of docs are singletons, and the iterative CC loop must not shuffle
    # them every superstep. Singletons rejoin as identity groups afterwards
    # (one left join, no iteration). Partition count scales with the pair
    # count (the pair graph is usually tiny relative to the corpus, and
    # per-superstep fixed cost scales with task count).
    n_pairs = edges.count()
    conf_p = int(docs.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    p = max(4, min(conf_p, n_pairs // 50_000 + 4))
    comp = connected_components(edges, num_partitions=p)
    out = (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(comp, F.col("doc_id") == comp.id, "left")
        .select("doc_id", F.coalesce(F.col("component"), F.col("doc_id")).alias("canonical_id"))
    )
    out = out.localCheckpoint()
    edges.unpersist()
    sigs.unpersist()
    return out


# -- simhash --------------------------------------------------------------


def simhash(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """``(doc_id, simhash long)`` — 64-bit simhash over token xxhash64s.

    Pure DataFrame implementation: explode tokens, xxhash64 each, unpack the
    64 bits with shift/and, sum signed bits per doc, repack via bit ops —
    no Python at all (the whole thing is codegen'd).
    """
    from .spread import spread_small_input

    # the explode + 64-bit-column partial aggregation is the dominant work
    # and runs in the scan stage — spread one-file corpora (spread.py)
    docs = spread_small_input(docs)
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


def simhash_near_dups(
    docs: DataFrame, max_hamming: int = 3, id_col: str = "doc_id", text_col: str = "text",
    max_bucket_size: int | None = None, hot_bucket_mode: str = "star",
) -> DataFrame:
    """``(a, b, hamming)`` pairs with simhash Hamming distance <= ``max_hamming``.

    Candidate generation by pigeonhole banding: the 64-bit simhash splits
    into ``max_hamming + 1`` bands, and any pair within ``max_hamming`` bit
    flips agrees EXACTLY on at least one band — so an equi-join on
    ``(band_idx, band_bits)`` finds every qualifying pair while touching
    only same-band buckets (the Hamming analogue of banded MinHash-LSH; at
    scale the band value is the shuffle key and no all-pairs join exists).
    The exact ``bit_count(xor)`` filter then runs on candidates only.

    ``max_bucket_size`` bounds hot buckets (see :func:`_capped_bucket_pairs`).
    Unlike the MinHash path, capping here is a PRECISION trade on the pair
    LIST itself: in ``"star"`` mode a hot bucket only emits rep-to-member
    pairs, so two non-rep members whose distance <= max_hamming surface
    only if another (cold) band pairs them — fine when the pairs feed a
    connected-components grouping, lossy for exact pair enumeration
    (``"drop"`` mode is lossy but logged). Leave it ``None`` for exactness.
    """
    n_bands = max_hamming + 1
    width = 64 // n_bands

    def _band_bits(i: int):
        # final band absorbs the remainder bits; shift-and-mask keeps
        # everything in codegen'd long arithmetic. A full-width (64-bit)
        # band — max_hamming=0, or any layout whose last band spans 64
        # bits — needs mask -1 (all bits set in two's complement):
        # (1 << 64) - 1 overflows LongType.
        w = width if i < n_bands - 1 else 64 - i * width
        mask = F.lit(-1).cast("long") if w >= 64 else F.lit((1 << w) - 1)
        return F.shiftrightunsigned(F.col("simhash"), i * width).bitwiseAND(mask)

    sh = simhash(docs, id_col, text_col)
    bands = sh.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(*[
                F.struct(F.lit(i).alias("band_idx"), _band_bits(i).alias("band_bits"))
                for i in range(n_bands)
            ])
        ).alias("band"),
    ).select("doc_id", "simhash", "band.band_idx", "band.band_bits")
    cand = _capped_bucket_pairs(
        bands, ["band_idx", "band_bits"], max_bucket_size, hot_bucket_mode,
        extra_cols=["simhash"],
    )
    return (
        cand.select("a", "b", hamming64(F.col("simhash_a"), F.col("simhash_b")).alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
        .dropDuplicates(["a", "b"])
    )


# -- exact set-similarity join (AllPairs/PPJoin prefix filtering) ----------


def jaccard_similarity_join(
    docs: DataFrame,
    threshold_pct: int = 80,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_token_bucket: int | None = None,
) -> DataFrame:
    """EXACT token-set Jaccard join: every pair ``(a, b)`` (a < b) with
    ``|A ∩ B| / |A ∪ B| >= threshold_pct/100`` — without an all-pairs join.

    AllPairs/PPJoin-family prefix filtering (Bayardo et al. WWW'07; Xiao et
    al. WWW'08): under one global token order, ``J(A,B) >= t`` forces an
    overlap of at least ``ceil(t*|A|)`` tokens, so A and B must share a token
    inside each set's first ``|A| - ceil(t*|A|) + 1`` tokens. Ordering tokens
    by ascending document frequency makes those prefixes the RAREST tokens,
    so the candidate equi-join keys on tokens that appear in few documents —
    frequent tokens (the quadratic hazard) are pushed out of every prefix.
    This is the exact counterpart of the MinHash path above: same shuffle
    shape (token-keyed self-join), no probability of a miss.

    Plan: one token explode -> df aggregate (map-side combined) -> token-key
    join back -> per-doc row_number window on (df, token) -> prefix filter ->
    token-keyed self-join with the Jaccard LENGTH filter
    (``100*min(|A|,|B|) >= pct*max(|A|,|B|)``) applied inside the join ->
    verification on candidates only via sorted token arrays +
    ``array_intersect``. Everything is codegen'd; no Python, no cartesian.

    Values are exact integers end to end: ``inter``, ``union_size``, and
    ``jaccard_micro = (inter * 1_000_000) DIV union`` (floor), so results are
    hash-stable across engines. Threshold is an integer percent for the same
    reason.

    ``max_token_bucket``: optional guard for adversarial corpora (thousands
    of IDENTICAL docs make even the rarest-token buckets quadratic). Prefix
    entries whose token still exceeds the bound are dropped from candidate
    generation with an eager warning — a documented PRECISION trade (pairs
    whose every shared prefix token is hot are missed); leave ``None`` for
    exactness, run :func:`exact_dedup` first to collapse identical docs.
    """
    if not 0 < threshold_pct <= 100:
        raise ValueError(f"threshold_pct must be in (0, 100], got {threshold_pct}")
    toks = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(
                F.split(F.trim(F.lower(F.coalesce(F.col(text_col), F.lit("")))), r"\s+")
            ).alias("tok"),
        )
        .filter(F.col("tok") != "")
        .dropDuplicates(["doc_id", "tok"])
    )
    dfreq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    sz = F.count(F.lit(1)).over(Window.partitionBy("doc_id"))
    rn = F.row_number().over(
        Window.partitionBy("doc_id").orderBy(F.col("df").asc(), F.col("tok").asc())
    )
    ranked = toks.join(dfreq, "tok").select("doc_id", "tok", "df", sz.alias("sz"), rn.alias("rn"))
    # prefix length |x| - ceil(pct*|x|/100) + 1, in pure integer arithmetic
    prefix_len = F.col("sz") - ((F.lit(threshold_pct) * F.col("sz") + 99) / 100).cast("long") + 1
    prefix = ranked.filter(F.col("rn") <= prefix_len).select("doc_id", "tok", "sz")
    if max_token_bucket is not None:
        counts = prefix.groupBy("tok").agg(F.count(F.lit(1)).alias("__n"))
        hot = counts.filter(F.col("__n") > max_token_bucket)
        stats = hot.agg(F.count(F.lit(1)).alias("toks"), F.sum("__n").alias("slots")).first()
        if stats["toks"]:
            log.warning(
                "dropping %d hot prefix tokens (> %d docs, %d prefix slots) from the "
                "similarity-join candidate generation (precision trade)",
                stats["toks"], max_token_bucket, stats["slots"],
            )
        prefix = prefix.join(hot.select("tok"), "tok", "left_anti")
    # bounded-chunk enumeration (operators/skew.py::chunked_self_pairs):
    # the bare token-keyed self-join broadcast the prefix table and ran the
    # candidate enumeration nearly serial (sf0.1 documents: wall flat 46s
    # from local[8] to local[32]; chunked: 17.0s / 12.8s — same fix as the
    # ed-join, measured in BENCH/BASELINE.md)
    from .skew import chunked_self_pairs

    cand = (
        chunked_self_pairs(prefix, "tok", "doc_id", extra_cols=("sz",))
        .filter(
            F.lit(100) * F.least("a_sz", "b_sz")
            >= F.lit(threshold_pct) * F.greatest("a_sz", "b_sz")
        )
        .select(F.col("a_id").alias("a"), F.col("b_id").alias("b"))
        .dropDuplicates(["a", "b"])
    )
    sets = toks.groupBy("doc_id").agg(F.sort_array(F.collect_set("tok")).alias("arr"))
    ja = sets.select(F.col("doc_id").alias("a"), F.col("arr").alias("arr_a"))
    jb = sets.select(F.col("doc_id").alias("b"), F.col("arr").alias("arr_b"))
    inter = F.size(F.array_intersect("arr_a", "arr_b")).cast("long")
    union = (F.size("arr_a") + F.size("arr_b")).cast("long") - inter
    return (
        cand.join(ja, "a")
        .join(jb, "b")
        .select("a", "b", inter.alias("inter"), union.alias("union_size"))
        .filter(F.col("inter") * 100 >= F.lit(threshold_pct) * F.col("union_size"))
        .select(
            "a",
            "b",
            "inter",
            "union_size",
            F.expr("(inter * 1000000) DIV union_size").alias("jaccard_micro"),
        )
    )


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

"""Training-corpus preparation operators: eval-set decontamination, TF-IDF
term weighting, deterministic dataset blending, and intra-document
paragraph deduplication.

These extend the link-graph mandate with the data-prep stages a pretraining
pipeline runs next to dedup/quality filtering (operators/dedup.py,
operators/textops.py). Everything here is pure JVM column expressions — no
UDFs, no driver-side loops over data — so each operator is a codegen'd scan
projection plus the minimum shuffles:

- :func:`decontaminate` — flag training documents sharing any token n-gram
  with an evaluation set (the GPT-3-style 13-gram collision rule). The eval
  gram dictionary is broadcast (eval suites are tiny next to the corpus),
  so the train side is ONE scan + explode + broadcast semi-probe + partial
  agg: no shuffle of corpus text at all.
- :func:`tfidf_top_terms` — classic tf-idf with smooth idf; document
  frequency is aggregated once and broadcast back (the vocabulary after
  aggregation is millions of rows, not corpus-sized).
- :func:`blend_corpora` — deterministic mixture sampling: hit target domain
  proportions exactly (floor arithmetic) by taking the lowest-hash documents
  per domain. Multiplicative-hash ordering (packing.KNUTH) makes the sample
  stable under repartitioning/reruns and cross-engine reproducible — the
  same leakage-safety property as packing.hash_split.
- :func:`dedup_paragraphs` — Gopher-style repetition removal WITHIN a
  document: drop repeated paragraphs, keep first occurrences in order.
  Entirely per-row array expressions (zero shuffles).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .packing import KNUTH


def _ngram_set(text_col: str, n: int):
    """Distinct token ``n``-gram array (same tokenizer + short-doc clamp as
    dedup.ngram_jaccard so the DuckDB oracle mirrors both identically)."""
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    return F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)))
    )


def decontaminate(
    train: DataFrame,
    eval_docs: DataFrame,
    n: int = 13,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_hits: int = 1,
) -> DataFrame:
    """Per-train-document eval-set n-gram contamination report.

    Returns ``(doc_id, n_grams, n_hits, contaminated)`` where ``n_hits`` is
    the number of DISTINCT train-doc n-grams that appear anywhere in the
    evaluation set and ``contaminated = 1`` iff ``n_hits >= min_hits`` (the
    GPT-3 decontamination rule with its default single-collision trigger).

    Scale shape: the eval side collapses to a distinct gram dictionary
    (benchmark suites are MBs against a 100-TB corpus) and is broadcast, so
    the train corpus is scanned once — explode + broadcast hash probe +
    map-side-combined count. Documents shorter than ``n`` tokens contribute
    their whole text as one gram (clamp shared with the oracle).
    """
    grams = F.broadcast(
        eval_docs.select(F.explode(_ngram_set(text_col, n)).alias("gram"))
        .dropDuplicates()
        .withColumn("__hit", F.lit(1))
    )
    tr = train.select(
        F.col(id_col).alias("doc_id"),
        _ngram_set(text_col, n).alias("__grams"),
    ).select("doc_id", F.size("__grams").alias("n_grams"), F.explode("__grams").alias("gram"))
    return (
        tr.join(grams, "gram", "left")
        .groupBy("doc_id")
        .agg(
            F.first("n_grams").alias("n_grams"),
            F.coalesce(F.sum("__hit"), F.lit(0)).alias("n_hits"),
        )
        .select(
            "doc_id",
            "n_grams",
            "n_hits",
            (F.col("n_hits") >= min_hits).cast("int").alias("contaminated"),
        )
    )


def tfidf_top_terms(
    docs: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` tf-idf terms per document.

    ``score = tf * (ln((N + 1) / (df + 1)) + 1)`` (smooth idf). Returns
    ``(doc_id, term, tf, score, rk)``, ``rk`` 1..k ordered by score
    descending with the term string as the deterministic tiebreak (equal
    scores arise exactly when (tf, df) coincide).

    Plan: one explode + (doc, term) partial-agg shuffle for tf; the df
    relation is the aggregated vocabulary — broadcast back onto tf so the
    per-document ranking window is the only other shuffle. N is taken with
    one count() on the input (a setup action, not per-row driver work).
    """
    n_docs = docs.count()
    terms = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.trim(F.lower(F.col(text_col))), r"\s+")).alias("term"),
    )
    tf = terms.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    score = F.col("tf") * (
        F.log((F.lit(float(n_docs) + 1.0)) / (F.col("df") + F.lit(1.0))) + F.lit(1.0)
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("__score").desc(), F.col("term").asc())
    return (
        tf.join(F.broadcast(dfreq), "term")
        .withColumn("__score", score)
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("doc_id", "term", "tf", F.round("__score", 6).alias("score"), "rk")
    )


def blend_corpora(
    docs: DataFrame,
    weights: dict[str, float],
    domain_col: str = "lang",
    id_col: str = "doc_id",
    salt: int = 0,
) -> DataFrame:
    """Deterministic mixture sampling to target domain proportions.

    Given target weights ``{domain: w}`` (any positive scale; normalized
    internally), computes the largest total sample size ``S`` such that
    every domain can supply its share (``S = min_d floor(n_d / w_d)`` after
    normalization), then takes ``take_d = floor(w_d * S)`` documents from
    each domain — specifically the ``take_d`` with the SMALLEST
    multiplicative hash ``((id + salt) * KNUTH) mod 2^32`` (ties broken by
    id). The selection is a pure function of ids, so reruns, repartitioning,
    and incremental re-executions pick the same sample (no RNG state), and a
    DuckDB oracle reproduces it bit-for-bit.

    Domains absent from ``weights`` are dropped. Returns the selected rows
    with all input columns plus ``blend_rk`` (1-based within-domain rank).

    Scale shape: one small count-by-domain aggregate (collected — rows =
    #domains), then a per-domain ranking window. The window shuffles on the
    domain key; with few heavy domains that is the natural skew point, so at
    real scale run it per-domain-bucket (the hash order is total, so any
    partition-parallel top-take_d over hash ranges composes exactly).
    """
    from fractions import Fraction

    # exact rational normalization: with integer weights, S and take_d are
    # pure integer arithmetic — floor(n_d * wsum / w_d), floor(w_d * S / wsum)
    # — reproducible bit-for-bit by a SQL oracle (no float-boundary drift)
    wsum = sum(Fraction(w) for w in weights.values())
    if wsum <= 0:
        raise ValueError("blend weights must sum to a positive value")
    norm = {d: Fraction(w) / wsum for d, w in weights.items()}
    counts = {
        r["d"]: r["n"]
        for r in docs.filter(F.col(domain_col).isin(list(norm)))
        .groupBy(F.col(domain_col).alias("d"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    missing = sorted(set(norm) - set(counts))
    if missing:
        raise ValueError(f"blend domains absent from corpus: {missing}")
    s_total = min(counts[d] // norm[d] for d in norm)
    takes = {d: int(norm[d] * s_total) for d in norm}
    h = F.pmod((F.col(id_col) + F.lit(salt)) * F.lit(KNUTH), F.lit(1 << 32))
    w = Window.partitionBy(domain_col).orderBy(h.asc(), F.col(id_col).asc())
    take_expr = F.create_map(
        *[x for d, t in sorted(takes.items()) for x in (F.lit(d), F.lit(t))]
    )
    return (
        docs.filter(F.col(domain_col).isin(list(norm)))
        .withColumn("blend_rk", F.row_number().over(w))
        .filter(F.col("blend_rk") <= take_expr[F.col(domain_col)])
    )


def prepare_training_corpus(
    docs: DataFrame,
    eval_docs: DataFrame,
    min_quality: float = 0.7,
    ngram: int = 13,
    budget: int = 256,
    train_pct: int = 90,
    val_pct: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The full corpus-preparation pipeline as ONE declarative plan:

    quality filter -> exact dedup (keep canonical copy) -> eval-set
    decontamination (drop contaminated) -> deterministic train/val/test
    split -> per-split sequence packing.

    Returns per-document placement rows ``(doc_id, split, n_tokens,
    start_offset, first_chunk, last_chunk, n_chunks)``. Because every stage
    is pure column/window algebra, Catalyst fuses the whole pipeline —
    filters reach the scan, the only wide exchanges are the dedup window,
    the decontamination count, and the per-split packing window, and the
    eval gram dictionary rides a broadcast. This is the composition gate:
    each stage is individually oracle-checked elsewhere, this one pins the
    stage INTERACTIONS (e.g. packing offsets shift when dedup drops a doc).
    """
    from .dedup import exact_dedup
    from .packing import hash_split, pack_chunks
    from .textops import quality_filter

    q = quality_filter(docs, min_quality, text_col=text_col)
    canon = exact_dedup(q, id_col=id_col, text_col=text_col)
    keep_ids = (
        canon.filter(F.col("doc_id") == F.col("canonical_id"))
        .select(F.col("doc_id").alias("__keep_id"))
    )
    kept = q.join(keep_ids, q[id_col] == F.col("__keep_id"), "left_semi")
    dec = decontaminate(kept, eval_docs, n=ngram, id_col=id_col, text_col=text_col)
    clean_ids = (
        dec.filter(F.col("contaminated") == 0).select(F.col("doc_id").alias("__clean_id"))
    )
    clean = kept.join(clean_ids, kept[id_col] == F.col("__clean_id"), "left_semi")
    s = hash_split(clean, id_col=id_col, train_pct=train_pct, val_pct=val_pct)
    packed = pack_chunks(s, budget, id_col=id_col, text_col=text_col, shard_col="split")
    return packed.withColumnRenamed("shard", "split")


def dedup_paragraphs(
    docs: DataFrame,
    sep: str = "\n",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Remove repeated paragraphs within each document (first occurrence
    kept, original order preserved) — the intra-document repetition-removal
    stage of quality pipelines (Gopher rules family).

    Returns ``(doc_id, n_paras, n_kept, text_dedup)``. Implementation is a
    single per-row projection: split on ``sep``, keep element ``i`` iff its
    first occurrence index is ``i`` (``array_position``), re-join. No
    shuffle, no UDF; cost is O(p^2) string compares per doc where p is the
    paragraph count — p is tens, not thousands, for real documents.
    """
    parts = F.split(F.col(text_col), sep, -1)  # sep is a regex, like F.split itself
    d = docs.select(F.col(id_col).alias("doc_id"), parts.alias("__p"))
    kept = F.filter(
        F.col("__p"), lambda x, i: F.array_position(F.col("__p"), x) == i + F.lit(1)
    )
    return d.select(
        "doc_id",
        F.size("__p").alias("n_paras"),
        F.size(kept).alias("n_kept"),
        F.array_join(kept, sep).alias("text_dedup"),
    )


# ---------------------------------------------------------------------------
# DSIR-style hashed n-gram importance weighting (Xie et al. 2023,
# arXiv:2302.03169): score raw-corpus documents by how target-like their
# hashed token-bucket profile is, to reweight/select pretraining data.
# ---------------------------------------------------------------------------

_POLY_MOD = 2**31


def _token_bucket_counts(text_col: str, n_buckets: int):
    """Per-row length-``n_buckets`` BIGINT count array of hashed unigrams.

    The hash is an engine-neutral polynomial char code
    (``h = (h*31 + codepoint) mod 2^31``, then ``mod n_buckets``) instead of
    xxhash64 so the DuckDB oracle replays it bit-for-bit (same reason
    packing.KNUTH exists). Pure per-row array expressions — computing the
    feature vector costs ZERO shuffles regardless of corpus size.
    """
    toks = F.filter(
        F.split(F.trim(F.lower(F.col(text_col))), r"\s+"), lambda t: F.length(t) > 0
    )
    code = lambda t: F.pmod(  # noqa: E731
        F.aggregate(
            F.transform(F.split(t, ""), lambda c: F.ascii(c).cast("long")),
            F.lit(0).cast("long"),
            lambda a, c: F.pmod(a * 31 + c, F.lit(_POLY_MOD)),
        ),
        F.lit(n_buckets),
    )
    buckets = F.transform(toks, code)
    return F.transform(
        F.sequence(F.lit(0), F.lit(n_buckets - 1)),
        lambda b: F.size(F.filter(buckets, lambda x: x == b)).cast("long"),
    )


def importance_weights(
    docs: DataFrame,
    target_pred,
    n_buckets: int = 16,
    threshold_num: int = 21,
    threshold_den: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Data-selection importance weights from hashed unigram buckets.

    DSIR's framework: estimate a target and a raw bucket distribution
    (add-one smoothed), weight each document by how much more target-mass
    than raw-mass its feature profile carries, select documents above a
    threshold. This implementation uses the FIRST-MOMENT (linear) weight

        importance(x) = [sum_b c_b(x) * p_target(b)] / [sum_b c_b(x) * p_raw(b)]

    which is exact-rational in integer arithmetic end-to-end — the gate
    hashes stringified values, so the emitted columns are the exact BIGINT
    numerator/denominator (totals-normalized) and an integer selected flag,
    reproducible on any engine. DSIR's log-likelihood-ratio weight (the
    product form) is :func:`importance_logratio` below — same features,
    float log-space, NumPy-replay-tested instead of oracle-gated.

    Returns ``(doc_id, imp_num, imp_den, selected)`` where
    ``imp_num = (sum_b c_b*(T_b+1)) * (R+B)``,
    ``imp_den = (sum_b c_b*(R_b+1)) * (T+B)``, and ``selected = 1`` iff
    ``threshold_den * imp_num >= threshold_num * imp_den`` (empty documents
    are never selected). ``importance = imp_num/imp_den``.

    Scale shape: the per-doc feature array is zero-shuffle; the two global
    bucket tables are B-row map-side-combined aggregates; their values ride
    back into ONE final projection as literals (broadcast by value). An
    int64 bound is asserted from the measured totals — at trillion-token
    scale emit the two factors of each side separately instead (noted in
    the error).
    """
    d = docs.select(
        F.col(id_col).alias("doc_id"),
        _token_bucket_counts(text_col, n_buckets).alias("__c"),
        F.when(target_pred, F.lit(1)).otherwise(F.lit(0)).alias("__is_target"),
    )
    d = d.persist()
    # two B-row vocabularies in one pass: bucket totals overall + target-only
    totals = (
        d.select(F.col("__is_target"), F.posexplode("__c").alias("b", "c"))
        .groupBy("b")
        .agg(
            F.sum("c").alias("r"),
            F.sum(F.col("c") * F.col("__is_target")).alias("t"),
        )
        .collect()
    )
    R = {int(row["b"]): int(row["r"]) for row in totals}
    T = {int(row["b"]): int(row["t"]) for row in totals}
    r_total = sum(R.values()) + n_buckets
    t_total = sum(T.values()) + n_buckets
    max_tokens = int(
        d.agg(F.max(F.aggregate("__c", F.lit(0).cast("long"), lambda a, x: a + x))).first()[0]
        or 0
    )
    worst_side = max_tokens * (max(max(R.values(), default=0), max(T.values(), default=0)) + 1)
    if worst_side * max(r_total, t_total) * max(threshold_num, threshold_den) >= 2**63:
        raise ValueError(
            "int64 overflow risk at these corpus totals: emit the factor "
            "columns (sum_b c_b*(T_b+1)) and (sum_b c_b*(R_b+1)) separately "
            "and compare as DECIMAL(38,0) instead"
        )
    t_lit = F.array(*[F.lit(T.get(b, 0) + 1).cast("long") for b in range(n_buckets)])
    r_lit = F.array(*[F.lit(R.get(b, 0) + 1).cast("long") for b in range(n_buckets)])
    dot = lambda lit: F.aggregate(  # noqa: E731
        F.zip_with("__c", lit, lambda c, w: c * w), F.lit(0).cast("long"), lambda a, x: a + x
    )
    num = (dot(t_lit) * F.lit(r_total)).alias("imp_num")
    den = (dot(r_lit) * F.lit(t_total)).alias("imp_den")
    out = d.select("doc_id", num, den).withColumn(
        "selected",
        F.when(
            (F.col("imp_den") > 0)
            & (F.lit(threshold_den) * F.col("imp_num") >= F.lit(threshold_num) * F.col("imp_den")),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    return out


def importance_logratio(
    docs: DataFrame,
    target_pred,
    n_buckets: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """DSIR's actual log-likelihood-ratio importance weight:
    ``log w(x) = sum_b c_b(x) * [ln p_target(b) - ln p_raw(b)]`` with
    add-one smoothing — the product-form weight the paper resamples by.

    Same zero-shuffle features and B-row vocabularies as
    :func:`importance_weights`; the per-bucket log ratios fold into the
    final projection as a double literal array. Float output (libm logs),
    so this variant is NumPy-replay-tested rather than oracle-gated.
    Returns ``(doc_id, log_weight)``.
    """
    import math as _math

    d = docs.select(
        F.col(id_col).alias("doc_id"),
        _token_bucket_counts(text_col, n_buckets).alias("__c"),
        F.when(target_pred, F.lit(1)).otherwise(F.lit(0)).alias("__is_target"),
    ).persist()
    totals = (
        d.select(F.col("__is_target"), F.posexplode("__c").alias("b", "c"))
        .groupBy("b")
        .agg(F.sum("c").alias("r"), F.sum(F.col("c") * F.col("__is_target")).alias("t"))
        .collect()
    )
    R = {int(row["b"]): int(row["r"]) for row in totals}
    T = {int(row["b"]): int(row["t"]) for row in totals}
    r_total = sum(R.values()) + n_buckets
    t_total = sum(T.values()) + n_buckets
    ratios = [
        _math.log((T.get(b, 0) + 1) / t_total) - _math.log((R.get(b, 0) + 1) / r_total)
        for b in range(n_buckets)
    ]
    lit = F.array(*[F.lit(float(x)) for x in ratios])
    lw = F.aggregate(
        F.zip_with("__c", lit, lambda c, w: c.cast("double") * w),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    return d.select("doc_id", lw.alias("log_weight"))


def remove_repeated_spans(
    docs: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 2,
) -> DataFrame:
    """Exact repeated-substring removal (ExactSubstr semantics): delete
    every token that lies inside a word span of length >= ``k`` occurring
    at least ``min_count`` times anywhere in the corpus (other documents
    OR elsewhere in the same one).

    Lee et al. 2022 ("Deduplicating Training Data Makes Language Models
    Better" — public methodology) implement this with a corpus-wide suffix
    array. Distributed, the same token set falls out of k-gram anchoring:
    a duplicated span of length >= k is exactly a run of duplicated
    k-token windows, so {tokens covered by a duplicated k-window} IS the
    ExactSubstr removal set — no suffix array, no approximation.

    Scale shape: one corpus scan explodes each token position's k-gram
    (stream-sized, the same cost class as `decontaminate`'s 13-grams);
    one map-side-combined count keyed by gram; one join of the gram stream
    against the duplicated-gram keys (AQE broadcasts when the duplicate
    dictionary is small — on clean corpora it is); the surviving (doc,
    start) marks group back to documents (rows ∝ duplicated text only).
    Interval merging + token excision happen per row in codegen'd array
    expressions — no Python, no window functions, no second corpus scan.

    Returns ``(id_col, n_tokens, n_removed, text_clean)``.
    """
    toks = f"split({text_col}, ' ')"
    grams = F.expr(
        f"IF(size({toks}) < {k}, array(),"
        f" transform(sequence(1, size({toks}) - {k} + 1),"
        f" i -> array_join(slice({toks}, i, {k}), ' ')))"
    )
    stream = docs.select(F.col(id_col), F.posexplode(grams).alias("pos", "gram")).select(
        id_col, (F.col("pos") + 1).alias("s"), "gram"
    )
    dup = (
        stream.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= min_count)
        .select("gram")
    )
    marks = (
        stream.join(dup, "gram")
        .groupBy(id_col)
        .agg(F.collect_list("s").alias("starts"))
    )
    return (
        docs.join(marks, id_col, "left")
        .select(
            F.col(id_col),
            F.expr(f"size({toks})").alias("n_tokens"),
            F.expr(
                f"""array_distinct(flatten(transform(
                      coalesce(starts, array()),
                      s -> sequence(s, s + {k} - 1))))"""
            ).alias("covered"),
            F.expr(toks).alias("w"),
        )
        .select(
            id_col,
            "n_tokens",
            F.size("covered").alias("n_removed"),
            F.expr(
                """array_join(transform(
                     filter(sequence(1, n_tokens), i -> NOT array_contains(covered, i)),
                     i -> element_at(w, i)), ' ')"""
            ).alias("text_clean"),
        )
    )


def shapley_source_value(
    docs: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
    denom: int = 232792560,
) -> DataFrame:
    """Exact Shapley valuation of each corpus source under the vocabulary
    coverage game — the standard data-valuation question ("how much unique
    signal does each source actually contribute to the mix?") answered
    with the game-theoretic attribution (Shapley 1953; coverage-game data
    valuation as in Ghorbani & Zou 2019's framing, computed exactly).

    The game: v(S) = number of distinct word types covered by the union of
    sources in S. For coverage games the Shapley value collapses to a
    closed form — in a uniformly random source ordering, a word's marginal
    credit goes to whichever of the m sources containing it arrives first,
    each equally likely — so ``phi(source) = sum over its words of 1/m``.
    No subset enumeration, no sampling: ONE distinct (source, word)
    explode, one per-word source count, one grouped sum. The per-word
    share is emitted as the exact integer ``denom / m`` (``denom`` =
    lcm(1..20) by default), so the valuation is pure BIGINT arithmetic;
    ``max_m`` in the output certifies the precondition ``m <= 20`` (the
    operator raises it via data, not silently — a corpus with more
    overlapping sources passes a larger lcm).

    Scale shape: the explode is the corpus tokenization pass every corpus
    job already does; distinct + two grouped aggregates, all map-side
    combinable. Output: one row per source — ``n_words`` (vocabulary
    size), ``n_exclusive`` (words only it has), ``shapley_scaled``
    (phi * denom, exact), ``max_m``.
    """
    words = (
        docs.select(
            F.col(source_col).alias("s"),
            F.explode(
                F.expr(f"regexp_extract_all(lower(coalesce({text_col}, '')), '[a-z0-9]+', 0)")
            ).alias("w"),
        )
        .dropDuplicates()
    )
    m = words.groupBy("w").agg(F.count(F.lit(1)).alias("m"))
    return (
        words.join(m.hint("shuffle_hash"), "w")
        .groupBy(F.col("s").alias(source_col))
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum(F.when(F.col("m") == 1, 1).otherwise(0)).cast("long").alias("n_exclusive"),
            F.sum(F.expr(f"CAST({int(denom)} AS BIGINT) DIV m")).alias("shapley_scaled"),
            F.max("m").cast("long").alias("max_m"),
        )
    )


def source_weighted_jaccard(
    docs: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """All-pairs weighted (multiset) Jaccard similarity between corpus
    sources over token frequency profiles: ``J(A, B) = sum_w min(f_A(w),
    f_B(w)) / sum_w max(f_A(w), f_B(w))`` — the mixture-design diagnostic
    ("which sources are near-duplicates of each other at the
    distribution level?") that complements the per-document dedup
    operators; used to de-weight redundant sources before blending
    (blend_corpora above).

    Exact integers end to end: per-(source, token) counts, per-source
    totals, one token-keyed self-join for ``sum min`` (the identity
    ``sum max = tot_a + tot_b - sum min`` avoids a full-outer join — only
    co-occurring tokens ever meet), a totals cross for the zero-overlap
    pairs, and ``jaccard_micro`` by integer division. Scale shape: the
    token self-join is keyed on the token with #sources² fan-out per
    token (sources are few by construction — this is a per-SOURCE matrix,
    n_pairs = s(s-1)/2); one shuffle for the counts, one for the join.
    """
    toks = docs.select(
        F.col(source_col).alias("s"),
        F.explode(
            F.expr(f"regexp_extract_all(lower(coalesce({text_col}, '')), '[a-z0-9]+', 0)")
        ).alias("w"),
    )
    counts = toks.groupBy("s", "w").agg(F.count(F.lit(1)).alias("c"))
    tot = counts.groupBy("s").agg(F.sum("c").alias("tot"))
    a = counts.select(F.col("s").alias("sa"), "w", F.col("c").alias("ca"))
    b = counts.select(F.col("s").alias("sb"), "w", F.col("c").alias("cb"))
    mins = (
        a.join(b, "w")
        .filter(F.col("sa") < F.col("sb"))
        .groupBy("sa", "sb")
        .agg(F.sum(F.least("ca", "cb")).alias("sum_min"))
    )
    pairs = (
        tot.select(F.col("s").alias("sa"), F.col("tot").alias("tot_a"))
        .crossJoin(tot.select(F.col("s").alias("sb"), F.col("tot").alias("tot_b")))
        .filter(F.col("sa") < F.col("sb"))
    )
    return (
        pairs.join(mins, ["sa", "sb"], "left")
        .select(
            F.col("sa").alias("source_a"),
            F.col("sb").alias("source_b"),
            "tot_a",
            "tot_b",
            F.coalesce("sum_min", F.lit(0)).cast("long").alias("sum_min"),
        )
        .withColumn(
            "jaccard_micro",
            F.expr("(sum_min * 1000000) div (tot_a + tot_b - sum_min)"),
        )
    )


def span_corruption(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    mask_mod: int = 5,
) -> DataFrame:
    """T5-style span-corruption example prep (Raffel et al. 2020): mask a
    deterministic ~1/``mask_mod`` of each document's tokens, collapse each
    contiguous masked run to one ``<extra_id_K>`` sentinel in the input,
    and emit the masked spans behind their sentinels as the target — the
    denoising-objective batch the training pipeline materializes after
    packing.

    Determinism contract: the mask bit for position ``i`` is pure integer
    mixing ``(((doc_id % 2^31) * 31 + i) * KNUTH) % mask_mod == 0`` — no
    RNG, replayable by the DuckDB oracle and stable under repartitioning
    (the hash_split property, applied per token position). All string
    assembly is JVM array expressions; sentinel numbering is the
    prefix count of run starts (an O(n^2) in-row scan — bounded by doc
    length, zero shuffles, nothing leaves the row).

    Returns ``(id_col, n_tokens, n_masked, input_text, target_text)``.
    """
    knuth = 2654435761
    toks = F.expr(
        f"regexp_extract_all(lower(coalesce({text_col}, '')), '[a-z0-9]+', 0)"
    )
    mk = (
        f"transform(sequence(1, size(__toks)), i -> "
        f"((({id_col} % 2147483648) * 31 + i) * {knuth}) % {mask_mod} = 0)"
    )
    # run start at i: masked AND (i = 1 OR previous unmasked); ANSI-safe
    start = (
        "(element_at(__mk, CAST(i AS INT)) AND (CASE WHEN i = 1 THEN true "
        "ELSE NOT element_at(__mk, CAST(i - 1 AS INT)) END))"
    )
    start_j = start.replace("i", "j")
    sent_k = (
        f"concat('<extra_id_', CAST(size(filter(sequence(1, i), j -> {start_j})) - 1 "
        "AS STRING), '>')"
    )
    input_expr = (
        f"array_join(filter(transform(sequence(1, size(__toks)), i -> "
        f"CASE WHEN NOT element_at(__mk, CAST(i AS INT)) THEN element_at(__toks, CAST(i AS INT)) "
        f"WHEN {start} THEN {sent_k} "
        f"ELSE NULL END), x -> x IS NOT NULL), ' ')"
    )
    target_expr = (
        f"array_join(filter(transform(sequence(1, size(__toks)), i -> "
        f"CASE WHEN {start} THEN concat({sent_k}, ' ', element_at(__toks, CAST(i AS INT))) "
        f"WHEN element_at(__mk, CAST(i AS INT)) THEN element_at(__toks, CAST(i AS INT)) "
        f"ELSE NULL END), x -> x IS NOT NULL), ' ')"
    )
    return (
        docs.select(F.col(id_col), toks.alias("__toks"))
        .withColumn("__mk", F.expr(mk))
        .filter(F.size("__toks") > 0)
        .select(
            id_col,
            F.size("__toks").cast("long").alias("n_tokens"),
            F.expr(
                "CAST(size(filter(__mk, x -> x)) AS BIGINT)"
            ).alias("n_masked"),
            F.expr(input_expr).alias("input_text"),
            F.expr(target_expr).alias("target_text"),
        )
    )


def sft_context_window(
    transcripts: DataFrame,
    budget: int,
    cost_col: str = "__cost",
    target_role: str = "assistant",
) -> DataFrame:
    """Budgeted-history SFT example planning over a transcripts table: for
    every ``target_role`` turn, select the LONGEST contiguous suffix of the
    preceding turns whose total cost fits ``budget`` — the left-truncation
    an SFT pipeline applies so each training example ends at an assistant
    turn and starts wherever the context budget allows (the multi-turn
    generalization of :func:`~.sequences.sft_pairs`).

    ``transcripts`` must already carry an integer per-turn cost column
    ``cost_col`` (token count, byte length — caller's tokenizer). Returns
    one row per target turn:

        (conv_id, target_turn, ctx_start_turn, n_ctx_turns, ctx_cost)

    with ``ctx_start_turn = target_turn`` and zero counts when not even the
    immediately preceding turn fits. All outputs exact BIGINTs.

    Plan: one keyed-window prefix sum ``C(i)`` per conversation, then an
    intra-conversation (target, candidate) equi-join on ``conv_id`` kept
    NON-quadratic by the budget filter itself — a turn ``s`` joins a target
    ``t`` iff ``C(t-1) - C(s-1) <= budget``, i.e. each target matches only
    the turns inside its own context window (output rows = sum of window
    lengths, the same cardinality the packer must emit anyway). Suffix
    contiguity makes the fit test monotone in ``s``, so the filter IS the
    selection — no argmin pass. Long-conversation skew is bounded by
    ``budget`` per target, not by conversation length.
    """
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    c = transcripts.select(
        "conv_id",
        "turn_idx",
        "role",
        F.col(cost_col).cast("long").alias("__c"),
    ).withColumn("__cum", F.sum("__c").over(w))

    targets = c.filter(F.col("role") == target_role).select(
        "conv_id",
        F.col("turn_idx").alias("target_turn"),
        (F.col("__cum") - F.col("__c")).alias("__cum_before"),
    )
    cands = c.select(
        "conv_id",
        F.col("turn_idx").alias("__s"),
        (F.col("__cum") - F.col("__c")).alias("__prev_cum"),
    )
    included = targets.join(cands, "conv_id").filter(
        (F.col("__s") < F.col("target_turn"))
        & (F.col("__cum_before") - F.col("__prev_cum") <= F.lit(budget))
    )
    fit = included.groupBy("conv_id", "target_turn").agg(
        F.min("__s").alias("ctx_start_turn"),
        F.count(F.lit(1)).alias("n_ctx_turns"),
        (F.first("__cum_before") - F.min("__prev_cum")).alias("ctx_cost"),
    )
    return (
        targets.join(fit, ["conv_id", "target_turn"], "left")
        .select(
            "conv_id",
            "target_turn",
            F.coalesce("ctx_start_turn", F.col("target_turn"))
            .cast("long")
            .alias("ctx_start_turn"),
            F.coalesce("n_ctx_turns", F.lit(0).cast("long")).alias("n_ctx_turns"),
            F.coalesce("ctx_cost", F.lit(0).cast("long")).alias("ctx_cost"),
        )
    )


def dsir_weights(
    docs: DataFrame,
    target_flag,
    n_buckets: int = 4096,
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: int = 0,
) -> DataFrame:
    """DSIR-style importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling" — public methodology):
    hashed n-gram bag-of-words models of the TARGET distribution (the
    trusted/domain subset, selected by the boolean column expression
    ``target_flag``) and the RAW distribution (the whole corpus); each
    document's weight is its feature-wise log-likelihood ratio
    ``sum_f [ log p_target(f) − log p_raw(f) ]``, the quantity DSIR
    resamples by. High weight ⇒ looks like the target domain.

    Features are unigrams + word bigrams hashed into ``n_buckets`` via the
    engine-neutral poly31→mix31 chain (no xxhash — the DuckDB oracle
    replays it exactly). Probabilities are add-1 smoothed over buckets:
    ``p = (c + 1) / (T + n_buckets)``. Every LN is taken on an
    exactly-representable BIGINT and rounded to NANOunits before any
    subtraction or sum, so document weights are exact BIGINTs
    (hash-stability discipline).

    Scale shape: the corpus is exploded ONCE into hashed features and
    localCheckpointed; both count tables (bucket-sized, i.e. tiny) and the
    scoring join reuse that frame. Two map-side-combined aggregates, two
    scalar totals to the driver, one co-partitioned (AQE-broadcastable)
    join pair. No Python anywhere.

    Returns ``(id_col, n_feats, dsir_nano, avg_dsir_nano)``.
    """
    from .sketches import _mix31, _poly31

    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    toks = F.when(F.trim(F.col(text_col)) == "", F.array().cast("array<string>")).otherwise(toks)
    bigrams = F.expr(
        f"IF(size(split(trim({text_col}), '\\\\s+')) < 2 OR trim({text_col}) = '', "
        f"array(), transform(sequence(1, size(split(trim({text_col}), '\\\\s+')) - 1), "
        f"i -> concat(element_at(split(trim({text_col}), '\\\\s+'), i), ' ', "
        f"element_at(split(trim({text_col}), '\\\\s+'), i + 1))))"
    )
    feats = (
        docs.select(
            F.col(id_col),
            target_flag.alias("__tgt"),
            F.explode_outer(F.concat(toks, bigrams)).alias("f"),
        )
        .select(
            F.col(id_col),
            "__tgt",
            F.when(
                F.col("f").isNull(), F.lit(None).cast("long")
            ).otherwise(F.pmod(_mix31(_poly31(F.col("f")), salt), F.lit(int(n_buckets)))).alias("h"),
        )
        .localCheckpoint()
    )
    present = feats.filter(F.col("h").isNotNull())
    tgt = present.filter(F.col("__tgt")).groupBy("h").agg(F.count(F.lit(1)).alias("ct"))
    raw = present.groupBy("h").agg(F.count(F.lit(1)).alias("cr"))
    t_t, t_r = (
        present.agg(
            F.sum(F.when(F.col("__tgt"), 1).otherwise(0)).alias("tt"),
            F.count(F.lit(1)).alias("tr"),
        )
        .collect()[0]
    )
    nano = 1000000000.0
    den_t = F.round(F.log(F.lit(float(int(t_t) + n_buckets))) * F.lit(nano)).cast("bigint")
    den_r = F.round(F.log(F.lit(float(int(t_r) + n_buckets))) * F.lit(nano)).cast("bigint")
    term = (
        F.round(F.log((F.coalesce(F.col("ct"), F.lit(0)) + 1).cast("double")) * F.lit(nano)).cast("bigint")
        - den_t
        - F.round(F.log((F.coalesce(F.col("cr"), F.lit(0)) + 1).cast("double")) * F.lit(nano)).cast("bigint")
        + den_r
    )
    scored = (
        feats.join(tgt, "h", "left")
        .join(raw, "h", "left")
        .select(
            F.col(id_col),
            F.when(F.col("h").isNull(), F.lit(None).cast("bigint")).otherwise(term).alias(
                "lr_nano"
            ),
        )
    )
    return (
        scored.groupBy(id_col)
        .agg(
            F.count("lr_nano").alias("n_feats"),
            F.coalesce(F.sum("lr_nano"), F.lit(0)).alias("dsir_nano"),
        )
        .select(
            id_col,
            "n_feats",
            "dsir_nano",
            F.expr("IF(n_feats = 0, 0L, dsir_nano div n_feats)").alias("avg_dsir_nano"),
        )
    )

"""Text-analysis operators over a documents table.

All scoring columns are JVM expressions from functions/text.py (zero UDFs),
so a profile over 100 TB of documents is a single codegen'd scan projection
plus one aggregate. Language ID is an n-gram/markers heuristic kept
deliberately SQL-mirrorable so the DuckDB oracle can replicate it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import (
    STOPWORDS,
    char_count,
    fingerprint,
    mean_token_len,
    normalize_text,
    quality_score,
    stopword_count,
    stopword_ratio,
    token_count,
)

# tiny marker lexicons per language (heuristic lang-id; deterministic)
LANG_MARKERS = {
    "en": ["the", "and", "of", "is"],
    "de": ["der", "die", "und", "ist"],
    "fr": ["le", "la", "et", "est"],
    "es": ["el", "los", "y", "es"],
}


def _marker_hits(lang: str):
    pattern = r"\b(" + "|".join(LANG_MARKERS[lang]) + r")\b"
    return F.size(F.regexp_extract_all(F.lower(F.col("text")), F.lit(pattern), F.lit(0)))


def text_profile(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-document metrics: tokens, chars, stopwords, quality, fingerprint."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        token_count(text_col).alias("n_tokens"),
        char_count(text_col).alias("n_chars_m"),
        stopword_count(text_col).alias("n_stopwords"),
        F.round(stopword_ratio(text_col), 6).alias("stopword_ratio"),
        F.round(mean_token_len(text_col), 6).alias("mean_token_len"),
        F.round(quality_score(text_col), 6).alias("quality"),
        fingerprint(text_col).alias("fingerprint"),
    )


def lang_id(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """``(doc_id, lang_pred)`` — argmax of marker-lexicon hit counts, ties
    broken by language code order; 'und' when no marker hits at all."""
    hits = docs.select(
        F.col(id_col).alias("doc_id"),
        *[_marker_hits(lang).alias(f"h_{lang}") for lang in sorted(LANG_MARKERS)],
    )
    langs = sorted(LANG_MARKERS)
    best = F.greatest(*[F.col(f"h_{l}") for l in langs])
    pred = F.when(best == 0, F.lit("und"))
    for l in langs:
        pred = pred.when(F.col(f"h_{l}") == best, F.lit(l))
    return hits.select("doc_id", pred.alias("lang_pred"))


def quality_filter(docs: DataFrame, min_quality: float = 0.7, text_col: str = "text") -> DataFrame:
    """Documents passing the quality threshold (predicate pushes to scan)."""
    return docs.filter(quality_score(text_col) >= min_quality)


def fingerprint_dups(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """``(doc_id, canonical_id)`` via 64-bit content fingerprint grouping."""
    from pyspark.sql import Window

    w = Window.partitionBy(fingerprint(text_col))
    return docs.select(F.col(id_col).alias("doc_id"), F.min(id_col).over(w).alias("canonical_id"))


def winnow_fingerprints(
    docs: DataFrame, k: int = 5, w: int = 4,
    id_col: str = "doc_id", text_col: str = "text", hashed: bool = True,
) -> DataFrame:
    """Winnowing document fingerprints (the rolling-hash fingerprint family):
    per doc, take the character ``k``-gram sequence of the normalized text
    and keep the minimum gram of every sliding window of ``w`` consecutive
    grams, deduplicated — the classic winnowing guarantee (any shared
    substring of length >= k+w-1 yields a shared fingerprint).

    Returns ``(doc_id, fp)``, one row per selected fingerprint. ``hashed``
    emits compact ``xxhash64`` values (production); ``hashed=False`` emits
    the gram strings themselves (oracle-mirrorable — DuckDB lacks xxhash64).

    Plan shape: TWO projections — the gram array is materialized as a column
    before the window pass, so Catalyst computes each gram once. A single
    nested-transform projection re-expands the gram lambda per window index
    (the measured 100x trap documented for minhash signatures,
    BENCH/SCALING_NOTES.md §6). Everything is JVM array expressions: no
    UDFs, no shuffle before the final explode.
    """
    from ..functions.text import normalize_text

    nt = normalize_text(text_col)
    gi = F.sequence(F.lit(1), F.greatest(F.length(nt) - (k - 1), F.lit(1)))
    grams = F.transform(gi, lambda i: nt.substr(i, F.lit(k)))
    g = docs.select(F.col(id_col).alias("doc_id"), grams.alias("__grams"))
    wi = F.sequence(F.lit(1), F.greatest(F.size(F.col("__grams")) - (w - 1), F.lit(1)))
    mins = F.array_distinct(
        F.transform(wi, lambda j: F.array_min(F.slice(F.col("__grams"), j, w)))
    )
    out = g.select("doc_id", F.explode(mins).alias("fp"))
    if hashed:
        out = out.select("doc_id", F.xxhash64("fp").alias("fp"))
    return out


# PII patterns shared with the DuckDB oracle — keep to the regex subset both
# Java (Spark) and RE2 (DuckDB) interpret identically: character classes,
# non-capturing groups, bounded repetition, \b word boundaries.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\+?[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}",
    "ipv4": r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b",
}


def pii_scrub(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Redact PII spans (emails, phones, IPv4s) and count them per document.

    100-TB shape: one codegen'd scan projection — counts are
    ``regexp_extract_all`` sizes on the raw text, the scrubbed column is a
    chain of ``regexp_replace`` (applied in PII_PATTERNS order, so the
    placeholder of an earlier pattern is never re-matched by a later one).
    Zero UDFs, zero shuffles; predicates on the count columns push down to
    the scan. Pattern set is deliberately oracle-mirrorable.
    """
    out_cols = [F.col(id_col).alias("doc_id")]
    scrubbed = F.col(text_col)
    for name, pat in PII_PATTERNS.items():
        out_cols.append(
            F.size(F.regexp_extract_all(F.col(text_col), F.lit(pat), F.lit(0))).alias(f"n_{name}")
        )
        scrubbed = F.regexp_replace(scrubbed, pat, f"<{name}>")
    return docs.select(*out_cols, scrubbed.alias("scrubbed"))


def repetition_signals(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Gopher-style per-document repetition quality signals: documents
    dominated by a few repeated words/bigrams are low-quality training data
    (Rae et al. 2021, "Scaling Language Models" §A1.1 repetition filters —
    public methodology).

    Returns ``(doc_id, n_words, top_word_frac, top_bigram_frac,
    dup_word_frac)`` where top_*_frac is the count of the most frequent
    word/bigram over the total and dup_word_frac the fraction of word
    occurrences that are repeats.

    Scale shape: **zero shuffle and zero UDFs** — the most-frequent count is
    the longest equal-run of the *sorted* token array, computed with an
    ``aggregate`` lambda over ``array_sort`` entirely inside whole-stage
    codegen, so the operator is a single scan projection at any corpus size
    (the per-doc groupBy alternative would shuffle every token).
    """

    def _max_run(arr_col: str):
        # longest run of equal adjacent elements in a sorted array ==
        # max frequency of any element
        return F.expr(
            f"""aggregate(
                  array_sort({arr_col}),
                  struct(CAST('' AS STRING) AS prev, 0L AS run, 0L AS best),
                  (acc, x) -> struct(
                      x AS prev,
                      IF(x = acc.prev, acc.run + 1L, 1L) AS run,
                      GREATEST(acc.best, IF(x = acc.prev, acc.run + 1L, 1L)) AS best),
                  acc -> acc.best)"""
        )

    toks = F.split(F.col(text_col), " ")
    d = docs.select(
        F.col(id_col).alias("doc_id"),
        toks.alias("__t"),
        # NB sequence(1, 0) is DESCENDING [1, 0] in Spark, so short docs
        # need the explicit empty-array guard
        F.expr(
            f"IF(size(split({text_col}, ' ')) < 2, array(),"
            f" transform(sequence(1, size(split({text_col}, ' ')) - 1),"
            f" i -> concat(element_at(split({text_col}, ' '), i), ' ',"
            f" element_at(split({text_col}, ' '), i + 1))))"
        ).alias("__b"),
    )
    nw = F.size("__t")
    nb = F.size("__b")
    return d.select(
        "doc_id",
        nw.alias("n_words"),
        F.round(_max_run("__t") / nw, 6).alias("top_word_frac"),
        F.when(nb > 0, F.round(_max_run("__b") / nb, 6)).otherwise(F.lit(0.0)).alias("top_bigram_frac"),
        F.round(1.0 - F.size(F.array_distinct("__t")) / nw, 6).alias("dup_word_frac"),
    )


def top_ngrams(
    docs: DataFrame,
    n: int = 2,
    k: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus-wide top-k most frequent word n-grams ``(gram, cnt)`` with a
    deterministic tiebreak (count desc, gram asc) — the exact heavy-hitters
    baseline for vocabulary/boilerplate inspection.

    Scale shape: explode -> partial-aggregated groupBy(gram) ->
    TakeOrderedAndProject; the map-side combine collapses each partition's
    gram counts before the single shuffle, and top-k never global-sorts.
    """
    grams = F.expr(
        f"IF(size(split({text_col}, ' ')) < {n}, array(),"
        f" transform(sequence(1, size(split({text_col}, ' ')) - {n} + 1),"
        f" i -> array_join(slice(split({text_col}, ' '), i, {n}), ' ')))"
    )
    return (
        docs.select(F.explode(grams).alias("gram"))
        .groupBy("gram")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("gram").asc())
        .limit(k)
    )


def remove_frequent_segments(
    docs: DataFrame,
    min_docs: int,
    sep: str = "\n",
    min_chars: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """C4-style cross-document boilerplate removal: drop every segment
    (line, with the default separator) that occurs verbatim in at least
    ``min_docs`` DISTINCT documents; reassemble the survivors in original
    order. Returns ``(doc_id, text, n_removed)`` — every input doc survives
    (a fully-boilerplate doc comes back with text '').

    Segments shorter than ``min_chars`` are exempt from removal (the C4
    heuristic that spares short structural tokens).

    Scale shape: one posexplode -> one (segment) groupBy with map-side
    combine for the distinct-doc counts -> the frequent-segment set joined
    back on the segment key (data-dependent but far smaller than the
    corpus; AQE broadcasts it when it fits) -> one (doc) regroup that
    rebuilds the text with an ordered array aggregation. No UDFs, no
    driver-side collection of the segment dictionary.
    """
    import re

    if min_docs < 2:
        raise ValueError("min_docs must be >= 2 (1 would delete every segment)")
    pattern = re.escape(sep)
    segs = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.split(F.col(text_col), pattern)).alias("ord", "seg"),
    )
    frequent = (
        segs.filter(F.length("seg") >= min_chars)
        .groupBy("seg")
        .agg(F.count_distinct("doc_id").alias("ndocs"))
        .filter(F.col("ndocs") >= min_docs)
        .select("seg", F.lit(True).alias("rm"))
    )
    flagged = segs.join(frequent, on="seg", how="left").withColumn(
        "rm", F.coalesce(F.col("rm"), F.lit(False))
    )
    kept_struct = F.when(~F.col("rm"), F.struct("ord", "seg"))
    return flagged.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(kept_struct)), lambda s: s["seg"]
            ),
            sep,
        ).alias("text"),
        F.sum(F.col("rm").cast("long")).alias("n_removed"),
    )


def textrank_keywords(
    docs: DataFrame,
    k_iters: int = 4,
    text_col: str = "text",
) -> DataFrame:
    """TextRank keyword scores: damped PageRank over the word co-occurrence
    graph (Mihalcea & Tarau 2004, window = 2).

    The graph is built with pure JVM array expressions: adjacent-token
    pairs per document (one transform + explode), symmetrized, then ONE
    map-side-combined groupBy produces co-occurrence-count edge weights.
    Ranking reuses the engine's weighted PageRank kernel
    (algos/pagerank.py — the reference's rank-propagation core,
    pagerank.v:1045-1140, re-targeted at a word graph; vertex ids are
    strings here, the kernel is id-type-agnostic). Output is
    vocabulary-sized, so the scale cost is the token scan + the kernel's
    one edge shuffle; supersteps run over the (tiny) word graph.

    Returns (id string, rank double) — raw ranks; callers round.
    """
    from ..algos.pagerank import pagerank

    toks = docs.select(F.split(F.col(text_col), " ").alias("__ws")).where(
        F.size("__ws") >= 2
    )
    # adjacent pairs: struct(ws[i-1], ws[i]) for i in 1..size-1 (0-based [])
    pairs = (
        toks.select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(__ws) - 1),"
                    " i -> struct(__ws[i - 1] AS a, __ws[i] AS b))"
                )
            ).alias("__p")
        )
        .select("__p.a", "__p.b")
        .where((F.col("a") != F.col("b")) & (F.col("a") != "") & (F.col("b") != ""))
    )
    sym = pairs.unionByName(
        pairs.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    cooc = sym.groupBy(
        F.col("a").alias("src"), F.col("b").alias("dst")
    ).agg(F.count(F.lit(1)).cast("double").alias("weight"))
    res = pagerank(cooc, max_iters=k_iters, tol=0.0, weight_col="weight")
    return res.ranks


def readability(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-document Flesch reading-ease (Flesch 1948, public methodology)
    from three exact integer counts — the standard corpus-quality /
    audience screen in training-data prep:

    * ``n_words`` — runs of ASCII letters (``[A-Za-z]+``)
    * ``n_sentences`` — runs of terminators (``[.!?]+``), floored at 1
    * ``n_syllables`` — the classic proxy: vowel-group runs
      (``[aeiouy]+`` over the lowercased text; a vowel run never crosses
      a word boundary, so whole-text counting equals the per-word sum)

    ``flesch = 206.835 - 1.015*(W/S) - 84.6*(Y/W)`` with the constants as
    full-precision literals and the two divisions over exact BIGINTs —
    a fixed correctly-rounded sequence, micro-scaled once via
    floor(x*1e6 + 0.5) (can be negative for dense technical text — floor
    rounding is exact IEEE on both engines either way).

    Scale shape: ONE codegen'd projection over the corpus scan — zero
    shuffles, zero UDFs; documents with no letters are dropped (W = 0
    has no defined score).

    Returns ``(id_col, n_words, n_sentences, n_syllables, flesch_micro)``.
    """
    counted = docs.select(
        F.col(id_col),
        F.expr(f"CAST(size(regexp_extract_all({text_col}, '[A-Za-z]+', 0)) AS BIGINT)").alias(
            "n_words"
        ),
        F.expr(
            f"CAST(greatest(size(regexp_extract_all({text_col}, '[.!?]+', 0)), 1) AS BIGINT)"
        ).alias("n_sentences"),
        F.expr(
            f"CAST(size(regexp_extract_all(lower({text_col}), '[aeiouy]+', 0)) AS BIGINT)"
        ).alias("n_syllables"),
    ).where(F.col("n_words") > 0)
    score = F.expr(
        "206.835 - 1.015 * (CAST(n_words AS DOUBLE) / n_sentences)"
        " - 84.6 * (CAST(n_syllables AS DOUBLE) / n_words)"
    )
    return counted.select(
        id_col,
        "n_words",
        "n_sentences",
        "n_syllables",
        F.floor(score * F.lit(1_000_000) + F.lit(0.5)).cast("long").alias("flesch_micro"),
    )


def vocab_growth(
    docs: DataFrame,
    bucket_size: int = 25,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Vocabulary-growth (Heaps'-law) curve: for each bucket of
    ``bucket_size`` docs in ``id_col`` order, the running token count and
    running DISTINCT-vocabulary size at the bucket's end.

    The cumulative-distinct count — normally a re-scan per prefix — is one
    aggregation via the first-occurrence trick: a term enters the
    vocabulary exactly once, at MIN(doc_id); bucketing those entry points
    and prefix-summing per-bucket counts gives every prefix's vocabulary
    size in two shuffles, independent of the number of checkpoints. All
    exact BIGINT; both prefix sums run on the two-phase distributed
    cumsum (no global Window).
    """
    from .cumsum import distributed_cumsum

    tk = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
        ).alias("term"),
    ).where(F.col("term") != "")
    bucket = (F.col("doc_id") / bucket_size).cast("long")
    per_bucket_tokens = tk.groupBy(bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_tok")
    )
    firsts = tk.groupBy("term").agg(F.min("doc_id").alias("first_doc"))
    per_bucket_vocab = firsts.groupBy(
        (F.col("first_doc") / bucket_size).cast("long").alias("bucket")
    ).agg(F.count(F.lit(1)).alias("n_new"))
    both = per_bucket_tokens.join(per_bucket_vocab, "bucket", "full_outer").select(
        "bucket",
        F.coalesce("n_tok", F.lit(0)).alias("n_tok"),
        F.coalesce("n_new", F.lit(0)).alias("n_new"),
    )
    cum = distributed_cumsum(both, ["bucket"], "n_tok", "tokens_so_far")
    cum = distributed_cumsum(cum, ["bucket"], "n_new", "vocab_so_far")
    return cum.select(
        "bucket",
        ((F.col("bucket") + 1) * bucket_size).alias("docs_bound"),
        "tokens_so_far",
        "vocab_so_far",
    )


def rake_keywords(
    docs: DataFrame,
    stopwords: list[str] | None = None,
    k: int = 20,
    text_col: str = "text",
) -> DataFrame:
    """RAKE corpus keywords (Rose et al. 2010, "Automatic Keyword
    Extraction from Individual Documents" — public methodology): candidate
    phrases are maximal stopword-free runs; a word's score is
    degree/frequency (degree = summed length of phrase occurrences
    containing it); a phrase scores the sum of its words' scores.

    Distributed variant: statistics are corpus-level (the per-doc original
    is a trivial regrouping), phrases are aggregated as distinct strings
    with occurrence counts BEFORE word explosion — so the heavy explode
    runs over the distinct-phrase table, not the corpus. Word scores are
    emitted in exact integer micro-units (deg * 1e6 DIV freq, both
    positive, truncate == floor) and the phrase score is an integer sum —
    engine-exact. Returns the top ``k`` phrases by (score desc, phrase
    asc): ``(phrase, n_occ, n_words, score_micro)``.
    """
    sw = stopwords if stopwords is not None else list(STOPWORDS)
    pat = r"\b(" + "|".join(sw) + r")\b"
    repl = F.regexp_replace(F.lower(F.trim(F.col(text_col))), pat, "|")
    phrases = (
        docs.select(F.explode(F.split(repl, r"\|")).alias("__p"))
        .select(F.trim("__p").alias("phrase"))
        .where(F.col("phrase") != "")
    )
    occ = phrases.groupBy("phrase").agg(F.count(F.lit(1)).alias("n_occ"))
    occ = occ.withColumn("words", F.split("phrase", r"\s+")).withColumn(
        "n_words", F.size("words").cast("long")
    )
    pw = occ.select("phrase", "n_occ", "n_words", F.explode("words").alias("word"))
    wstats = pw.groupBy("word").agg(
        F.sum("n_occ").alias("freq"),
        F.sum(F.col("n_occ") * F.col("n_words")).alias("deg"),
    )
    wscore = wstats.select(
        "word", F.expr("deg * 1000000 DIV freq").alias("wscore_micro")
    )
    scored = (
        pw.join(wscore, "word")
        .groupBy("phrase", "n_occ", "n_words")
        .agg(F.sum("wscore_micro").alias("score_micro"))
    )
    return scored.orderBy(
        F.col("score_micro").desc(), F.col("phrase").asc()
    ).limit(int(k))


def lz78_complexity(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Token-level LZ78 phrase count per document — the compression-based
    redundancy signal (Ziv & Lempel 1978): highly templated/repetitive text
    parses into FEW phrases relative to its token count, natural prose into
    many. Corpus-prep filters use the ratio exactly like the Gopher
    repetition signals (repetition_signals above), but it catches
    long-range structure those per-n-gram ratios miss.

    The LZ78 parse is inherently sequential per document (the dictionary
    grows as the scan proceeds), so the shape mirrors operators/dtw.py: a
    per-row codegen'd ``aggregate`` fold, state = the phrase dictionary as
    an ``array<string>`` with slot 1 holding the in-progress phrase
    (constant-typed state keeps the fold replayable by DuckDB's
    ``list_reduce``, whose accumulator must match the element type).
    Membership is ``array_contains`` — O(phrases) per token, quadratic
    worst case per doc, bounded by document length (the sessionization
    bound; a book-length doc belongs in a chunker upstream). Zero
    shuffles: a pure per-row projection.

    Tokens are lowercase ``[a-z0-9]+`` runs joined with a unit separator
    inside phrases (prefix-ambiguity guard). ``ratio_micro = n_phrases *
    1e6 div n_tokens`` — exact integers end to end; a trailing in-progress
    phrase counts as one (standard convention).
    """
    toks = F.expr(f"regexp_extract_all(lower(coalesce({text_col}, '')), '[a-z0-9]+', 0)")
    # state[1] = current phrase ('' = none); state[2:] = dictionary
    fold = (
        "aggregate(__toks, array(''), (acc, t) -> "
        "CASE WHEN array_contains(slice(acc, 2, greatest(size(acc) - 1, 0)), "
        "concat(element_at(acc, 1), '\\u001f', t)) "
        "THEN concat(array(concat(element_at(acc, 1), '\\u001f', t)), "
        "slice(acc, 2, greatest(size(acc) - 1, 0))) "
        "ELSE concat(array(''), slice(acc, 2, greatest(size(acc) - 1, 0)), "
        "array(concat(element_at(acc, 1), '\\u001f', t))) END)"
    )
    counted = docs.select(F.col(id_col), toks.alias("__toks")).select(
        id_col,
        F.size("__toks").cast("long").alias("n_tokens"),
        F.expr(fold).alias("__st"),
    ).select(
        id_col,
        "n_tokens",
        (
            F.size("__st")
            - 1
            + F.when(F.element_at("__st", 1) != "", 1).otherwise(0)
        ).cast("long").alias("n_phrases"),
    )
    return counted.select(
        id_col,
        "n_tokens",
        "n_phrases",
        F.expr(
            "CASE WHEN n_tokens > 0 THEN (n_phrases * 1000000) div n_tokens END"
        ).alias("ratio_micro"),
    )

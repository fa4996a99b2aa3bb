"""Unigram-LM (SentencePiece-style) subword tokenizer: frequency-scored
piece vocabulary + exact Viterbi segmentation, fully relational.

The unigram language-model tokenizer (Kudo 2018, "Subword Regularization" —
public methodology) is the other major tokenizer family next to BPE
(operators/bpe.py): instead of learning merge rules, it scores a SUBWORD
VOCABULARY and segments every word into the maximum-likelihood sequence of
pieces via Viterbi DP. This module implements the deterministic core:

* :func:`unigram_vocab` — candidate pieces are all word substrings up to
  ``max_len`` chars, counted with word-frequency weights (every occurrence
  position counts); pieces below ``min_count`` are dropped EXCEPT single
  characters (the fallback alphabet that keeps every word segmentable —
  SentencePiece's required-character rule). Piece score is the unigram
  log-likelihood ``ln(count / total)`` nano-rounded ONCE per piece (the
  lm.py discipline — after this, everything downstream is exact integers).
  A full SentencePiece trainer iterates EM + prunes; this is the
  first/defining iteration of that loop with the e-step counts taken from
  raw occurrences, documented as such.

* :func:`unigram_segment` — per DISTINCT word (the corpus is scanned once;
  Heaps' law makes the vocabulary the small table, exactly the bpe.py
  trainer economics), Viterbi over character positions. The DP state for
  a position packs ``(path_score_nano, n_tokens, backpointer)`` into ONE
  BIGINT key — ``((s + 2^41) * 4096) + (63 - n_tokens) * 64 + (j + 1)`` —
  so "best" is a plain integer ``array_max`` (no struct folds, which are
  not cross-engine-safe accumulators) and the tiebreak is total and
  deterministic: max score, then fewer tokens, then the shortest last
  piece (the packed low bits hold the backpointer start ``j + 1``, and
  ``array_max`` prefers the LARGEST start, i.e. the shortest final piece). Both the forward DP and the backtrack are codegen'd ``aggregate``
  folds over the position sequence; no Python anywhere.

Scale notes (100-TB lens): one corpus scan builds the word vocabulary; the
candidate-piece explode and the DP run over DISTINCT words only; the piece
vocabulary joins back by piece (broadcastable — it is bounded by distinct
words x word length x max_len). Words are truncated to ``WORD_CAP`` chars
(junk tokens past that length carry no tokenizer signal) so the packed-key
bit budget is provably safe: |score| <= 48 tokens * ln(total) * 1e9 < 2^41
for any corpus below ~2^60 weighted pieces.

Reference parity: none (single-query reference); LLM-pipeline mandate
breadth — the tokenizer-training family (SURVEY.md §2-adjacent, next to
operators/bpe.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["unigram_vocab", "unigram_segment", "unigram_fertility", "unigram_em_round", "WORD_CAP"]

WORD_CAP = 48
_OFF = 1 << 41


def _words(docs: DataFrame, text_col: str) -> DataFrame:
    """``(w, cnt)`` distinct whitespace words (capped to WORD_CAP chars)
    with corpus counts — the one corpus-wide shuffle."""
    return (
        docs.select(F.explode(F.split(F.col(text_col), r"\s+")).alias("w0"))
        .select(F.substring(F.col("w0"), 1, WORD_CAP).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _pieces_expr(max_len: int) -> F.Column:
    """array<struct<j,l,piece>> — every substring start/length pair of w."""
    return F.expr(
        "flatten(transform(sequence(0, length(w) - 1),"
        f" j -> transform(sequence(1, least({int(max_len)}, length(w) - j)),"
        " l -> struct(j AS j, l AS l, substring(w, j + 1, l) AS piece))))"
    )


def unigram_vocab(
    docs: DataFrame,
    text_col: str = "text",
    max_len: int = 4,
    min_count: int = 2,
) -> DataFrame:
    """``(piece, cnt, score_nano)`` — the scored piece vocabulary.

    ``cnt`` = weighted occurrence count (word count x positions in word),
    exact BIGINT. ``score_nano`` = ``ROUND(ln(cnt / total) * 1e9)`` with
    ``total`` the sum over KEPT pieces — nano-rounded once, negative.
    """
    if max_len < 1:
        raise ValueError("max_len must be >= 1")
    words = _words(docs, text_col)
    occ = words.select("cnt", F.explode(_pieces_expr(max_len)).alias("p"))
    counts = occ.groupBy(F.col("p.piece").alias("piece")).agg(
        F.sum("cnt").alias("cnt")
    )
    # vocabulary-sized and referenced by both the total and the output —
    # truncate so the corpus-side explode runs ONCE (the psi/bins rule)
    kept = counts.filter(
        (F.length("piece") == 1) | (F.col("cnt") >= int(min_count))
    ).localCheckpoint()
    tot = kept.agg(F.sum("cnt").alias("total"))
    return kept.crossJoin(tot).select(
        "piece",
        "cnt",
        F.expr(
            "CAST(ROUND(LN(CAST(cnt AS DOUBLE) / CAST(total AS DOUBLE))"
            " * 1000000000.0) AS BIGINT)"
        ).alias("score_nano"),
    )


def unigram_segment(
    docs: DataFrame,
    text_col: str = "text",
    max_len: int = 4,
    min_count: int = 2,
) -> DataFrame:
    """``(w, cnt, n_tokens, score_nano, seg)`` — the Viterbi segmentation
    of every distinct corpus word under :func:`unigram_vocab`'s scores.

    ``seg`` joins the chosen pieces with spaces; ``score_nano`` is the
    exact integer path score; ties resolve to fewer tokens, then the
    shortest final piece (largest backpointer start under ``array_max``) (total order — both engines agree bit-for-bit
    because the whole DP is integer arithmetic on the packed keys).
    """
    vocab = unigram_vocab(docs, text_col, max_len, min_count)
    words = _words(docs, text_col)
    return _viterbi(words, vocab, max_len)


def _viterbi(words: DataFrame, vocab: DataFrame, max_len: int) -> DataFrame:
    """Shared Viterbi pass: segment every ``(w, cnt)`` word under a
    ``(piece, score_nano)`` vocabulary (packed-key DP + backtrack — see
    the module docstring). The vocabulary MUST contain every single
    character of every word (the fallback-alphabet contract)."""
    cand = (
        words.select("w", F.explode(_pieces_expr(max_len)).alias("p"))
        .join(vocab, F.col("p.piece") == vocab.piece)
        .select(
            "w",
            (F.col("p.j") + F.col("p.l")).cast("long").alias("i"),
            F.col("p.j").cast("long").alias("j"),
            F.col("score_nano").alias("sc"),
        )
    )
    per_word = (
        cand.groupBy("w")
        .agg(F.sort_array(F.collect_list(F.struct("i", "j", "sc"))).alias("cands"))
        .join(words, "w")
    )
    # forward DP over packed keys. key0 encodes (s=0, nt=0, pj=-1); a
    # candidate's key derives from its predecessor's key in closed form:
    #   s' + OFF   = (kj DIV 4096) + sc
    #   63 - nt'   = ((kj DIV 64) % 64) - 1
    key0 = _OFF * 4096 + 63 * 64
    best = F.expr(
        f"aggregate(sequence(1, length(w)), array(CAST({key0} AS BIGINT)),"
        " (acc, i) -> array_append(acc, array_max(transform("
        "   filter(cands, c -> c.i = i),"
        "   x -> (((element_at(acc, CAST(x.j AS INT) + 1) DIV 4096) + x.sc) * 4096)"
        "        + ((((element_at(acc, CAST(x.j AS INT) + 1) DIV 64) % 64) - 1) * 64)"
        "        + (x.j + 1)))))"
    )
    d1 = per_word.select("w", "cnt", best.alias("best"))
    d2 = d1.select(
        "w",
        "cnt",
        F.expr("transform(best, k -> k % 64 - 1)").alias("pjs"),
        F.expr("element_at(best, length(w) + 1)").alias("kn"),
    )
    # backtrack: slot 1 of the string accumulator is the current position
    # (the LZ78 in-progress-slot trick); tokens accumulate after it
    back = F.expr(
        "aggregate(sequence(1, length(w)), array(CAST(length(w) AS STRING)),"
        " (acc, step) -> IF(CAST(element_at(acc, 1) AS BIGINT) <= 0, acc,"
        "   concat("
        "     array(CAST(element_at(pjs, CAST(element_at(acc, 1) AS INT) + 1) AS STRING),"
        "           substring(w,"
        "             CAST(element_at(pjs, CAST(element_at(acc, 1) AS INT) + 1) AS INT) + 1,"
        "             CAST(element_at(acc, 1) AS INT)"
        "               - CAST(element_at(pjs, CAST(element_at(acc, 1) AS INT) + 1) AS INT))),"
        "     slice(acc, 2, size(acc) - 1))))"
    )
    d3 = d2.select("w", "cnt", "kn", back.alias("bk"))
    return d3.select(
        "w",
        "cnt",
        F.expr("63 - ((kn DIV 64) % 64)").cast("long").alias("n_tokens"),
        F.expr(f"(kn DIV 4096) - CAST({_OFF} AS BIGINT)").alias("score_nano"),
        F.expr("array_join(slice(bk, 2, size(bk) - 1), ' ')").alias("seg"),
    )


def unigram_fertility(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_len: int = 4,
    min_count: int = 2,
) -> DataFrame:
    """Per-document tokenizer fertility under the unigram segmentation:
    ``(doc_id, n_words, n_pieces, fert_micro)`` with ``fert_micro`` =
    pieces-per-word in exact micro-units (``n_pieces * 1e6 DIV n_words``)
    — the standard tokenizer-quality metric (how much a tokenizer inflates
    the corpus), and the APPLY step of the trainer: the corpus is exploded
    once and joined to the DISTINCT-WORD segmentation table by word
    (vocabulary-sized, broadcastable), so per-doc costs never re-run the
    DP. Documents with no words report the 0 sentinel row.
    """
    seg = unigram_segment(docs, text_col, max_len, min_count).select(
        "w", F.col("n_tokens").alias("__nt")
    )
    words = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.col(text_col), r"\s+")).alias("w0"),
    ).select("doc_id", F.substring(F.col("w0"), 1, WORD_CAP).alias("w")).filter(
        F.col("w") != ""
    )
    per_doc = (
        words.join(F.broadcast(seg), "w")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("__nt").alias("n_pieces"),
        )
    )
    all_docs = docs.select(F.col(id_col).alias("doc_id"))
    return all_docs.join(per_doc, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("n_words"), F.lit(0)).cast("long").alias("n_words"),
        F.coalesce(F.col("n_pieces"), F.lit(0)).cast("long").alias("n_pieces"),
        F.expr(
            "CASE WHEN n_words > 0 THEN n_pieces * 1000000 DIV n_words"
            " ELSE CAST(0 AS BIGINT) END"
        ).alias("fert_micro"),
    )


def unigram_em_round(
    docs: DataFrame,
    text_col: str = "text",
    max_len: int = 4,
    min_count: int = 2,
) -> DataFrame:
    """One hard-EM (Viterbi) re-estimation round of the unigram tokenizer
    — the iterate-and-prune step that upgrades :func:`unigram_segment`'s
    frequency-initialized model into a trained one (SentencePiece's EM
    loop with hard assignments; deterministic because the E-step IS the
    deterministic Viterbi pass):

    * E-step: segment every distinct word under the round-0 scores.
    * M-step: re-count pieces by their USE in those segmentations
      (weighted by word counts); multi-char pieces never used are PRUNED
      (count 0 drops them — the SentencePiece prune), while every
      single character keeps an add-1 floor so the fallback-alphabet
      invariant survives pruning.
    * Re-score ``ln(c / total)`` nano-rounded once, and re-segment.

    Returns the round-1 segmentation ``(w, cnt, n_tokens, score_nano,
    seg)`` — same shape as :func:`unigram_segment`, so the two rounds
    diff directly (fertility strictly improves or holds on every corpus
    where the raw substring counts over-weighted overlapping pieces).
    """
    words = _words(docs, text_col)
    seg0 = unigram_segment(docs, text_col, max_len, min_count)
    used = (
        seg0.select("cnt", F.explode(F.split(F.col("seg"), " ")).alias("piece"))
        .groupBy("piece")
        .agg(F.sum("cnt").alias("used"))
    )
    alphabet = (
        words.select(F.explode(_pieces_expr(1)).alias("p"))
        .select(F.col("p.piece").alias("piece"))
        .distinct()
    )
    vocab2 = (
        alphabet.withColumn("floor", F.lit(1))
        .join(used, "piece", "full")
        .select(
            "piece",
            (F.coalesce(F.col("used"), F.lit(0)) + F.coalesce(F.col("floor"), F.lit(0)))
            .cast("long")
            .alias("cnt"),
        )
        .filter(F.col("cnt") > 0)
    )
    tot = vocab2.agg(F.sum("cnt").alias("total"))
    scored = vocab2.crossJoin(tot).select(
        "piece",
        F.expr(
            "CAST(ROUND(LN(CAST(cnt AS DOUBLE) / CAST(total AS DOUBLE))"
            " * 1000000000.0) AS BIGINT)"
        ).alias("score_nano"),
    )
    return _viterbi(words, scored, max_len)

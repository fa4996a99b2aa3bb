"""Column-expression text metrics (JVM-side, whole-stage-codegen friendly).

Everything here is a pure ``pyspark.sql.functions`` composition — no UDFs —
so Catalyst folds these into the scan projection. Formulas are deliberately
simple and ANSI-SQL-expressible so DuckDB oracles can mirror them exactly.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it"]


def token_count(col: str | Column = "text") -> Column:
    """Whitespace token count (0 for empty/blank strings)."""
    c = F.col(col) if isinstance(col, str) else col
    trimmed = F.trim(c)
    return F.when(trimmed == "", F.lit(0)).otherwise(F.size(F.split(trimmed, r"\s+"))).cast("long")


# GPT-2-flavor pretokenizer classes: contractions, letter runs, digit runs,
# single non-alphanumeric symbols. Leftmost-first alternation — identical
# semantics in Java regex (Spark) and RE2 (DuckDB), so oracle-mirrorable.
BPE_TOKEN_RE = r"('s|'t|'re|'ve|'m|'ll|'d)|[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def bpe_token_count(col: str | Column = "text") -> Column:
    """BPE-ish subword-boundary token count (pretokenizer granularity).

    Counts matches of a GPT-2-style pretokenizer regex — the standard
    first stage of byte-pair tokenization. Whole-token estimate only (the
    merge table itself is model-specific); useful as the budget metric a
    training-data pipeline filters on.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(BPE_TOKEN_RE), F.lit(0))).cast("long")


def char_count(col: str | Column = "text") -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.length(c).cast("long")


def stopword_count(col: str | Column = "text") -> Column:
    """Count of stopword tokens (word-boundary regex, lowercase match)."""
    c = F.col(col) if isinstance(col, str) else col
    pattern = r"\b(" + "|".join(STOPWORDS) + r")\b"
    return F.size(F.regexp_extract_all(F.lower(c), F.lit(pattern), F.lit(0))).cast("long")


def stopword_ratio(col: str | Column = "text") -> Column:
    tc = token_count(col)
    return F.when(tc == 0, F.lit(0.0)).otherwise(stopword_count(col) / tc)


def mean_token_len(col: str | Column = "text") -> Column:
    """Mean token length = (chars excluding whitespace) / tokens."""
    c = F.col(col) if isinstance(col, str) else col
    tc = token_count(col)
    nonspace = F.length(F.regexp_replace(c, r"\s+", ""))
    return F.when(tc == 0, F.lit(0.0)).otherwise(nonspace / tc)


def quality_score(col: str | Column = "text") -> Column:
    """Heuristic [0,1] quality score: length band + stopword presence +
    token-length sanity. Deterministic, SQL-mirrorable."""
    tc = token_count(col)
    mtl = mean_token_len(col)
    sw = stopword_ratio(col)
    len_ok = F.when((tc >= 10) & (tc <= 100000), F.lit(0.4)).otherwise(F.lit(0.0))
    tok_ok = F.when((mtl >= 2.0) & (mtl <= 12.0), F.lit(0.3)).otherwise(F.lit(0.0))
    sw_ok = F.when((sw >= 0.0) & (sw <= 0.5), F.lit(0.3)).otherwise(F.lit(0.0))
    return (len_ok + tok_ok + sw_ok).alias("quality")


def normalize_text(col: str | Column = "text") -> Column:
    """Dedup normalization: lowercase, collapse whitespace, trim."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def fingerprint(col: str | Column = "text") -> Column:
    """64-bit document fingerprint: xxhash64 of the normalized text.

    (The rolling-hash flavor lives in operators/dedup.py simhash/minhash;
    this is the exact-content fingerprint.)
    """
    return F.xxhash64(normalize_text(col))

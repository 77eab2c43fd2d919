"""Text-analysis operators over the ``documents`` table: normalization,
language-ID heuristic, quality scoring, token counting, fingerprinting.

These are the corpus-hygiene operators a 100 TB training-data pipeline
needs in front of the extractor. All pure column expressions — they run
inside whole-stage codegen, shuffle only where an aggregation demands it,
and each has an exact DuckDB oracle (see ``__spark_entry__.oracle_sql``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# English function-word markers for the n-gram/stopword language heuristic.
# Deliberately tiny + fixed: the heuristic must be byte-reproducible in
# plain SQL on both engines (no model, no external data).
EN_MARKERS: tuple[str, ...] = ("the", "a", "of", "and")
STOPWORDS: tuple[str, ...] = ("the", "a", "of", "and", "in", "to", "is")


def norm_text(col: str | Column = "text") -> Column:
    """Whitespace-canonicalized text — mirror of the extractor's
    normalization (single-space runs, trimmed)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(c, r"\s+", " "))


def occurrences(text: Column, needle: str) -> Column:
    """Count of non-overlapping occurrences via the length/replace trick —
    chosen over regexp because it is exactly portable to the oracle SQL."""
    return (
        (F.length(text) - F.length(F.replace(text, F.lit(needle), F.lit(""))))
        / F.lit(len(needle))
    ).cast("long")


def token_count(text: Column) -> Column:
    """Whitespace token count of normalized text ('' -> 0)."""
    return F.when(F.length(text) == 0, F.lit(0).cast("long")).otherwise(
        F.size(F.split(text, " ")).cast("long")
    )


def stopword_hits(padded: Column) -> Column:
    """Total stopword occurrences in ' '||norm||' ' (padding makes the
    word-boundary matching exact at both ends)."""
    total = F.lit(0).cast("long")
    for w in STOPWORDS:
        total = total + occurrences(padded, f" {w} ")
    return total


def lang_guess(padded: Column, n_tokens: Column) -> Column:
    """Marker-ratio language guess: 'en' when English function words make
    up >= 4% of tokens, else 'und' (undetermined)."""
    hits = F.lit(0).cast("long")
    for w in EN_MARKERS:
        hits = hits + occurrences(padded, f" {w} ")
    ratio = F.when(n_tokens > 0, hits / n_tokens).otherwise(F.lit(0.0))
    return F.when(ratio >= 0.04, F.lit("en")).otherwise(F.lit("und"))


def with_text_features(docs: DataFrame) -> DataFrame:
    """documents → + (norm, n_tokens, n_stop, stop_ratio, guess_lang,
    quality_score, fingerprint).

    quality_score is a deterministic [0,1] heuristic: token-length band +
    stopword presence — the web-text analog of the reference's
    mean-confidence provenance (A6, ``tooling/average_confidence.py``).
    fingerprint is the content hash used for exact dedup (md5 of the
    normalized text).
    """
    norm = norm_text("text")
    padded = F.concat(F.lit(" "), norm, F.lit(" "))
    n_tokens = token_count(norm)
    n_stop = stopword_hits(padded)
    stop_ratio = F.round(
        F.when(n_tokens > 0, n_stop / n_tokens).otherwise(F.lit(0.0)), 6
    )
    len_score = F.when((n_tokens >= 20) & (n_tokens <= 1000), F.lit(1.0)) \
        .when(n_tokens >= 5, F.lit(0.5)).otherwise(F.lit(0.0))
    quality = F.round((len_score + F.least(stop_ratio * 4, F.lit(1.0))) / 2, 6)
    return (
        docs.withColumn("norm", norm)
        .withColumn("n_tokens", n_tokens)
        .withColumn("n_stop", n_stop)
        .withColumn("stop_ratio", stop_ratio)
        .withColumn("guess_lang", lang_guess(padded, n_tokens))
        .withColumn("quality_score", quality)
        .withColumn("fingerprint", F.md5(F.encode(norm, "UTF-8")))
    )

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


# word-or-punct token pattern for the BPE-ish count: alnum runs count as
# one token, every other non-space char as its own token — the same
# class-based regex evaluates identically under Java regex (Spark) and
# DuckDB's RE2, which keeps the oracle exact
TOKEN_REGEX = "[A-Za-z0-9]+|[^A-Za-z0-9 ]"


def token_count_regex(text: Column) -> Column:
    """Sub-word-ish token count: alnum runs + individual punctuation
    marks. A closer proxy for BPE token counts than whitespace splitting
    (punctuation tokenizes separately), still a pure codegen expression."""
    return F.regexp_count(text, F.lit(TOKEN_REGEX)).cast("long")


def winnow_fingerprint(norm: Column, k: int = 5, w: int = 4) -> Column:
    """Winnowing document fingerprint (Schleimer/Wilkerson/Aiken):
    hash every word ``k``-gram (rolling 60-bit md5-derived hash), take
    the minimum per sliding window of ``w`` consecutive hashes, and md5
    the sorted distinct selected values. Robust to local edits — two
    documents sharing long runs share most selected hashes — and fully
    plan-side: sequence/transform/slice/array_min run inside codegen,
    no explode, no shuffle, exact DuckDB mirror.
    """
    toks = F.split(norm, " ")
    n = F.size(toks)
    grams = F.transform(
        F.sequence(F.lit(1), n - (k - 1)),
        lambda i: F.conv(F.substring(
            F.md5(F.encode(F.array_join(F.slice(toks, i, k), " "),
                           "UTF-8")), 1, 15), 16, 10).cast("long"),
    )
    m = F.size(grams)
    mins = F.transform(
        F.sequence(F.lit(1), m - (w - 1)),
        lambda i: F.array_min(F.slice(grams, i, w)),
    )
    selected = F.array_sort(F.array_distinct(mins))
    fp = F.md5(F.encode(
        F.array_join(F.transform(selected, lambda x: x.cast("string")),
                     ","), "UTF-8"))
    # short docs: fewer than k+w-1 words -> fingerprint of the whole text
    return F.when(n >= k + w - 1, fp).otherwise(
        F.md5(F.encode(norm, "UTF-8")))


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

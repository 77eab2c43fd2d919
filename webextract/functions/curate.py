"""Composed corpus-curation pipeline: quality filter → exact dedup
(keep-first) → near-duplicate drop.

This is the end-to-end shape a training-data pipeline actually runs over
a crawl corpus, composed from the engine's primitives so every stage
keeps its at-scale properties:

1. **quality gate** — pure column expressions
   (:func:`webextract.functions.text.with_text_features`), pushed into
   the scan's whole-stage-codegen span; no shuffle.
2. **exact dedup, keep-first** — one hash aggregation on the content
   fingerprint (deterministic survivor = min id, the resume-safe rule of
   :func:`webextract.functions.dedup.exact_duplicates`).
3. **near-dup drop** — the composed MinHash→LSH→exact-Jaccard verify of
   :func:`webextract.functions.dedup.near_duplicate_docs` (shingle work
   proportional to candidates, not corpus); for every verified pair
   ``(a < b, jaccard >= t)`` the higher id is dropped — the greedy
   keep-lowest rule (pairwise, not transitive closure: a surviving doc
   is one that is not the *b* of any passing pair, which at web scale is
   the standard single-pass approximation and is fully SQL-expressible
   for the oracle).

The whole plan is built-in expressions + the documented LSH band join —
zero Python, one candidate-bounded shuffle chain — and has an exact
DuckDB oracle (``__spark_entry__.oracle_sql()['curated_docs']``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .dedup import near_duplicate_docs
from .text import with_text_features


def curate_corpus(docs: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text", min_quality: float = 0.3,
                  threshold: float = 0.8,
                  persist_survivors: bool = True) -> DataFrame:
    """corpus → surviving documents after quality + exact + near-dup.

    Returns (id, n_tokens, quality_score, fingerprint) for every
    surviving document. Deterministic: survivors depend only on content
    and ids, never on partitioning or execution order.

    ``persist_survivors`` materializes the exact-dedup survivor set,
    which the near-dup stage consumes THREE times (shingle derivation,
    pair verification, final anti-join) — without it the whole
    feature+dedup subtree recomputes per consumer (measured ~3x wall on
    the fused plan). Same session-cache contract as
    :func:`webextract.functions.dedup.lsh_candidate_pairs`: right for
    one-shot jobs; in long-lived sessions pass False and materialize the
    stage to a table instead (the at-scale shape — each curation stage
    is a stored checkpoint of a 10^12-doc run anyway).
    """
    feats = with_text_features(docs)
    passing = feats.filter(F.col("quality_score") >= min_quality)
    # exact dedup keep-first: the min id per fingerprint survives
    keep = passing.groupBy("fingerprint").agg(F.min(id_col).alias(id_col))
    exact_survivors = passing.join(
        keep.select(id_col), id_col, "left_semi")
    if persist_survivors:
        exact_survivors = exact_survivors.select(
            id_col, text_col, "n_tokens", "quality_score", "fingerprint"
        ).persist()
    # near-dup drop: higher id of every verified pair is removed
    pairs = near_duplicate_docs(
        exact_survivors.select(F.col(id_col), F.col(text_col)),
        id_col=id_col, text_col=text_col, threshold=threshold)
    drops = pairs.select(F.col("doc_b").alias(id_col)).distinct()
    survivors = exact_survivors.join(drops, id_col, "left_anti")
    return survivors.select(
        F.col(id_col), F.col("n_tokens"),
        F.col("quality_score"), F.col("fingerprint"))

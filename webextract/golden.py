"""Golden-table build + regression comparison — the recast of the
reference's dataset-build path (SURVEY.md §3.2: ``train.py`` →
``Preprocess.run`` encodes ground truth with the same §2.3 converters the
pipeline uses) and its XML-vs-XML corpus comparison
(``tooling/xml_comparison.py``).

Workflow: :func:`build_expected` pins the current extractor's output over
a regression corpus as the golden table; later code versions run
:func:`regression_report` against it — byte-identity per url plus span
agreement (exact and boundary-tolerant), so any semantic drift in the
extractor is visible as a table, not a diff in a test log.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .config import DEFAULT_CONFIG, ExtractConfig
from .evaluate import span_agreement
from .pipeline import PipelineOptions, extract_dataframe

GOLDEN_COLUMNS = ("url", "extracted_text", "spans", "line_spans")


def build_expected(spark: SparkSession, pages: DataFrame, path: str,
                   cfg: ExtractConfig = DEFAULT_CONFIG,
                   opts: PipelineOptions = PipelineOptions()) -> None:
    """Encode the golden `expected` table from a regression corpus."""
    extracted = extract_dataframe(pages, cfg, opts)
    extracted.select(*GOLDEN_COLUMNS).write.mode("overwrite").parquet(path)


def regression_report(spark: SparkSession, pages: DataFrame,
                      expected_path: str,
                      cfg: ExtractConfig = DEFAULT_CONFIG,
                      opts: PipelineOptions = PipelineOptions(),
                      boundary_tolerance: int = 0) -> DataFrame:
    """Current extraction vs golden table → per-url report.

    Columns: url, text_identical (byte-exact after UTF-8 encode),
    n_pred/n_gold/n_matched/exact_match (span agreement at the given
    boundary tolerance).
    """
    expected = spark.read.parquet(expected_path)
    current = extract_dataframe(pages, cfg, opts).select(*GOLDEN_COLUMNS)
    text_cmp = (
        current.select("url", F.encode("extracted_text", "UTF-8").alias("p"))
        .join(expected.select(
            "url", F.encode("extracted_text", "UTF-8").alias("g")), "url",
            "full")
        .select("url", (F.col("p") == F.col("g")).alias("text_identical"))
    )
    spans_cmp = span_agreement(current, expected,
                               boundary_tolerance=boundary_tolerance)
    joined = text_cmp.join(spans_cmp, "url", "full").na.fill(
        {"text_identical": False, "n_pred": 0, "n_gold": 0, "n_matched": 0})
    # recompute after the fill: a url with zero spans on BOTH sides (empty
    # page) is vacuously in agreement, but never appears in the exploded
    # span aggregations, so span_agreement's flag is null for it
    return joined.withColumn(
        "exact_match",
        (F.col("n_matched") == F.col("n_pred"))
        & (F.col("n_matched") == F.col("n_gold")),
    )


def regression_summary(report: DataFrame) -> dict:
    """Corpus-level pass rates (the byte-identical pass-rate metric of
    BASELINE.json)."""
    row = report.agg(
        F.count("*").alias("n_urls"),
        F.sum(F.when(F.col("text_identical"), 1).otherwise(0)).alias("n_text_ok"),
        F.sum(F.when(F.col("exact_match"), 1).otherwise(0)).alias("n_spans_ok"),
    ).collect()[0]
    n = row["n_urls"] or 1
    return {
        "n_urls": row["n_urls"],
        "text_identical_rate": row["n_text_ok"] / n,
        "span_exact_rate": row["n_spans_ok"] / n,
    }

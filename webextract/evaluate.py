"""Evaluation operators — the recast of the reference's metric stack:

- confusion-matrix accumulation (``evaluation/sem_seg_evaluation.py:96-135``,
  np.bincount over (pred, gt) pairs merged across ranks via all_gather) →
  one ``groupBy(pred, gt).count()`` — Catalyst plans the same partial +
  final two-phase hash aggregation automatically;
- mIoU / mACC / pACC from the matrix
  (``sem_seg_evaluation.py:172-212``) → DataFrame math over the counts;
- XML-vs-XML span agreement (``tooling/xml_comparison.py:45-80``) →
  extracted-vs-expected span join keyed on (url, span_id).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def confusion_matrix(pairs: DataFrame, pred_col: str = "pred",
                     gt_col: str = "gt") -> DataFrame:
    """(pred, gt) rows → (pred, gt, n) counts. A1 analog."""
    return (
        pairs.groupBy(F.col(pred_col).alias("pred"), F.col(gt_col).alias("gt"))
        .agg(F.count("*").alias("n"))
    )


def iou_metrics(cm: DataFrame) -> DataFrame:
    """Confusion counts → per-class (tp, fp, fn, iou, acc) + class label.

    iou_c = tp / (tp + fp + fn); acc_c = tp / (tp + fn) — the same
    definitions as the reference's mIoU/mACC (sem_seg_evaluation.py:172-212).
    """
    tp = cm.filter(F.col("pred") == F.col("gt")).select(
        F.col("gt").alias("cls"), F.col("n").alias("tp"))
    fp = cm.filter(F.col("pred") != F.col("gt")).groupBy(
        F.col("pred").alias("cls")).agg(F.sum("n").alias("fp"))
    fn = cm.filter(F.col("pred") != F.col("gt")).groupBy(
        F.col("gt").alias("cls")).agg(F.sum("n").alias("fn"))
    classes = cm.select(F.col("pred").alias("cls")).union(
        cm.select(F.col("gt").alias("cls"))).distinct()
    joined = (
        classes.join(tp, "cls", "left").join(fp, "cls", "left")
        .join(fn, "cls", "left").na.fill(0, ["tp", "fp", "fn"])
    )
    denom_iou = F.col("tp") + F.col("fp") + F.col("fn")
    denom_acc = F.col("tp") + F.col("fn")
    return joined.select(
        "cls", "tp", "fp", "fn",
        F.round(F.when(denom_iou > 0, F.col("tp") / denom_iou), 6).alias("iou"),
        F.round(F.when(denom_acc > 0, F.col("tp") / denom_acc), 6).alias("acc"),
    )


def summary_metrics(per_class: DataFrame) -> DataFrame:
    """per-class rows → (miou, macc, pacc) single row."""
    return per_class.agg(
        F.round(F.avg("iou"), 6).alias("miou"),
        F.round(F.avg("acc"), 6).alias("macc"),
        F.round(F.sum("tp") / (F.sum("tp") + F.sum("fn")), 6).alias("pacc"),
    )


def span_agreement(extracted: DataFrame, expected: DataFrame,
                   boundary_tolerance: int = 0) -> DataFrame:
    """Predicted vs golden spans → per-url match stats.

    Both inputs carry (url, spans). With ``boundary_tolerance=0``,
    deterministic span ids make this an exact set comparison: a span
    matches iff (span_id, char bounds, class) all agree — the span-level
    recast of the reference's IOUEvaluator XML comparison
    (``tooling/xml_comparison.py:45-80``). With ``boundary_tolerance=k``
    a span matches when the class agrees and both char bounds are within
    ±k — the off-by-k analog of the reference's boundary-IoU metric
    (``evaluation/sem_seg_evaluation.py:214-225``, mask-erode tolerance).
    """
    def flat(df: DataFrame, prefix: str) -> DataFrame:
        return df.select(
            "url", F.explode("spans").alias("s")
        ).select(
            "url",
            F.col("s.span_id").alias(f"{prefix}_id"),
            F.col("s.region_class").alias(f"{prefix}_class"),
            F.col("s.char_start").alias(f"{prefix}_start"),
            F.col("s.char_end").alias(f"{prefix}_end"),
        )

    pred = flat(extracted, "p")
    gold = flat(expected, "g")
    if boundary_tolerance <= 0:
        cond = (
            (pred.url == gold.url) & (pred.p_id == gold.g_id)
            & (pred.p_start == gold.g_start) & (pred.p_end == gold.g_end)
            & (pred.p_class == gold.g_class)
        )
    else:
        k = boundary_tolerance
        cond = (
            (pred.url == gold.url) & (pred.p_class == gold.g_class)
            & (F.abs(pred.p_start - gold.g_start) <= k)
            & (F.abs(pred.p_end - gold.g_end) <= k)
        )
    matched = pred.join(gold, cond, "inner") \
        .groupBy(pred.url.alias("url")).agg(F.count("*").alias("n_matched"))
    n_pred = pred.groupBy("url").agg(F.count("*").alias("n_pred"))
    n_gold = gold.groupBy("url").agg(F.count("*").alias("n_gold"))
    return (
        n_gold.join(n_pred, "url", "full")
        .join(matched, "url", "left")
        .na.fill(0, ["n_pred", "n_gold", "n_matched"])
        .withColumn(
            "exact_match",
            (F.col("n_matched") == F.col("n_pred"))
            & (F.col("n_matched") == F.col("n_gold")),
        )
    )

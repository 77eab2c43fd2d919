"""Batch-run counter summaries in Prometheus exposition format.

The serving path (:mod:`webextract.serve`) exposes live ``/metrics``
counters; batch runs instead append per-partition rows to the metrics
table (``pipeline.run_extraction``, ``METRICS_SCHEMA``). This module
closes the gap — the A7 analog for batch (reference:
``tooling/average_confidence.py`` publishes run-level aggregates the
same way): aggregate the metrics table to per-run counters and render
them with the SAME metric names the serving registry uses
(``webextract_*_total`` / ``webextract_latency_seconds_sum``,
``serve.py``), so one scrape config covers both surfaces.

Plan shape: one hash aggregation over the metrics table — a table with
one row per (run, partition), i.e. thousands of rows for a 100 TB run,
never the corpus. The render step collects the aggregated rows (one per
run) — a deliberate, documented 1-row-per-run driver collect, the same
contract as the pipeline's summary dict.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def run_counters(metrics: DataFrame, run_id: str | None = None) -> DataFrame:
    """Metrics table → one counter row per run.

    Returns (run_id, docs_total, errors_total, bytes_in_total,
    partitions_total, latency_seconds_sum) — the batch analogs of the
    serving registry's counters: a served ``/extract`` request processes
    one page, so ``docs_total`` is ``requests_total``'s batch twin and
    ``errors_total`` keeps its name and meaning exactly.
    """
    if run_id is not None:
        metrics = metrics.filter(F.col("run_id") == run_id)
    return (
        metrics.groupBy("run_id")
        .agg(
            F.sum("n_rows").alias("docs_total"),
            F.sum("n_failed").alias("errors_total"),
            F.sum("n_bytes_in").alias("bytes_in_total"),
            F.count("*").alias("partitions_total"),
            (F.sum("wall_ms") / F.lit(1000.0)).alias("latency_seconds_sum"),
        )
    )


_COUNTERS = (
    ("webextract_docs_total", "docs_total",
     "pages extracted (batch twin of webextract_requests_total)"),
    ("webextract_errors_total", "errors_total",
     "pages that extracted with a non-null error"),
    ("webextract_bytes_in_total", "bytes_in_total",
     "input payload bytes consumed"),
    ("webextract_partitions_total", "partitions_total",
     "sink partitions written"),
    ("webextract_latency_seconds_sum", "latency_seconds_sum",
     "summed per-page parse wall time"),
)


def prometheus_text(metrics: DataFrame, run_id: str | None = None) -> str:
    """Render per-run counters as Prometheus exposition text.

    One ``{run_id="..."}``-labeled sample per run per counter, plus an
    all-runs total under its own DISTINCT metric name
    (``…_all_runs_total`` / ``…_all_runs_sum``) — the shape a
    textfile-collector sidecar ships after a batch job. Mixing an
    unlabeled sample into the labeled series of one name is the known
    exposition antipattern that double-counts every run under
    ``sum(<name>)``; a separate name keeps both the per-run series and
    the precomputed total aggregation-safe. Per-run metric names match
    :mod:`webextract.serve`'s registry where the semantics match, so
    dashboards aggregate the two surfaces with one query.
    """
    rows = sorted(run_counters(metrics, run_id).collect(),
                  key=lambda r: r["run_id"])
    lines: list[str] = []
    for name, field, help_text in _COUNTERS:
        lines.append(f"# HELP {name} {help_text}")
        lines.append(f"# TYPE {name} counter")
        total = 0.0
        for r in rows:
            val = r[field] or 0
            total += val
            label = _escape_label(r["run_id"])
            lines.append(f'{name}{{run_id="{label}"}} {_num(val)}')
        stem, suffix = name.rsplit("_", 1)  # _total / _sum stays last
        all_name = f"{stem}_all_runs_{suffix}"
        lines.append(f"# HELP {all_name} {help_text} (all runs)")
        lines.append(f"# TYPE {all_name} counter")
        lines.append(f"{all_name} {_num(total)}")
    return "\n".join(lines) + "\n"


def _num(val) -> str:
    """Exposition-format number with NO precision loss: integral values
    render as exact integers ('%g' would round docs_total=12,345,678 to
    1.23457e+07 — silently wrong at real corpus scale), non-integral
    ones with repr's full round-trip precision."""
    f = float(val)
    return str(int(f)) if f.is_integer() else repr(f)


def _escape_label(value: str) -> str:
    """Prometheus label-value escaping (backslash, quote, newline) —
    run_id is caller-supplied free text and an unescaped quote would
    invalidate the whole exposition file."""
    return (str(value).replace("\\", "\\\\").replace('"', '\\"')
            .replace("\n", "\\n"))


def summarize_metrics(spark: SparkSession, metrics_path: str,
                      run_id: str | None = None) -> str:
    """Read the metrics table at ``metrics_path`` and render
    :func:`prometheus_text` — the post-run CLI/reporting hook."""
    return prometheus_text(spark.read.parquet(metrics_path), run_id)

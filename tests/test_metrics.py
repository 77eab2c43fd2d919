"""Batch metrics summary (A7 parity): the Prometheus text rendered from
the metrics table must reconcile exactly with the table's own
aggregates and with the committed sink."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from webextract.fixtures import pages_dataframe
from webextract.metrics import prometheus_text, run_counters, summarize_metrics
from webextract.pipeline import PipelineOptions, run_extraction


def _samples(text: str, name: str) -> dict[str | None, float]:
    """Prometheus samples for one metric: {run_id_label_or_None: value}."""
    out: dict[str | None, float] = {}
    for line in text.splitlines():
        if line.startswith("#") or not line.startswith(name):
            continue
        m = re.match(
            rf'^{name}(?:\{{run_id="([^"]*)"\}})? ([-0-9.e+]+)$', line)
        if m:
            out[m.group(1)] = float(m.group(2))
    return out


def test_metrics_summary_reconciles(spark, tmp_path):
    out_dir = str(tmp_path / "extracted")
    metrics_dir = str(tmp_path / "metrics")
    pages = pages_dataframe(spark, 60, num_partitions=3, giant_every=0)
    s1 = run_extraction(spark, pages.limit(40), out_dir, metrics_dir,
                        opts=PipelineOptions(num_partitions=3))
    s2 = run_extraction(spark, pages, out_dir, metrics_dir,
                        opts=PipelineOptions(num_partitions=3))

    metrics = spark.read.parquet(metrics_dir)
    text = prometheus_text(metrics)

    # exposition format: HELP/TYPE per counter, one labeled sample per
    # run; the all-runs total lives under its own DISTINCT metric name so
    # sum(webextract_docs_total) in PromQL never double-counts
    docs = _samples(text, "webextract_docs_total")
    assert set(docs) == {s1["run_id"], s2["run_id"]}
    assert docs[s1["run_id"]] == 40
    assert docs[s2["run_id"]] == 20
    docs_all = _samples(text, "webextract_docs_all_runs_total")
    assert docs_all == {None: 60}

    # counters reconcile with the table's own aggregation AND the sink
    agg = metrics.agg(
        F.sum("n_rows"), F.sum("n_failed"), F.sum("n_bytes_in"),
        F.count("*")).collect()[0]
    assert docs_all[None] == agg[0] == spark.read.parquet(out_dir).count()
    assert _samples(
        text, "webextract_errors_all_runs_total")[None] == agg[1]
    assert _samples(
        text, "webextract_bytes_in_all_runs_total")[None] == agg[2]
    assert _samples(
        text, "webextract_partitions_all_runs_total")[None] == agg[3]
    # serving-registry name parity: latency sum uses the shared name
    assert "webextract_latency_seconds_sum" in text
    assert "webextract_latency_seconds_all_runs_sum" in text

    # run-scoped summary matches the per-run labeled sample
    scoped = summarize_metrics(spark, metrics_dir, run_id=s1["run_id"])
    assert _samples(scoped, "webextract_docs_total")[s1["run_id"]] == 40
    assert _samples(
        scoped, "webextract_docs_all_runs_total")[None] == 40

    # the counter DataFrame itself: one row per run, correct totals
    rows = {r["run_id"]: r for r in run_counters(metrics).collect()}
    assert rows[s2["run_id"]]["docs_total"] == 20
    assert rows[s2["run_id"]]["errors_total"] == 0


def test_prometheus_rendering_exact_at_scale():
    # '%g'-style rendering would round 12,345,678 to 1.23457e+07 —
    # counters must render exactly at real corpus scale, and run_id is
    # free text that needs label escaping
    from webextract.metrics import _escape_label, _num

    assert _num(12_345_678) == "12345678"
    assert _num(10**14) == "100000000000000"
    assert _num(0) == "0"
    assert _num(1.5) == "1.5"
    assert float(_num(123456.789)) == 123456.789
    assert _escape_label('ab"c') == 'ab\\"c'
    assert _escape_label("a\\b\nc") == "a\\\\b\\nc"

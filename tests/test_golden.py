"""Golden-table regression harness tests (SURVEY.md §3.2 recast)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from webextract.config import ExtractConfig
from webextract.fixtures import gen_pages
from webextract.golden import (
    build_expected, regression_report, regression_summary,
)
from webextract.pipeline import PipelineOptions, ship_package
from webextract.schema import PAGES_SCHEMA

OPTS = PipelineOptions(num_partitions=2)


@pytest.fixture(scope="module")
def corpus(spark):
    ship_package(spark)
    df = spark.createDataFrame(gen_pages(50, giant_every=0), PAGES_SCHEMA)
    df.persist(); df.count()
    return df


def test_same_config_is_100_percent(spark, corpus, tmp_path):
    golden = str(tmp_path / "expected")
    build_expected(spark, corpus, golden, opts=OPTS)
    report = regression_report(spark, corpus, golden, opts=OPTS)
    s = regression_summary(report)
    assert s == {"n_urls": 50, "text_identical_rate": 1.0,
                 "span_exact_rate": 1.0}


def test_config_drift_is_detected(spark, corpus, tmp_path):
    golden = str(tmp_path / "expected")
    build_expected(spark, corpus, golden, opts=OPTS)
    drifted = ExtractConfig(min_region_size=40)  # drops short blocks
    report = regression_report(spark, corpus, golden, cfg=drifted, opts=OPTS)
    s = regression_summary(report)
    assert s["text_identical_rate"] < 1.0
    assert s["span_exact_rate"] < 1.0
    # and the report names the drifted urls
    bad = report.filter(~F.col("text_identical")).count()
    assert bad == round((1 - s["text_identical_rate"]) * 50)


def test_boundary_tolerance_forgives_small_shifts(spark, corpus, tmp_path):
    golden = str(tmp_path / "expected")
    build_expected(spark, corpus, golden, opts=OPTS)
    # min_region_size 3 -> 4 only drops blocks of exactly 3 normalized
    # chars; on this corpus text stays identical but span ids would shift
    # if any block were dropped. Use a tolerance run against a *clean*
    # golden to pin the tolerant-join path itself.
    report = regression_report(spark, corpus, golden, opts=OPTS,
                               boundary_tolerance=2)
    s = regression_summary(report)
    assert s["span_exact_rate"] == 1.0

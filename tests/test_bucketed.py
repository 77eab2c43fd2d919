"""Bucketed-sink tests: a join between two tables bucketed on the same
key must plan WITHOUT a shuffle exchange (the co-located-join story for
repeated analysis over the 100 TB output)."""

from __future__ import annotations

import io
import contextlib

from pyspark.sql import functions as F

from webextract.fixtures import pages_from_documents
from webextract.pipeline import (
    PipelineOptions, extract_dataframe, ship_package, write_bucketed,
)


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bucketed_join_is_shuffle_free(spark):
    import shutil
    from pathlib import Path

    ship_package(spark)
    for name in ("extracted_b", "pages_b"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        loc = Path(spark.conf.get("spark.sql.warehouse.dir")
                   .removeprefix("file:")) / name
        shutil.rmtree(loc, ignore_errors=True)
    pages = pages_from_documents(spark, "/root/testdata/sf0.001")
    extracted = extract_dataframe(
        pages, opts=PipelineOptions(num_partitions=4))
    write_bucketed(extracted.select("url", "extracted_text", "n_spans"),
                   "extracted_b", n_buckets=8)
    write_bucketed(pages.select("url", "lang"), "pages_b", n_buckets=8)

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        a = spark.table("extracted_b")
        b = spark.table("pages_b")
        joined = a.join(b, "url").groupBy("lang").agg(
            F.sum("n_spans").alias("total_spans"))
        plan = _plan(joined)
        # co-located: the join reads both bucketed tables with NO Exchange
        # before the SortMergeJoin
        join_section = plan.split("SortMergeJoin")[0]
        assert "Exchange hashpartitioning(url" not in join_section, plan
        assert "SortMergeJoin" in plan, plan
        # and it computes the right thing
        rows = {r["lang"]: r["total_spans"] for r in joined.collect()}
        assert sum(rows.values()) == 500  # one span per wrapped doc
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

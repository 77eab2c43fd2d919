"""Span debug rendering (reference tooling/visualization.py analog):
one url's extracted row → annotated HTML with region spans and text
lines overlaid. Driver-side fixture tooling — these tests pin the HTML
structure against a real extraction so the overlay always reflects the
live span contract."""

from __future__ import annotations

import pytest

from webextract.render import render_from_sink, render_spans_html, render_url


def _one_extracted_row(spark):
    from pyspark.sql import Row

    from webextract.pipeline import extract_dataframe
    from webextract.pipeline import PipelineOptions, ship_package
    from webextract.schema import PAGES_SCHEMA

    ship_package(spark)
    html = (b"<html><body><h1>Title Here</h1>"
            b"<p>First paragraph with enough words to keep. "
            b"It has two sentences in it.</p>"
            b"<p>Second kept paragraph &amp; an <escaped> char test.</p>"
            b"</body></html>")
    pages = spark.createDataFrame(
        [Row(url="u://render", warc_ts=None, html=html, text=None,
             lang=None)], PAGES_SCHEMA)
    return extract_dataframe(
        pages, opts=PipelineOptions(num_partitions=1)).collect()[0]


def test_render_structure_matches_span_contract(spark):
    r = _one_extracted_row(spark)
    assert r["n_spans"] >= 2 and r["error"] is None
    page = render_spans_html(
        r["url"], r["extracted_text"], r["spans"],
        line_spans=r["line_spans"],
        meta={"content_kind": r["content_kind"], "n_spans": r["n_spans"]})
    # one region element per span, each carrying its identity tooltip
    assert page.count('<span class="region"') == len(r["spans"])
    for s in r["spans"]:
        assert s["span_id"] in page
        assert f"order={s['reading_order']}" in page
    # one underlined segment per text line, nested inside regions
    assert page.count('<span class="line"') == len(r["line_spans"])
    # the FULL extracted text survives, HTML-escaped, in document order
    import html as _h
    import re

    body = page.split("<pre", 1)[1]
    flat = _h.unescape(re.sub(r"<[^>]+>", "", body.split(">", 1)[1]
                              .rsplit("</pre>", 1)[0]))
    assert flat == r["extracted_text"]
    # escaping: the literal ampersand from &amp; renders as &amp; again
    assert "&amp;" in page
    # metadata table rows present
    assert "content_kind" in page and "n_spans" in page


def test_render_url_and_sink_roundtrip(spark, tmp_path):
    from pyspark.sql import Row

    from webextract.fixtures import pages_dataframe
    from webextract.pipeline import PipelineOptions, run_extraction

    out = str(tmp_path / "out")
    pages = pages_dataframe(spark, 8, num_partitions=1, giant_every=0)
    run_extraction(spark, pages, out,
                   opts=PipelineOptions(num_partitions=1))
    url = pages.select("url").first()["url"]
    page = render_from_sink(spark, out, url)
    assert page.startswith("<!DOCTYPE html>")
    assert url in page
    # unknown url: a clear KeyError, not an empty page
    with pytest.raises(KeyError, match="url not found"):
        render_url(spark.read.parquet(out), "u://missing")
    # missing sink: a clear FileNotFoundError
    with pytest.raises(FileNotFoundError):
        render_from_sink(spark, str(tmp_path / "nope"), url)


def test_render_cli_writes_file(spark, tmp_path):
    # drive the actual CLI entry (same-process main(argv)): render one
    # url from a real sink to an HTML file
    from webextract.__main__ import main
    from webextract.fixtures import pages_dataframe
    from webextract.pipeline import PipelineOptions, run_extraction

    out = str(tmp_path / "out")
    pages = pages_dataframe(spark, 4, num_partitions=1, giant_every=0)
    run_extraction(spark, pages, out,
                   opts=PipelineOptions(num_partitions=1))
    url = pages.select("url").first()["url"]
    target = str(tmp_path / "page.html")
    rc = main(["render", "--input", out, "--url", url,
               "--output", target])
    assert rc == 0
    with open(target, encoding="utf-8") as fh:
        page = fh.read()
    assert page.startswith("<!DOCTYPE html>") and url in page

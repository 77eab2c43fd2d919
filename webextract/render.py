"""Span debug rendering: one url's extracted text with its typed layout
spans overlaid as annotated HTML.

The web-text analog of the reference's prediction-overlay tooling
(``tooling/visualization.py`` draws region/baseline masks over the page
image with a per-class palette; ``tooling/xml_viewer.py`` renders the
PAGE-XML regions for inspection). Here the region spans wrap the
extracted text in colored, titled blocks and the text-line sub-spans
(the baseline analog) are drawn as underlined segments inside their
parent region.

Fixture-inspection tooling, DRIVER-SIDE BY DESIGN: it renders exactly
one url — a single collected row — and must never sit on a corpus hot
path. The corpus-scale surfaces for the same data are the ``spans`` /
``block_scores`` columns themselves.
"""

from __future__ import annotations

import html as _html

from pyspark.sql import DataFrame, SparkSession, functions as F

# fixed per-class palette (stable across runs; unknown classes get the
# fallback) — the analog of the reference's metadata_from_classes colors
_CLASS_COLORS = {
    "paragraph": "#cfe8ff",
    "header": "#ffd9a8",
    "marginalia": "#e2d5f8",
}
_FALLBACK_COLOR = "#e8e8e8"

_PAGE_CSS = """
body { font-family: monospace; margin: 1.5em; max-width: 72em; }
h1 { font-size: 1.1em; } table { border-collapse: collapse; }
td, th { border: 1px solid #999; padding: 2px 8px; font-size: 0.9em; }
.region { padding: 1px 2px; border-radius: 3px; }
.line { text-decoration: underline dotted; }
.legend span { padding: 0 6px; margin-right: 6px; }
"""


def render_spans_html(url: str, text: str, spans, line_spans=None,
                      meta: dict | None = None) -> str:
    """(url, extracted_text, spans[, line_spans]) → standalone HTML.

    Each region span becomes a colored ``<span class="region">`` with
    the span's identity in the tooltip (id, class, type, reading order,
    confidence, char range); line sub-spans are underlined segments
    inside their parent. Gaps between spans (dropped boilerplate never
    appears in extracted_text, but defensive all the same) render
    unstyled. All text is HTML-escaped.
    """
    spans = sorted(spans or [], key=lambda s: (s["char_start"],
                                               s["char_end"]))
    by_parent: dict[str, list] = {}
    for ls in line_spans or []:
        by_parent.setdefault(ls["parent_span_id"], []).append(ls)

    def esc(s: str) -> str:
        return _html.escape(s, quote=True)

    parts: list[str] = []
    pos = 0
    for s in spans:
        a, b = int(s["char_start"]), int(s["char_end"])
        if a > pos:
            parts.append(esc(text[pos:a]))
        color = _CLASS_COLORS.get(s["region_class"], _FALLBACK_COLOR)
        title = (f"{s['span_id']} {s['region_class']}/{s['region_type']} "
                 f"order={s['reading_order']} conf={s['confidence']:.3f} "
                 f"[{a},{b})")
        body = text[a:b]
        lines = sorted(by_parent.get(s["span_id"], []),
                       key=lambda x: x["line_order"])
        if lines:
            seg, p = [], a
            for ln in lines:
                la, lb = int(ln["char_start"]), int(ln["char_end"])
                if la > p:
                    seg.append(esc(text[p:la]))
                seg.append(f'<span class="line" title="{esc(ln["line_id"])}'
                           f' [{la},{lb})">{esc(text[la:lb])}</span>')
                p = lb
            if p < b:
                seg.append(esc(text[p:b]))
            inner = "".join(seg)
        else:
            inner = esc(body)
        parts.append(f'<span class="region" style="background:{color}" '
                     f'title="{esc(title)}">{inner}</span>')
        pos = max(pos, b)
    if pos < len(text):
        parts.append(esc(text[pos:]))

    meta = meta or {}
    meta_rows = "".join(
        f"<tr><th>{esc(str(k))}</th><td>{esc(str(v))}</td></tr>"
        for k, v in meta.items())
    legend = "".join(
        f'<span style="background:{c}">{esc(cls)}</span>'
        for cls, c in _CLASS_COLORS.items())
    return (
        "<!DOCTYPE html><html><head><meta charset=\"utf-8\">"
        f"<title>{esc(url)}</title><style>{_PAGE_CSS}</style></head><body>"
        f"<h1>{esc(url)}</h1>"
        f"<table>{meta_rows}</table>"
        f'<p class="legend">{legend}'
        f'<span style="background:{_FALLBACK_COLOR}">other</span> '
        "(dotted underline = text line)</p>"
        f"<pre style=\"white-space:pre-wrap\">{''.join(parts)}</pre>"
        "</body></html>"
    )


def render_url(extracted: DataFrame, url: str) -> str:
    """One url's sink row → annotated HTML (pushdown filter, ONE
    collected row — the documented driver-side exception)."""
    rows = extracted.filter(F.col("url") == url).limit(1).collect()
    if not rows:
        raise KeyError(f"url not found in sink: {url!r}")
    r = rows[0]
    meta = {k: r[k] for k in ("content_kind", "n_spans", "mean_confidence",
                              "error", "run_id") if k in r.__fields__}
    return render_spans_html(
        r["url"], r["extracted_text"] or "", r["spans"],
        line_spans=r["line_spans"] if "line_spans" in r.__fields__ else None,
        meta=meta)


def render_from_sink(spark: SparkSession, sink: str, url: str) -> str:
    """Read the extraction sink (path or catalog table) and render one
    url — the ``webextract render`` CLI body."""
    from .pipeline import PipelineOptions, read_sink

    is_table = False
    try:
        is_table = spark.catalog.tableExists(sink)
    except Exception:
        pass  # not a valid table identifier (e.g. a filesystem path)
    df = read_sink(spark, sink, PipelineOptions(sink_is_table=is_table))
    if df is None:
        raise FileNotFoundError(f"no extraction sink at {sink!r}")
    return render_url(df, url)

"""Regression tests for the pure HTML extractor — the recast of the
reference's golden-output unit tests (``test/test_output_page_xml.py:16-289``,
which assert exact coordinate strings on synthetic inputs; here we assert
byte-identical extracted text and exact span tuples)."""

from __future__ import annotations

import hashlib

import pytest
from hypothesis import given, settings, strategies as st

from webextract.config import ExtractConfig, REGION_TYPES
from webextract.fixtures import render_page
from webextract.html_extract import decode_payload, extract_html
from webextract.pdf_extract import is_pdf, extract_pdf


def _run(payload: bytes, url: str = "u", cfg: ExtractConfig = ExtractConfig()):
    return extract_html(url, payload, cfg)


# ---------------------------------------------------------------------------
# golden byte-identical cases (FIXTURES.md templates 1-6, 8)
# ---------------------------------------------------------------------------

def test_plain_article_golden():
    r = _run(b"<html><body><h1>Big Title</h1><p>one para here</p>"
             b"<p>second para here</p></body></html>")
    assert r.text.encode("utf-8") == b"Big Title\none para here\nsecond para here"
    assert [(s.region_class, s.char_start, s.char_end, s.reading_order)
            for s in r.spans] == [("header", 0, 9, 0), ("paragraph", 10, 40, 1)]
    # merged adjacent paragraphs form ONE span (P4 connected-components analog)
    assert len(r.spans) == 2


def test_span_ids_deterministic_content_derived():
    r = _run(b"<p>hello world text</p>", url="https://a.test/1")
    expected = hashlib.sha256(b"https://a.test/1|paragraph|0").hexdigest()
    assert r.spans[0].span_id == expected


def test_boilerplate_nav_footer_background():
    r = _run(
        b'<html><body><nav><ul><li><a href="/a">home</a></li>'
        b'<li><a href="/b">about</a></li></ul></nav>'
        b"<article><p>real content paragraph</p></article>"
        b'<footer><p><a href="/c">x</a><a href="/d">y</a></p></footer>'
        b"</body></html>"
    )
    assert r.text == "real content paragraph"
    assert [s.region_class for s in r.spans] == ["paragraph"]


def test_marginalia_kept_when_texty():
    r = _run(b"<aside><p>a genuine margin note with real text</p></aside>"
             b"<p>main body text</p>")
    assert [s.region_class for s in r.spans] == ["marginalia", "paragraph"]
    assert r.text == "a genuine margin note with real text\nmain body text"


def test_merge_alias_title_to_header():
    cfg = ExtractConfig(merge_aliases={"title": "header"})
    r = _run(b"<html><title>My Page</title><body><p>body text here</p>"
             b"</body></html>", cfg=cfg)
    assert [s.region_class for s in r.spans] == ["header", "paragraph"]
    # without the alias it stays `title`
    r2 = _run(b"<html><title>My Page</title><body><p>body text here</p>"
              b"</body></html>")
    assert [s.region_class for s in r2.spans] == ["title", "paragraph"]


def test_merge_alias_validation():
    with pytest.raises(ValueError):
        ExtractConfig(merge_aliases={"nosuch": "header"})
    with pytest.raises(ValueError):
        ExtractConfig(merge_aliases={"title": "header", "header": "title"})


def test_vocabulary_classes():
    r = _run(
        b"<body><ul><li>first item text</li><li>second item text</li></ul>"
        b"<table><tr><td>cell one text</td><td>cell two text</td></tr></table>"
        b"<pre>code block text</pre>"
        b"<blockquote>quoted passage text</blockquote>"
        b"<figure><figcaption>caption text here</figcaption></figure></body>"
    )
    assert [s.region_class for s in r.spans] == [
        "list_item", "table_cell", "code", "blockquote", "caption"]
    assert [s.region_type for s in r.spans] == [
        "ListItem", "TableCell", "Code", "Quote", "Caption"]
    # adjacent same-class blocks merged with \n inside the span
    assert r.text.split("\n")[0] == "first item text"
    li = r.spans[0]
    assert r.text[li.char_start:li.char_end] == "first item text\nsecond item text"


def test_min_region_size_filter():
    r = _run(b"<p>a long enough paragraph</p><p>ab</p><p>another real one</p>")
    # 2-char block dropped (MIN_REGION_SIZE analog, output_page_xml.py:364-367)
    assert r.text == "a long enough paragraph\nanother real one"
    assert len(r.spans) == 1  # both paragraphs merge into one run


def test_pathological_inputs_total():
    assert _run(b"").text == ""
    assert _run(b"<!-- only a comment -->").spans == ()
    assert _run(b"<![CDATA[ raw ]]>").text == ""
    r = _run(b"<div><div><div><p>deeply nested body text</p>")  # unclosed
    assert r.text == "deeply nested body text"
    r = _run(b"<p>&amp; &#65; &lt;tag&gt; entity soup text</p>")
    assert r.text == "& A <tag> entity soup text"


def test_script_style_head_skipped():
    r = _run(b"<head><title>skipme</title><style>p{}</style></head>"
             b"<body><script>var x='<p>no</p>';</script>"
             b"<p>visible body text</p></body>")
    assert r.text == "visible body text"


def test_textarea_rawtext_does_not_leak():
    # a literal "</script>" inside <textarea> must not end the skip
    # region: only the innermost OPEN skip tag's closer counts
    r = _run(b"<body><textarea>var x = '</script>'; leaked?</textarea>"
             b"<p>real body text</p></body>")
    assert r.text == "real body text"
    # nested skip tags closed out of order unwind tolerantly
    r = _run(b"<body><noscript><select><option>o</option></noscript>"
             b"<p>after text</p></body>")
    assert r.text == "after text"
    # a stray closer of a never-opened skip tag is ignored entirely
    r = _run(b"<body></textarea><p>normal body text</p></body>")
    assert r.text == "normal body text"


def test_whitespace_normalization_and_offsets():
    r = _run(b"<p>  lots   of\n\t spacing   here  </p><h2> a   header </h2>")
    assert r.text == "lots of spacing here\na header"
    for s in r.spans:
        assert r.text[s.char_start:s.char_end] == \
            ("lots of spacing here" if s.region_class == "paragraph" else "a header")


def test_encoding_declared_latin1_and_fallback():
    body = "<html><head><meta charset=\"iso-8859-1\"></head><body><p>caf\xe9 \xfcber text</p></body></html>"
    r = _run(body.encode("latin-1"))
    assert r.text == "café über text"
    r2 = _run("<p>caf\xe9 undeclared text</p>".encode("latin-1"))
    assert r2.text == "café undeclared text"
    r3 = _run("﻿<p>bom utf8 text</p>".encode("utf-8"))
    assert r3.text == "bom utf8 text"


def test_drop_marginalia_config():
    cfg = ExtractConfig(drop_marginalia=True)
    r = _run(b"<aside><p>margin note text</p></aside><p>main text body</p>",
             cfg=cfg)
    assert [s.region_class for s in r.spans] == ["paragraph"]


# ---------------------------------------------------------------------------
# invariants (FIXTURES.md §2) — over the whole fixture template sweep and
# hypothesis-generated byte soup
# ---------------------------------------------------------------------------

def _assert_invariants(r):
    prev_end = -1
    for i, s in enumerate(r.spans):
        assert 0 <= s.char_start < s.char_end <= len(r.text)
        assert s.char_start > prev_end
        prev_end = s.char_end
        assert s.reading_order == i
        assert s.region_type == REGION_TYPES[s.region_class]
        assert 0.0 <= s.confidence <= 1.0
    assert r.text == "\n".join(
        r.text[s.char_start:s.char_end] for s in r.spans)


def test_invariants_over_fixture_sweep():
    for i in range(60):
        row = render_page(i, giant_every=30, giant_repeat=50)
        fn = extract_pdf if is_pdf(row["html"]) else extract_html
        _assert_invariants(fn(row["url"], row["html"]))


def test_extraction_is_deterministic():
    for i in range(30):
        row = render_page(i, giant_every=0)
        fn = extract_pdf if is_pdf(row["html"]) else extract_html
        a, b = fn(row["url"], row["html"]), fn(row["url"], row["html"])
        assert a == b


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=2048))
def test_total_on_arbitrary_bytes(payload):
    r = extract_html("u", payload)
    _assert_invariants(r)


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=1024))
def test_total_on_arbitrary_text(txt):
    r = extract_html("u", txt.encode("utf-8", errors="replace"))
    _assert_invariants(r)


def test_decode_payload_total():
    for payload in (b"", b"\xff\xfe\x00", b"\x80\x81", "ok".encode("utf-16")):
        assert isinstance(decode_payload(payload), str)


# ---------------------------------------------------------------------------
# line-level sub-spans (P7/P8 analog)
# ---------------------------------------------------------------------------

def test_line_spans_golden():
    r = _run(b"<h1>Big Title</h1><p>first para text</p><p>second para text</p>")
    # header span: 1 line; merged paragraph span: 2 lines
    assert [(ls.line_order,) for ls in r.line_spans] == [(0,), (0,), (1,)]
    para = r.spans[1]
    para_lines = [ls for ls in r.line_spans
                  if ls.parent_span_id == para.span_id]
    assert [r.text[ls.char_start:ls.char_end] for ls in para_lines] == [
        "first para text", "second para text"]
    # lines tile their parent span exactly (one \n between lines)
    assert para_lines[0].char_start == para.char_start
    assert para_lines[-1].char_end == para.char_end


def test_line_spans_invariants_and_config_off():
    for i in range(40):
        row = render_page(i, giant_every=20, giant_repeat=50)
        fn = extract_pdf if is_pdf(row["html"]) else extract_html
        r = fn(row["url"], row["html"])
        by_span = {s.span_id: s for s in r.spans}
        seen_parent_orders: dict[str, int] = {}
        for ls in r.line_spans:
            parent = by_span[ls.parent_span_id]
            assert parent.char_start <= ls.char_start < ls.char_end \
                <= parent.char_end
            assert ls.line_order == seen_parent_orders.get(
                ls.parent_span_id, -1) + 1
            seen_parent_orders[ls.parent_span_id] = ls.line_order
    cfg = ExtractConfig(emit_line_spans=False)
    assert _run(b"<p>some text here</p>", cfg=cfg).line_spans == ()

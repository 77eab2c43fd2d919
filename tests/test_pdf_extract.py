"""PDF branch tests (north star: "PDF layout parsing into region classes")."""

from __future__ import annotations

from webextract.config import ExtractConfig
from webextract.fixtures import make_pdf
from webextract.pdf_extract import extract_pdf, is_pdf, _unescape_pdf_string


def test_is_pdf_sniff():
    assert is_pdf(b"%PDF-1.4\n...")
    assert is_pdf(b"  \n%PDF-1.7")
    assert not is_pdf(b"<html>")
    assert not is_pdf(b"")


def test_pdf_golden():
    pdf = make_pdf("A Title Here", ["first paragraph text", "second one here"])
    r = extract_pdf("u", pdf)
    assert r.text == "A Title Here\nfirst paragraph text\nsecond one here"
    assert [(s.region_class, s.reading_order) for s in r.spans] == [
        ("header", 0), ("paragraph", 1)]


def test_pdf_tj_array_and_escapes():
    stream = (b"BT /F1 11 Tf 0 0 Td [(Hel) -20 (lo \\(quoted\\))] TJ ET\n"
              b"BT /F1 16 Tf 0 0 Td (Octal \\101 ok) Tj ET")
    pdf = (b"%PDF-1.4\nstream\n" + stream + b"\nendstream\n")
    r = extract_pdf("u", pdf)
    assert r.text == "Hello (quoted)\nOctal A ok"
    assert [s.region_class for s in r.spans] == ["paragraph", "header"]


def test_pdf_min_size_filter():
    pdf = (b"%PDF-1.4\nstream\nBT /F1 11 Tf 0 0 Td (ab) Tj ET\n"
           b"BT (long enough text) Tj ET\nendstream\n")
    r = extract_pdf("u", pdf)
    assert r.text == "long enough text"


def test_pdf_merge_alias():
    pdf = make_pdf("Title Text Here", ["body text here"])
    cfg = ExtractConfig(merge_aliases={"header": "paragraph"})
    r = extract_pdf("u", pdf, cfg)
    # header folded into paragraph -> single merged run (P4 + P11 compose)
    assert [s.region_class for s in r.spans] == ["paragraph"]
    assert len(r.spans) == 1


def test_pdf_corrupt_total():
    assert extract_pdf("u", b"%PDF-1.4 garbage \xff\x00").spans == ()


def test_pdf_flate_byte_identical_to_raw():
    # the crawl-real shape: same content, Flate-compressed — extraction
    # must be byte-identical to the uncompressed variant
    title, paras = "A Title Here", ["first paragraph text", "second one"]
    raw = extract_pdf("u", make_pdf(title, paras))
    comp = extract_pdf("u", make_pdf(title, paras, compress=True))
    assert comp.text == raw.text
    assert comp.spans == raw.spans


def test_pdf_flate_body_containing_endstream_bytes():
    # a deflate body may legally contain the bytes b"endstream"; the
    # /Length-honoring boundary must not truncate it
    import zlib

    import zlib

    stream = b"BT /F1 11 Tf 0 0 Td (text with endstream inside it) Tj ET"
    # stored (level-0) deflate blocks copy bytes verbatim, so the binary
    # body literally contains b"endstream" while being a valid zlib stream
    co = zlib.compressobj(0)
    body = co.compress(stream) + co.flush()
    assert b"endstream" in body
    pdf = (b"%PDF-1.4\n2 0 obj << /Length " + str(len(body)).encode()
           + b" /Filter /FlateDecode >>\nstream\n" + body
           + b"\nendstream\nendobj\n%%EOF\n")
    r = extract_pdf("u", pdf)
    assert r.text == "text with endstream inside it"


def test_pdf_flate_corrupt_stream_skipped_keeps_rest():
    import zlib

    good = zlib.compress(b"BT /F1 11 Tf 0 0 Td (good flate text) Tj ET", 6)
    pdf = (
        b"%PDF-1.4\n"
        b"2 0 obj << /Length 12 /Filter /FlateDecode >>\n"
        b"stream\nnot-deflate!\nendstream\nendobj\n"
        b"3 0 obj << /Length " + str(len(good)).encode()
        + b" /Filter /FlateDecode >>\nstream\n" + good
        + b"\nendstream\nendobj\n%%EOF\n"
    )
    r = extract_pdf("u", pdf)
    assert r.text == "good flate text"


def test_pdf_length_mismatch_falls_back_to_scan():
    # indirect /Length (e.g. "5 0 R") or a wrong direct one: the scan
    # fallback still finds the uncompressed body
    pdf = (b"%PDF-1.4\n2 0 obj << /Length 99999 >>\nstream\n"
           b"BT /F1 11 Tf 0 0 Td (scan fallback text) Tj ET\n"
           b"endstream\nendobj\n%%EOF\n")
    assert extract_pdf("u", pdf).text == "scan fallback text"


def test_unescape():
    assert _unescape_pdf_string(rb"a\(b\)c\\d\n") == "a(b)c\\d\n"
    assert _unescape_pdf_string(rb"\101\102") == "AB"


# --- totality fuzz: the skip-on-corrupt contract means NO byte soup may
# raise — corrupt inputs degrade to fewer/empty spans, never exceptions
from hypothesis import given, settings, strategies as st  # noqa: E402

_pdfish = st.one_of(
    st.binary(max_size=400),
    st.builds(
        lambda head, body, ln: (b"%PDF-1.4\n" + head
                                + b" /Length " + str(ln).encode()
                                + b" /Filter /FlateDecode >>\nstream\n"
                                + body + b"\nendstream\n"),
        st.binary(max_size=40), st.binary(max_size=200),
        st.integers(min_value=0, max_value=10_000),
    ),
    st.builds(
        lambda parts: b"%PDF-1.4\n" + b"stream\n".join(parts),
        st.lists(st.binary(max_size=120), max_size=5),
    ),
)


@given(_pdfish)
@settings(max_examples=200, deadline=None)
def test_pdf_extract_total_on_byte_soup(payload):
    r = extract_pdf("u", b"%PDF-" + payload)
    assert isinstance(r.text, str)


def test_pdf_indirect_length_never_truncates_body():
    # /Length 28 0 R is an INDIRECT reference: its object number must not
    # be used as a byte count (ADVICE r4) — with the true endstream at
    # start+32, the old match truncated the body mid-operator to 28 bytes
    from webextract.pdf_extract import _LENGTH_RE

    assert _LENGTH_RE.search(b"/Length 28 0 R") is None
    assert _LENGTH_RE.search(b"/Length 28") is not None
    assert _LENGTH_RE.search(b"/Length 28 0 X") is not None

    body = b"BT (indirect length body) Tj ET"
    assert len(body) == 31
    pdf = (b"%PDF-1.4\n1 0 obj\n<< /Length 28 0 R >>\nstream\n" + body
           + b"\nendstream\nendobj\n2 0 obj\n31\nendobj\n")
    r = extract_pdf("u://pdf", pdf)
    assert "indirect length body" in r.text

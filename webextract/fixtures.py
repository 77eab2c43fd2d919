"""Deterministic synthetic `pages` fixtures (seed=42) — FIXTURES.md §1.

The generator mirrors the reference's test strategy: tiny synthetic inputs
with exactly known expected structure (``test/test_output_page_xml.py:16-289``
feeds synthetic logit tensors and asserts exact coordinate strings). Every
template class maps to a span-class assertion.

Everything is a pure function of (index, seed): no global RNG state, so any
subset of rows can be regenerated identically in parallel on any executor.
"""

from __future__ import annotations

import datetime as dt
import random

from pyspark.sql import DataFrame, SparkSession

from .schema import PAGES_SCHEMA

_WORDS = (
    "data query scan filter join group sort merge hash table row column "
    "batch stream window value key index page block text span class order "
    "fast slow small large deep wide plan stage task shuffle spill cache"
).split()

_LANGS = ("en", "nl", "de", "zz")


def _rng(idx: int, seed: int) -> random.Random:
    return random.Random((seed << 32) ^ idx)


def _sentence(r: random.Random, n: int) -> str:
    return " ".join(r.choice(_WORDS) for _ in range(n))


def _nav_links(r: random.Random, n: int) -> str:
    return "".join(
        f'<li><a href="/x{i}">{r.choice(_WORDS)}</a></li>' for i in range(n)
    )


def make_pdf(title: str, paragraphs: list[str],
             compress: bool = False) -> bytes:
    """Minimal valid-enough PDF with one title + paragraphs.

    ``compress=True`` deflates the content stream and declares
    ``/Filter /FlateDecode`` — the real-world shape (virtually every
    crawled PDF is Flate-compressed); extraction must be byte-identical
    to the uncompressed variant of the same content.
    """
    import zlib

    stream_parts = [f"BT /F1 18 Tf 72 720 Td ({title}) Tj ET"]
    y = 690
    for p in paragraphs:
        stream_parts.append(f"BT /F1 11 Tf 72 {y} Td ({p}) Tj ET")
        y -= 20
    stream = "\n".join(stream_parts).encode("latin-1")
    filt = b""
    if compress:
        stream = zlib.compress(stream, 6)
        filt = b" /Filter /FlateDecode"
    return (
        b"%PDF-1.4\n1 0 obj << /Type /Catalog >> endobj\n"
        b"2 0 obj << /Length " + str(len(stream)).encode() + filt + b" >>\n"
        b"stream\n" + stream + b"\nendstream\nendobj\n%%EOF\n"
    )


def render_page(idx: int, seed: int = 42, giant_every: int = 1000,
                giant_repeat: int = 20000, body_scale: int = 1) -> dict:
    """One deterministic pages row. Template chosen by ``idx % 10``.

    ``body_scale`` multiplies per-template body sizes (1 → ~1 KB toy pages
    for unit tests; 20-40 → realistic Common-Crawl-sized pages for the
    bench, where per-doc parse work must dominate fixed overheads).
    """
    r = _rng(idx, seed)
    bs = max(1, body_scale)
    template = idx % 10
    url = f"https://example-{template}.test/p{idx // 10}/{idx}"
    lang = _LANGS[idx % len(_LANGS)]

    if template == 0:  # plain article (FIXTURES template 1)
        body = f"<h1>{_sentence(r, 4)}</h1>" + "".join(
            f"<p>{_sentence(r, 12)}</p>" for _ in range(3 * bs)
        )
        html = f"<html><body>{body}</body></html>".encode()
    elif template == 1:  # article + nav/sidebar/footer boilerplate (t2)
        html = (
            f"<html><body><nav><ul>{_nav_links(r, 6)}</ul></nav>"
            f"<article><h1>{_sentence(r, 3)}</h1>"
            + "".join(f"<p>{_sentence(r, 12)}</p>" for _ in range(2 * bs))
            + f"</article>"
            f"<aside><p>{_sentence(r, 6)}</p></aside>"
            f'<footer><p><a href="/a">{_sentence(r, 5)}</a></p></footer>'
            f"</body></html>"
        ).encode()
    elif template == 2:  # merge-alias case: bare <title> (t3)
        html = (
            f"<html><title>{_sentence(r, 3)}</title>"
            "<body>"
            + "".join(f"<p>{_sentence(r, 12)}</p>" for _ in range(bs))
            + "</body></html>"
        ).encode()
    elif template == 3:  # lists / tables / pre / blockquote / caption (t4)
        html = (
            "<html><body><ul>"
            + "".join(f"<li>{_sentence(r, 4)}</li>" for _ in range(2 * bs))
            + "</ul>"
            f"<table><tr><td>{_sentence(r, 3)}</td><td>{_sentence(r, 3)}</td></tr></table>"
            f"<pre>{_sentence(r, 6)}</pre>"
            f"<blockquote>{_sentence(r, 8)}</blockquote>"
            f"<figure><figcaption>{_sentence(r, 4)}</figcaption></figure>"
            f"</body></html>"
        ).encode()
    elif template == 4:  # min-size filter case (t5)
        html = (
            f"<html><body><p>{_sentence(r, 10)}</p><p>ab</p>"
            f"<p>{_sentence(r, 8)}</p></body></html>"
        ).encode()
    elif template == 5:  # pathological (t6)
        variant = idx % 5
        html = [
            b"",
            b"<!-- only a comment -->",
            b"<html><body><![CDATA[ not text ]]><p>after cdata "
            + _sentence(r, 5).encode() + b"</p>",
            ("<div><div><div><div><div><p>" + _sentence(r, 7)
             + "</p></div></div>").encode(),  # unclosed + nested
            ("<p>&amp; &#65; &lt;tag&gt; " + _sentence(r, 5) + "</p>").encode(),
        ][variant]
    elif template == 6:  # encoding cases (t8)
        variant = idx % 2
        text = _sentence(r, 8) + " café über"
        if variant == 0:  # declared latin-1
            html = (
                '<html><head><meta charset="iso-8859-1"></head>'
                f"<body><p>{text}</p></body></html>"
            ).encode("latin-1")
        else:  # undeclared latin-1 bytes
            html = f"<html><body><p>{text}</p></body></html>".encode("latin-1")
    elif template == 7:  # PDF branch — alternate raw / Flate-compressed
        html = make_pdf(_sentence(r, 3),
                        [_sentence(r, 9) for _ in range(2 * bs)],
                        compress=(idx // 10) % 2 == 1)
    elif template == 8 and giant_every and idx % giant_every == 8:  # skew (t7)
        html = (
            "<html><body>" + f"<p>{_sentence(r, 10)}</p>" * giant_repeat
            + "</body></html>"
        ).encode()
    else:  # mixed default article
        html = (
            f"<html><body><h2>{_sentence(r, 3)}</h2>"
            + "".join(f"<p>{_sentence(r, 14)}</p>" for _ in range(bs))
            + "</body></html>"
        ).encode()

    return {
        "url": url,
        "warc_ts": dt.datetime(2024, 1, 1) + dt.timedelta(seconds=idx * 37),
        "html": html,
        "text": _sentence(r, 10),
        "lang": lang,
    }


def gen_pages(n: int, seed: int = 42, giant_every: int = 1000,
              giant_repeat: int = 20000, body_scale: int = 1) -> list[dict]:
    return [render_page(i, seed, giant_every, giant_repeat, body_scale)
            for i in range(n)]


def pages_dataframe(spark: SparkSession, n: int, seed: int = 42,
                    num_partitions: int = 8, giant_every: int = 1000,
                    giant_repeat: int = 20000,
                    body_scale: int = 1) -> DataFrame:
    """Distributed fixture build: rows are rendered ON EXECUTORS from
    indices (a range scan + mapInPandas would also work; the row count here
    is test-scale so parallelize of indices is fine)."""
    rdd = spark.sparkContext.parallelize(range(n), num_partitions)
    rows = rdd.map(
        lambda i: render_page(i, seed, giant_every, giant_repeat, body_scale))
    return spark.createDataFrame(rows, PAGES_SCHEMA)


def pages_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wrap the driver's read-only ``documents`` table into minimal pages
    rows (FIXTURES.md §4): ``html = '<html><body><p>' || text ||
    '</p></body></html>'``. documents.text is plain words (verified: no
    ``<``/``&``), so no escaping is needed and the oracle-side SQL mirror
    is exact."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        F.concat(F.lit("https://docs.test/"), F.col("doc_id").cast("string"))
        .alias("url"),
        F.lit(dt.datetime(2024, 1, 1)).alias("warc_ts"),
        F.encode(
            F.concat(F.lit("<html><body><p>"), F.col("text"),
                     F.lit("</p></body></html>")),
            "UTF-8",
        ).alias("html"),
        F.col("text"),
        F.col("lang"),
    )


def make_jpeg_stub(width: int, height: int, fill: bytes = b"") -> bytes:
    """Deterministic marker-only JPEG: SOI, an optional COM segment
    carrying ``fill`` (varies the digest without varying the dims), a
    1-component SOF0 with the given dims, EOI. Valid for every
    header-level consumer (``multimodal._jpeg_dims``, exif-less crawl
    tooling); there is deliberately no scan data — pixel decode is out
    of scope for these fixtures."""
    import struct

    com = b""
    if fill:
        com = b"\xff\xfe" + struct.pack(">H", len(fill) + 2) + fill
    # SOF0 length 11 = 2 (len) + 1 (precision) + 4 (dims) + 1 (ncomp)
    # + 3 (component id, sampling, quant-table id)
    sof = b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, height, width, 1) \
        + b"\x01\x11\x00"
    return b"\xff\xd8" + com + sof + b"\xff\xd9"


def _pdf_stream_obj(num: int, body: bytes, filters: list[bytes]) -> bytes:
    """One numbered PDF stream object; ``filters`` (outermost first) are
    applied to ``body`` in reverse so the declared chain decodes back to
    it."""
    import base64
    import binascii
    import zlib

    enc = body
    for f in reversed(filters):
        if f == b"FlateDecode":
            enc = zlib.compress(enc, 6)
        elif f == b"ASCIIHexDecode":
            enc = binascii.hexlify(enc) + b">"
        elif f == b"ASCII85Decode":
            enc = base64.a85encode(enc) + b"~>"
        elif f == b"DCTDecode":
            pass  # terminal image codec: the body IS the JPEG bytes
        else:
            raise ValueError(f"fixture filter {f!r}")
    filt = b""
    if filters:
        chain = b" ".join(b"/" + n for n in filters)
        filt = b" /Filter [" + chain + b"]" if len(filters) > 1 \
            else b" /Filter /" + filters[0]
    return (str(num).encode() + b" 0 obj << /Length "
            + str(len(enc)).encode() + filt + b" >>\nstream\n"
            + enc + b"\nendstream\nendobj\n")


def pdf_media_spec(i: int) -> list[tuple[int, int, bytes]]:
    """The embedded images of fixture PDF ``i``, closed-form in ``i``:
    1 + i%3 images; image j is (width, height, jpeg_bytes) with
    width = 16*(1+(i+j)%8), height = 8*(1+(i*3+j)%8) and a COM filler
    unique to (i, j). The oracle derives expected rows from THIS spec,
    not from running the extraction path."""
    out = []
    for j in range(1 + i % 3):
        w = 16 * (1 + (i + j) % 8)
        h = 8 * (1 + (i * 3 + j) % 8)
        out.append((w, h, make_jpeg_stub(w, h, f"img-{i}-{j}".encode())))
    return out


def make_pdf_with_images(i: int) -> bytes:
    """Fixture PDF ``i``: one Flate text stream plus the
    :func:`pdf_media_spec` images as /DCTDecode XObject streams, their
    transport wrapper rotating none / ASCIIHex / ASCII85 by (i+j)%3 —
    the three crawl-real embeddings of the same JPEG bytes."""
    text = f"BT /F1 12 Tf 72 720 Td (Fixture doc {i}) Tj ET".encode()
    parts = [b"%PDF-1.4\n1 0 obj << /Type /Catalog >> endobj\n",
             _pdf_stream_obj(2, text, [b"FlateDecode"])]
    wrappers = ([], [b"ASCIIHexDecode"], [b"ASCII85Decode"])
    for j, (_, _, jpeg) in enumerate(pdf_media_spec(i)):
        parts.append(_pdf_stream_obj(
            3 + j, jpeg, list(wrappers[(i + j) % 3]) + [b"DCTDecode"]))
    return b"".join(parts) + b"%%EOF\n"


def pdf_media_dataframe(spark: SparkSession, n: int,
                        num_partitions: int = 8) -> DataFrame:
    """(doc_id, payload) fixture PDFs, rendered on executors from
    indices (test-scale parallelize, same stance as pages_dataframe)."""
    rdd = spark.sparkContext.parallelize(range(n), num_partitions)
    return spark.createDataFrame(
        rdd.map(lambda i: {"doc_id": i, "payload": make_pdf_with_images(i)}),
        "doc_id long, payload binary")

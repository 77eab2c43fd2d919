"""WARC ingestion source: hand-built ISO-28500 fixtures (plain and
member-gzipped), record-type filtering, HTTP deframing, truncation and
bomb-guard behavior, and the end-to-end hop into the extractor."""

from __future__ import annotations

import datetime as dt
import gzip

import pytest

from webextract.warc import (
    parse_warc_records, read_warc, read_warc_pages,
)


def _record(rtype: str, uri: str | None, content: bytes,
            date: str = "2024-02-03T04:05:06Z",
            ctype: str = "application/http; msgtype=response") -> bytes:
    headers = ["WARC/1.0", f"WARC-Type: {rtype}"]
    if uri:
        headers.append(f"WARC-Target-URI: {uri}")
    headers += [f"WARC-Date: {date}", f"Content-Type: {ctype}",
                f"Content-Length: {len(content)}"]
    return ("\r\n".join(headers) + "\r\n\r\n").encode() + content + b"\r\n\r\n"


def _http(body: bytes, ctype: str = "text/html; charset=utf-8") -> bytes:
    return (f"HTTP/1.1 200 OK\r\nContent-Type: {ctype}\r\n"
            f"Content-Length: {len(body)}\r\n\r\n").encode() + body


HTML_A = b"<html><body><p>alpha page body text</p></body></html>"
HTML_B = b"<html><body><p>beta page body text</p></body></html>"


def _warc_bytes() -> bytes:
    return (
        _record("warcinfo", None, b"software: test\r\n",
                ctype="application/warc-fields")
        + _record("request", "https://a.test/1",
                  b"GET /1 HTTP/1.1\r\n\r\n",
                  ctype="application/http; msgtype=request")
        + _record("response", "https://a.test/1", _http(HTML_A))
        + _record("conversion", "https://a.test/2", HTML_B,
                  ctype="text/html")
    )


def test_parse_plain_and_member_gzip():
    plain = _warc_bytes()
    rows = parse_warc_records(plain)
    assert [r["warc_type"] for r in rows] == ["response", "conversion"]
    assert rows[0]["url"] == "https://a.test/1"
    assert rows[0]["html"] == HTML_A  # HTTP frame stripped
    assert rows[0]["content_type"] == "text/html; charset=utf-8"
    assert rows[0]["warc_ts"] == dt.datetime(2024, 2, 3, 4, 5, 6,
                                             tzinfo=dt.timezone.utc)
    assert rows[1]["html"] == HTML_B  # conversion kept verbatim

    # Common-Crawl style: every record its own gzip member, concatenated
    members = b"".join(
        gzip.compress(part) for part in (
            _record("response", "https://a.test/1", _http(HTML_A)),
            _record("conversion", "https://a.test/2", HTML_B,
                    ctype="text/html"),
        ))
    grows = parse_warc_records(members)
    assert [(r["url"], r["html"]) for r in grows] \
        == [(r["url"], r["html"]) for r in rows]


def test_truncation_and_bomb_guard():
    data = _warc_bytes()
    # a truncated tail loses only the tail record
    cut = data[: data.rfind(b"WARC/1.0") + 40]
    rows = parse_warc_records(cut)
    assert [r["warc_type"] for r in rows] == ["response"]
    # bounded inflate: a highly compressible stream over the cap raises
    bomb = gzip.compress(b"\x00" * (1 << 20))
    with pytest.raises(ValueError, match="max_bytes"):
        parse_warc_records(bomb, max_bytes=1 << 16)


def test_read_warc_to_extraction(spark, tmp_path):
    from webextract.pipeline import extract_dataframe, ship_package

    ship_package(spark)
    (tmp_path / "a.warc").write_bytes(_warc_bytes())
    (tmp_path / "b.warc.gz").write_bytes(b"".join(
        gzip.compress(part) for part in (
            _record("response", "https://b.test/9",
                    _http(b"<html><body><p>gamma body</p></body></html>")),
        )))
    warc = read_warc(spark, str(tmp_path))
    assert warc.count() == 3
    assert set(r["source_file"].rsplit("/", 1)[-1]
               for r in warc.select("source_file").collect()) \
        == {"a.warc", "b.warc.gz"}
    pages = read_warc_pages(spark, str(tmp_path))
    out = {r["url"]: r["extracted_text"]
           for r in extract_dataframe(pages).collect()}
    assert out["https://a.test/1"] == "alpha page body text"
    assert out["https://a.test/2"] == "beta page body text"
    assert out["https://b.test/9"] == "gamma body"


def test_cli_extract_from_warc(spark, tmp_path, capsys):
    import json

    from webextract.__main__ import main

    (tmp_path / "in").mkdir()
    (tmp_path / "in" / "c.warc").write_bytes(_warc_bytes())
    assert main(["extract", "--input", str(tmp_path / "in"),
                 "--input-format", "warc",
                 "--output", str(tmp_path / "out"),
                 "--partitions", "2"]) == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["rows_written"] == 2
    out = {r["url"]: r["extracted_text"]
           for r in spark.read.parquet(str(tmp_path / "out")).collect()}
    assert out["https://a.test/1"] == "alpha page body text"


def test_warc_ts_is_utc_instant_regardless_of_session_tz(spark, tmp_path):
    from webextract.warc import _parse_warc_date

    # non-Z offsets convert (not drop): +02:00 noon == 10:00Z
    assert _parse_warc_date("2026-08-17T12:00:00+02:00") \
        == dt.datetime(2026, 8, 17, 10, 0, 0, tzinfo=dt.timezone.utc)
    (tmp_path / "t.warc").write_bytes(
        _record("response", "https://t.test/1", _http(HTML_A)))
    old = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        epoch_ny = read_warc(spark, str(tmp_path)) \
            .selectExpr("unix_timestamp(warc_ts) AS e").collect()[0]["e"]
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)
    epoch_utc = read_warc(spark, str(tmp_path)) \
        .selectExpr("unix_timestamp(warc_ts) AS e").collect()[0]["e"]
    want = int(dt.datetime(2024, 2, 3, 4, 5, 6,
                           tzinfo=dt.timezone.utc).timestamp())
    assert epoch_ny == epoch_utc == want


def test_corrupt_file_becomes_error_row_not_task_failure(spark, tmp_path):
    (tmp_path / "good.warc").write_bytes(
        _record("response", "https://g.test/1", _http(HTML_A)))
    # gzip magic followed by garbage: inflate fails mid-member
    (tmp_path / "bad.warc.gz").write_bytes(b"\x1f\x8b" + b"\xde\xad" * 50)
    rows = read_warc(spark, str(tmp_path)).collect()
    by_type = {r["warc_type"]: r for r in rows}
    assert by_type["response"]["url"] == "https://g.test/1"
    err = by_type["error"]
    assert err["url"] is None and "ValueError" in err["content_type"]
    assert err["source_file"].endswith("bad.warc.gz")
    # the pages view drops the marker row
    assert read_warc_pages(spark, str(tmp_path)).count() == 1


def test_negative_content_length_terminates():
    # a crafted Content-Length of -(header size) would move pos backward
    # and re-parse the same record forever; the parser must stop instead
    good = _record("response", "https://g.test/1", _http(HTML_A))
    hdr = ("WARC/1.0\r\nWARC-Type: response\r\n"
           "WARC-Target-URI: https://evil.test/\r\n"
           "WARC-Date: 2024-02-03T04:05:06Z\r\n")
    # choose the length so body_start + length lands back at pos
    for probe in range(-200, 0):
        crafted = (hdr + f"Content-Length: {probe}\r\n\r\n").encode()
        rows = parse_warc_records(good + crafted)
        assert [r["url"] for r in rows] == ["https://g.test/1"]


def test_record_types_opt_in():
    data = _warc_bytes()
    # default: payload-bearing kinds only
    assert [r["warc_type"] for r in parse_warc_records(data)] \
        == ["response", "conversion"]
    # WAT-style ingestion: request + metadata records on demand
    rows = parse_warc_records(
        data + _record("metadata", "https://a.test/1",
                       b'{"links": ["https://a.test/2"]}',
                       ctype="application/json"),
        record_types=("request", "metadata"))
    assert [r["warc_type"] for r in rows] == ["request", "metadata"]
    assert rows[0]["html"].startswith(b"GET /1 HTTP/1.1")  # raw framing
    assert rows[1]["content_type"] == "application/json"
    assert rows[1]["html"] == b'{"links": ["https://a.test/2"]}'


def test_read_warc_record_types_kwarg(spark, tmp_path):
    (tmp_path / "m.warc").write_bytes(_warc_bytes())
    df = read_warc(spark, str(tmp_path), record_types=("conversion",))
    rows = df.collect()
    assert [r["warc_type"] for r in rows] == ["conversion"]
    assert rows[0]["url"] == "https://a.test/2"


def test_parse_totality_on_arbitrary_bytes():
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=200, deadline=None)
    @given(st.binary(max_size=400))
    def check(data):
        # plain bytes: parse returns a (possibly empty) list; only
        # gzip-magic inputs may raise, and then only ValueError
        try:
            rows = parse_warc_records(data, max_bytes=1 << 16)
        except ValueError:
            assert data[:2] == b"\x1f\x8b"
        else:
            assert isinstance(rows, list)

    check()


def test_stream_warc_extraction_incremental_and_dedup(spark, tmp_path):
    # the standing-query crawl topology: segment files LAND in a dir;
    # each availableNow pass processes only unseen segments (checkpoint
    # = the ledger), and first-seen state drops revisits across runs
    from webextract.pipeline import ship_package
    from webextract.streaming import stream_warc_extraction

    ship_package(spark)
    seg_dir = tmp_path / "segments"
    seg_dir.mkdir()
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    (seg_dir / "seg-00001.warc.gz").write_bytes(gzip.compress(_warc_bytes()))

    q = stream_warc_extraction(spark, str(seg_dir), out, ckpt,
                               dedup_revisits=True)
    q.awaitTermination(120)
    first = {r["url"]: r for r in spark.read.parquet(out).collect()}
    assert set(first) == {"https://a.test/1", "https://a.test/2"}
    assert "alpha page body text" in first["https://a.test/1"]["extracted_text"]

    # second segment lands: one new url + a revisit of /1 (later date)
    seg2 = (_record("response", "https://a.test/3", _http(HTML_B))
            + _record("response", "https://a.test/1", _http(HTML_B),
                      date="2024-02-03T05:00:00Z"))
    (seg_dir / "seg-00002.warc").write_bytes(seg2)
    q2 = stream_warc_extraction(spark, str(seg_dir), out, ckpt,
                                dedup_revisits=True)
    q2.awaitTermination(120)
    rows = spark.read.parquet(out).collect()
    assert len(rows) == 3  # segment 1 not re-emitted; revisit dropped
    by_url = {r["url"]: r for r in rows}
    assert set(by_url) == {"https://a.test/1", "https://a.test/2",
                           "https://a.test/3"}
    # /1 is still the FIRST crawl's extraction, not the revisit's
    assert "alpha page body text" in by_url["https://a.test/1"]["extracted_text"]

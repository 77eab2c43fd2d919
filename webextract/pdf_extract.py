"""Minimal deterministic PDF text-object parser — the PDF branch of the
north star ("PDF layout parsing into region classes").

Scope: content streams with ``BT … ET`` text objects using ``Tf`` (font
select), ``Tj``/``'``/``TJ`` (show text), ``Td``/``TD``/``T*`` (line
moves). Streams are located by scanning ``stream…endstream`` directly (no
xref walk — tolerates linearized / xref-damaged files), and streams whose
object dictionary declares ``/FlateDecode`` are inflated with stdlib
``zlib`` — which is exactly the Flate codec — so real-world compressed
PDFs (virtually all of them) extract. A stream that fails to inflate is
skipped, mirroring the reference's skip-on-corrupt contract at
``inference.py:344-346``.

Layout mapping: each ``BT … ET`` text object is one block; blocks written
with a font size ≥ ``_HEADER_MIN_PT`` classify as ``header``, else
``paragraph`` — the PDF analog of the reference's region classes. Span
assembly (run-length merge, min-size filter, reading order, deterministic
ids) is shared with the HTML branch via
:func:`webextract.html_extract.assemble_spans`.
"""

from __future__ import annotations

import re
import zlib

from .config import ExtractConfig, DEFAULT_CONFIG
from .html_extract import ExtractResult, _normalize_ws, assemble_spans

_HEADER_MIN_PT = 14.0

_STREAM_START_RE = re.compile(rb"stream\r?\n")
# negative lookaheads: an INDIRECT length (/Length 5 0 R) must not match —
# capturing its object number as a byte count could silently mis-truncate
# a body when an 'endstream' happens to land near start+objnum. (?!\d)
# pins \d+ to the whole number so backtracking can't split '28' into '2'
# + '8 0 R' and sneak past the R-reference lookahead
_LENGTH_RE = re.compile(rb"/Length\s+(\d+)(?!\d)(?!\s+\d+\s+R)")
_BT_ET_RE = re.compile(rb"BT(.*?)ET", re.DOTALL)
_TF_RE = re.compile(rb"/\S+\s+(\d+(?:\.\d+)?)\s+Tf")
# tokens inside a text object we care about, in order
_TOK_RE = re.compile(
    rb"""
    \( ( (?:[^()\\]|\\.)* ) \)\s*(Tj|')   # (string) Tj  or  (string) '
  | \[ ( (?:[^\]\\]|\\.)* ) \]\s*TJ       # [(a) -120 (b)] TJ
  | (T\*|Td|TD)                           # line moves
  | /\S+\s+(\d+(?:\.\d+)?)\s+Tf           # font size
    """,
    re.VERBOSE | re.DOTALL,
)
_TJ_STR_RE = re.compile(rb"\( ( (?:[^()\\]|\\.)* ) \)", re.VERBOSE | re.DOTALL)

_ESC = {
    b"n": "\n", b"r": "\r", b"t": "\t", b"b": "\b", b"f": "\f",
    b"(": "(", b")": ")", b"\\": "\\",
}


def _unescape_pdf_string(raw: bytes) -> str:
    """PDF literal-string unescape: \\(, \\), \\\\, \\n..., octal \\ddd."""
    if b"\\" not in raw:  # fast path: nothing to unescape
        return raw.decode("latin-1")
    out: list[str] = []
    i, n = 0, len(raw)
    while i < n:
        b = raw[i:i + 1]
        if b == b"\\" and i + 1 < n:
            nxt = raw[i + 1:i + 2]
            if nxt in _ESC:
                out.append(_ESC[nxt])
                i += 2
                continue
            if nxt.isdigit():  # octal, up to 3 digits
                j = i + 1
                while j < min(i + 4, n) and raw[j:j + 1].isdigit():
                    j += 1
                out.append(chr(int(raw[i + 1:j], 8) & 0xFF))
                i = j
                continue
            i += 1  # line continuation / unknown escape: drop backslash
            continue
        out.append(b.decode("latin-1"))
        i += 1
    return "".join(out)


def _parse_text_object(body: bytes, cur_size: float) -> tuple[str, float, float]:
    """One BT…ET body → (normalized text, font size used, new cur_size)."""
    pieces: list[str] = []
    size = cur_size
    first_size: float | None = None
    for m in _TOK_RE.finditer(body):
        if m.group(1) is not None:  # (string) Tj / '
            if first_size is None:
                first_size = size
            if m.group(2) == b"'":
                pieces.append(" ")
            pieces.append(_unescape_pdf_string(m.group(1)))
        elif m.group(3) is not None:  # TJ array
            if first_size is None:
                first_size = size
            for sm in _TJ_STR_RE.finditer(m.group(3)):
                pieces.append(_unescape_pdf_string(sm.group(1)))
        elif m.group(4) is not None:  # Td/TD/T* — line move
            pieces.append(" ")
        elif m.group(5) is not None:  # Tf
            size = float(m.group(5))
    text = _normalize_ws("".join(pieces))
    return text, (first_size if first_size is not None else size), size


def is_pdf(payload: bytes) -> bool:
    return payload.lstrip()[:5] == b"%PDF-"


def _iter_streams(payload: bytes):
    """Yield ``(dict_head, body)`` per ``stream…endstream`` object.

    The body boundary honors the dict's ``/Length`` when it is a direct
    integer that lands on an ``endstream`` keyword (binary Flate bodies
    may legally contain the bytes ``endstream``, so a bare text scan can
    truncate them); otherwise falls back to the first ``endstream`` scan,
    which tolerates xref-less / indirect-Length / linearized layouts.
    """
    pos = prev_end = 0
    while True:
        m = _STREAM_START_RE.search(payload, pos)
        if m is None:
            return
        head = payload[prev_end:m.start()]
        start = m.end()
        end = -1
        lm = None
        for lm in _LENGTH_RE.finditer(head):
            pass  # last /Length in this object's dict wins
        if lm is not None:
            ln = int(lm.group(1))
            cand = payload.find(b"endstream", start + ln)
            if 0 <= cand <= start + ln + 4:  # allow EOL pad before keyword
                end = start + ln
                nxt = cand + len(b"endstream")
        if end < 0:
            cand = payload.find(b"endstream", start)
            if cand < 0:
                return
            end = cand
            nxt = cand + len(b"endstream")
        yield head, payload[start:end]
        pos = prev_end = nxt


def _inflate(body: bytes) -> bytes | None:
    """Inflate one /FlateDecode stream body; ``None`` on corrupt data.

    ``decompressobj`` (not ``zlib.decompress``) so trailing bytes between
    the deflate stream and ``endstream`` (writers pad with EOLs) are
    ignored, and a truncated-but-started stream still yields its prefix.
    """
    d = zlib.decompressobj()
    try:
        out = d.decompress(body)
    except zlib.error:
        return None
    return out if (out or d.eof) else None


def extract_pdf(url: str, payload: bytes,
                cfg: ExtractConfig = DEFAULT_CONFIG) -> ExtractResult:
    """PDF bytes → extracted text + typed spans (header/paragraph)."""
    if payload and len(payload) > cfg.max_html_bytes:
        payload = payload[: cfg.max_html_bytes]
    kept: list[tuple[str, float, str]] = []
    cur_size = 11.0
    for head, body in _iter_streams(payload):
        if b"/FlateDecode" in head:
            body = _inflate(body)
            if body is None:
                continue  # corrupt stream: skip, keep the rest of the doc
        for tm in _BT_ET_RE.finditer(body):
            text, used_size, cur_size = _parse_text_object(tm.group(1), cur_size)
            if len(text) < cfg.min_region_size:
                continue  # P6 min-size filter, shared with HTML branch
            cls = "header" if used_size >= _HEADER_MIN_PT else "paragraph"
            cls = cfg.merge_aliases.get(cls, cls)
            kept.append((cls, 1.0, text))
    return assemble_spans(url, kept, cfg)

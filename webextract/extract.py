"""Content-type dispatch + Arrow-batch extraction API.

Dispatch mirrors the reference's reflective ``build_{mode}`` converter
dispatch (``page_xml/xml_converters/xml_converter.py:72-107``): a per-row
content sniff routes each payload to the HTML or PDF branch. The batch API
is the *only* Python on the hot path and runs via ``mapInArrow`` — the
engine's analog of the reference's DataLoader worker processes
(``inference.py:377-387``), with the JVM↔Python Arrow socket as the
process boundary (once per batch, never per row). Arrow RecordBatches are
consumed and produced directly (no pandas materialization): for a
binary-payload pipeline the pandas detour costs ~4x on batch conversion.
"""

from __future__ import annotations

import time
from collections.abc import Iterator
from typing import Any

import pyarrow as pa

from .config import DEFAULT_CONFIG, ExtractConfig
from .html_extract import (
    ExtractResult,
    classify_block,
    decode_payload,
    extract_html,
    tokenize_blocks,
)
from .pdf_extract import extract_pdf, is_pdf

_EMPTY = ExtractResult(text="", spans=())

_SPAN_TYPE = pa.list_(pa.struct([
    ("span_id", pa.string()),
    ("region_class", pa.string()),
    ("region_type", pa.string()),
    ("char_start", pa.int64()),
    ("char_end", pa.int64()),
    ("reading_order", pa.int32()),
    ("confidence", pa.float64()),
]))

_LINE_SPAN_TYPE = pa.list_(pa.struct([
    ("line_id", pa.string()),
    ("parent_span_id", pa.string()),
    ("char_start", pa.int64()),
    ("char_end", pa.int64()),
    ("line_order", pa.int32()),
]))


def extract_record(url: str, payload: bytes | None,
                   cfg: ExtractConfig = DEFAULT_CONFIG) -> dict[str, Any]:
    """One document → one output row (pure; never raises).

    Errors are captured in the ``error`` column — the reference's
    skip-with-warning contract (``inference.py:344-346``) recast so a bad
    row can never fail a 10^12-row job.
    """
    t0 = time.perf_counter()
    kind = "html"
    error = None
    try:
        if not payload:
            kind, result = "empty", _EMPTY
        elif is_pdf(payload):
            kind = "pdf"
            result = extract_pdf(url, payload, cfg)
        else:
            result = extract_html(url, payload, cfg)
    except Exception as exc:  # pragma: no cover - extractors are total
        result, error = _EMPTY, f"{type(exc).__name__}: {exc}"
    parse_us = int((time.perf_counter() - t0) * 1_000_000)
    spans = [
        {
            "span_id": s.span_id,
            "region_class": s.region_class,
            "region_type": s.region_type,
            "char_start": s.char_start,
            "char_end": s.char_end,
            "reading_order": s.reading_order,
            "confidence": s.confidence,
        }
        for s in result.spans
    ]
    line_spans = [
        {
            "line_id": ls.line_id,
            "parent_span_id": ls.parent_span_id,
            "char_start": ls.char_start,
            "char_end": ls.char_end,
            "line_order": ls.line_order,
        }
        for ls in result.line_spans
    ]
    mean_conf = (
        round(sum(s.confidence for s in result.spans) / len(result.spans), 6)
        if result.spans else None
    )
    return {
        "url": url,
        "extracted_text": result.text,
        "spans": spans,
        "line_spans": line_spans,
        "n_spans": len(spans),
        "mean_confidence": mean_conf,
        "content_kind": kind,
        "error": error,
        "n_bytes_in": len(payload) if payload else 0,
        "parse_us": parse_us,
    }


def _rows_to_batch(rows: list[dict], pid: int, run_id: str) -> pa.RecordBatch:
    n = len(rows)
    return pa.record_batch({
        "url": pa.array([r["url"] for r in rows], pa.string()),
        "extracted_text": pa.array(
            [r["extracted_text"] for r in rows], pa.string()),
        "spans": pa.array([r["spans"] for r in rows], _SPAN_TYPE),
        "line_spans": pa.array(
            [r["line_spans"] for r in rows], _LINE_SPAN_TYPE),
        "n_spans": pa.array([r["n_spans"] for r in rows], pa.int32()),
        "mean_confidence": pa.array(
            [r["mean_confidence"] for r in rows], pa.float64()),
        "content_kind": pa.array(
            [r["content_kind"] for r in rows], pa.string()),
        "error": pa.array([r["error"] for r in rows], pa.string()),
        "n_bytes_in": pa.array([r["n_bytes_in"] for r in rows], pa.int64()),
        "parse_us": pa.array([r["parse_us"] for r in rows], pa.int64()),
        "partition_id": pa.array([pid] * n, pa.int32()),
        "run_id": pa.array([run_id] * n, pa.string()),
    })


def block_score_rows(url: str, payload: bytes | None,
                     cfg: ExtractConfig = DEFAULT_CONFIG) -> list[dict]:
    """Per-block feature/score rows — the S8 debug-sink analog (the
    reference's optional per-pixel score output,
    ``page_xml/output_page_xml.py:156-189``): every block the classifier
    saw, with the features it scored on and the decision, INCLUDING
    dropped boilerplate. Pure; never raises; non-HTML payloads yield
    no rows (the classifier has no block view of PDFs)."""
    try:
        if not payload or is_pdf(payload):
            return []
        if len(payload) > cfg.max_html_bytes:
            payload = payload[: cfg.max_html_bytes]
        rows = []
        for i, block in enumerate(tokenize_blocks(decode_payload(payload))):
            cls, conf = classify_block(block, cfg)
            rows.append({
                "url": url,
                "block_order": i,
                "tag": block.tag,
                "marginal": block.marginal,
                "n_chars": len(block.text()),
                "link_density": round(block.link_density(), 6),
                "region_class": cls,
                "confidence": conf,
                "kept": cls != "background",
            })
        return rows
    except Exception:  # pragma: no cover - tokenizer/classifier are total
        return []


_BLOCK_SCORE_ARROW = pa.schema([
    ("url", pa.string()),
    ("block_order", pa.int32()),
    ("tag", pa.string()),
    ("marginal", pa.bool_()),
    ("n_chars", pa.int64()),
    ("link_density", pa.float64()),
    ("region_class", pa.string()),
    ("confidence", pa.float64()),
    ("kept", pa.bool_()),
])


def make_block_score_batches(cfg: ExtractConfig):
    """``mapInArrow`` function for the per-block debug sink: one output
    row per (url, block), matching ``BLOCK_SCORES_SCHEMA``."""

    def score_batches(
        batches: Iterator[pa.RecordBatch],
    ) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            urls = batch.column("url").to_pylist()
            payloads = batch.column("html").to_pylist()
            rows: list[dict] = []
            for u, p in zip(urls, payloads):
                rows.extend(block_score_rows(u, p, cfg))
            yield pa.RecordBatch.from_pylist(rows, schema=_BLOCK_SCORE_ARROW)

    return score_batches


def make_extract_batches(cfg: ExtractConfig, run_id: str,
                         passthrough: tuple[str, ...] = ()):
    """Build the ``mapInArrow`` function: Iterator[RecordBatch] →
    Iterator[RecordBatch].

    The closure carries only the frozen config + run id (the broadcast-
    variable analog of the reference's checkpoint load, S12). Requires
    columns ``url`` and ``html`` in the input batches; emits
    ``EXTRACTED_SCHEMA`` rows. ``passthrough`` columns are copied from the
    input batch to the output 1:1 (zero-copy Arrow column reuse) — used by
    the streaming path to keep ``warc_ts`` without a stream-stream join.
    """

    def extract_batches(
        batches: Iterator[pa.RecordBatch],
    ) -> Iterator[pa.RecordBatch]:
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else -1
        for batch in batches:
            urls = batch.column("url").to_pylist()
            payloads = batch.column("html").to_pylist()
            rows = [extract_record(u, p, cfg)
                    for u, p in zip(urls, payloads)]
            out = _rows_to_batch(rows, pid, run_id)
            for name in passthrough:
                out = out.append_column(name, batch.column(name))
            yield out

    return extract_batches

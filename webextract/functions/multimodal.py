"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched ``mapInPandas``.

The *Spark-side* plumbing (schema, partitioning, UDF signature, batch
shape) is real and tested; the actual media decode is stubbed because no
image/audio codec libraries exist in this container:

- ``backend="fake"`` (default): deterministic pseudo-features derived from
  the payload's md5 — reproducible anywhere, oracle-checkable in SQL.
- ``backend="real"``: raises ``NotImplementedError`` with the exact seam
  where a PIL/ffmpeg decode would plug in.

This mirrors how the reference isolates its decode stage
(``utils/image_utils.py:84-168``) behind a skippable boundary.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    IntegerType, LongType, StringType, StructField, StructType,
)

MEDIA_FEATURES_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("kind", StringType(), True),
    StructField("n_bytes", LongType(), True),
    StructField("digest", StringType(), True),     # md5 hex of payload
    StructField("width", IntegerType(), True),     # fake-decoded dims
    StructField("height", IntegerType(), True),
    StructField("n_frames", IntegerType(), True),  # video only
    StructField("error", StringType(), True),
])


def _fake_decode(payload: bytes, kind: str) -> dict:
    """Deterministic stand-in for a media decode.

    width  = 1 + (first 2 md5 bytes as int) % 1024
    height = 1 + (next 2 md5 bytes as int) % 1024
    n_frames (video) = 1 + (next 2 bytes) % 300
    These formulas are reproducible in plain SQL from the md5 hex, which
    is what makes the oracle check exact.
    """
    digest = hashlib.md5(payload).hexdigest()
    width = 1 + int(digest[0:4], 16) % 1024
    height = 1 + int(digest[4:8], 16) % 1024
    n_frames = (1 + int(digest[8:12], 16) % 300) if kind == "video" else None
    return {
        "n_bytes": len(payload), "digest": digest,
        "width": width, "height": height, "n_frames": n_frames,
    }


def _real_decode(payload: bytes, kind: str) -> dict:
    raise NotImplementedError(
        "real media decode requires PIL/ffmpeg, not present in this "
        "environment — plug the decoder in here; the Spark plumbing "
        "(schema/batching/partitioning) is already in place"
    )


def make_media_batches(backend: str = "fake"):
    """mapInPandas function over (media_id:int64, payload:binary,
    kind:string) → MEDIA_FEATURES_SCHEMA rows. Errors are captured
    per-row, never raised (same totality contract as the extractor)."""
    decode = _fake_decode if backend == "fake" else _real_decode

    def media_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for mid, payload, kind in zip(
                batch["media_id"], batch["payload"], batch["kind"]
            ):
                row = {"media_id": mid, "kind": kind, "n_bytes": None,
                       "digest": None, "width": None, "height": None,
                       "n_frames": None, "error": None}
                try:
                    if payload is None:
                        row["error"] = "null payload"
                    else:
                        row.update(decode(bytes(payload), kind))
                except NotImplementedError as exc:
                    row["error"] = f"NotImplementedError: {exc}"
                except Exception as exc:  # pragma: no cover
                    row["error"] = f"{type(exc).__name__}: {exc}"
                rows.append(row)
            yield pd.DataFrame.from_records(rows)

    return media_batches


def media_features(media: DataFrame, backend: str = "fake") -> DataFrame:
    """(media_id, payload, kind) → typed feature rows via Arrow batches."""
    slim = media.select("media_id", "payload", "kind")
    return slim.mapInPandas(make_media_batches(backend), MEDIA_FEATURES_SCHEMA)

"""Multimodal column plumbing — image/audio/video as opaque BINARY
columns with typed metadata, processed by Arrow-batched pandas
iterators (`mapInPandas`).

The container has no image/audio libraries, so the DECODE step is a
deterministic fake (clearly marked below): media blobs carry a tiny
synthetic header (magic + width + height + channels, big-endian u16)
followed by pseudo-pixel bytes derived from the doc text. Everything
around the decode — schema handling, binary column construction,
Arrow batch shapes, partition-parallel UDF execution, feature
extraction over raw bytes — is real and is what matters at 100 TB:

- blobs stay in executors end-to-end (never collected);
- `mapInPandas` receives an ITERATOR of pandas batches, so one
  oversized partition never materializes at once (batch size is
  `spark.sql.execution.arrow.maxRecordsPerBatch`);
- per-blob work is O(len(blob)) numpy over the Arrow buffer — the
  shape a real PIL/ffmpeg decode would take, swapped in by replacing
  `_decode_blob` only.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_spark.registry import register
from etl_spark.tables import load

_MAGIC = b"SGIM"  # synthetic media magic
_HEADER = struct.Struct(">4sHHH")  # magic, width, height, channels

MEDIA_SCHEMA = "doc_id BIGINT, media_type STRING, content BINARY"
DECODED_SCHEMA = (
    "doc_id BIGINT, media_type STRING, width INT, height INT, channels INT, "
    "n_pixel_bytes BIGINT, mean_intensity DOUBLE"
)


def make_media_table(spark: SparkSession, sf: str) -> DataFrame:
    """Build a synthetic media table over `documents`: each doc gets a
    BINARY blob = header + repeated utf-8 text bytes. Deterministic
    (pure function of text), so every run and both engines agree.
    Stays fully distributed — the blob is assembled in codegen'd
    expressions, not in Python."""
    docs = load(spark, sf, "documents")
    # width/height derived from doc stats; channels fixed at 3
    w = (F.length("text") % 64 + 1).cast("int")
    h = (F.col("n_chars") % 48 + 1).cast("int")
    header = F.concat(
        F.lit(_MAGIC),
        _be16(w),
        _be16(h),
        _be16(F.lit(3)),
    )
    return docs.select(
        "doc_id",
        F.lit("image/synthetic").alias("media_type"),
        F.concat(header, F.encode("text", "UTF-8")).alias("content"),
    )


def _be16(col):
    """Big-endian uint16 as 2 binary bytes: hex → zero-pad to 4
    nibbles → unhex. Pure codegen."""
    return F.unhex(F.lpad(F.hex(col.cast("int")), 4, "0"))


def _decode_blob(blob: bytes) -> tuple[int, int, int, int, float]:
    """DETERMINISTIC FAKE DECODE — stands in for PIL.Image.open /
    av.open. Parses the synthetic header and treats the payload as
    pixel bytes. Replace this single function with a real decoder
    when the codec libraries exist; the Spark plumbing is unchanged."""
    if len(blob) < _HEADER.size or not bytes(blob[:4]) == _MAGIC:
        raise ValueError("not a synthetic media blob")
    _, width, height, channels = _HEADER.unpack_from(blob, 0)
    payload = np.frombuffer(blob, dtype=np.uint8, offset=_HEADER.size)
    mean = float(payload.mean()) if payload.size else 0.0
    return width, height, channels, int(payload.size), mean


def decode_media(media: DataFrame) -> DataFrame:
    """Decode + feature-extract via mapInPandas: iterator-of-batches
    in, iterator-of-batches out. The numpy work is vectorizable per
    batch; blob bytes arrive as Arrow binary without copies."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [_decode_blob(b) for b in pdf["content"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "channels": [d[2] for d in decoded],
                    "n_pixel_bytes": [d[3] for d in decoded],
                    "mean_intensity": [d[4] for d in decoded],
                }
            )

    return media.mapInPandas(_decode, schema=DECODED_SCHEMA)


def sample_frames(media: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """Frame-sampling stub with real plumbing: emits one row per
    sampled 'frame' (payload stride), demonstrating the 1→N row fan-out
    shape a video frame sampler needs. The byte-slice stands in for
    an ffmpeg keyframe grab."""

    header_size = _HEADER.size  # plain int: the closure must not capture the Struct

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_ids, out_idx, out_means = [], [], []
            for doc_id, blob in zip(pdf["doc_id"], pdf["content"]):
                payload = np.frombuffer(blob, dtype=np.uint8, offset=header_size)
                for i, start in enumerate(range(0, len(payload), every_n_bytes)):
                    frame = payload[start : start + every_n_bytes]
                    out_ids.append(doc_id)
                    out_idx.append(i)
                    out_means.append(float(frame.mean()))
            yield pd.DataFrame(
                {"doc_id": out_ids, "frame_idx": out_idx, "frame_mean": out_means}
            )

    return media.mapInPandas(
        _sample, schema="doc_id BIGINT, frame_idx INT, frame_mean DOUBLE"
    )


@register(
    "x15_media_decode",
    # The decode is a pandas UDF, but the FAKE decoder is a pure
    # function of the text bytes — so the whole pipeline (header
    # fields, payload size, byte-mean intensity) is SQL-expressible
    # and the driver gets a hard value-hash check instead of the
    # rows-only signal this query carried through r8 (upgraded r9).
    # Byte extraction is hex-pair arithmetic so non-ASCII text would
    # still match; the mean divides an exact integer SUM once,
    # matching numpy's exact-integer pairwise partials + one IEEE
    # division.
    oracle="""
        WITH b AS (
            SELECT doc_id,
                   'image/synthetic' AS media_type,
                   CAST(length(text) % 64 + 1 AS INT) AS width,
                   CAST(n_chars % 48 + 1 AS INT) AS height,
                   CAST(3 AS INT) AS channels,
                   CAST(octet_length(encode(text)) AS BIGINT) AS n_pixel_bytes,
                   hex(encode(text)) AS hx
            FROM documents
        ),
        bytes AS (
            SELECT doc_id,
                   SUM(('0x' || substr(hx, CAST(2 * i - 1 AS INT), 2))::BIGINT)
                     AS s,
                   COUNT(*) AS n
            FROM b, LATERAL (
                SELECT unnest(range(1, CAST(n_pixel_bytes AS INT) + 1)) AS i
            )
            GROUP BY doc_id
        )
        SELECT b.doc_id, b.media_type, b.width, b.height, b.channels,
               b.n_pixel_bytes,
               CASE WHEN COALESCE(y.n, 0) = 0 THEN 0.0
                    ELSE CAST(y.s AS DOUBLE) / CAST(y.n AS DOUBLE)
               END AS mean_intensity
        FROM b LEFT JOIN bytes y USING (doc_id)
    """,
    tags=("multimodal",),
)
def x15_media_decode(spark: SparkSession, sf: str) -> DataFrame:
    """Media pipeline: build binary blobs → mapInPandas decode →
    typed metadata + payload features. Oracle-backed since r9 (the
    fake decode is a pure function of the text bytes — see the
    register note); exact value assertions also live in
    tests/test_multimodal.py."""
    return decode_media(make_media_table(spark, sf))


@register(
    "x16_binary_meta",
    oracle="""
        SELECT doc_id,
               CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
               md5(text) AS content_hash
        FROM documents
    """,
    tags=("multimodal",),
)
def x16_binary_meta(spark: SparkSession, sf: str) -> DataFrame:
    """Binary-column metadata without any UDF: blob length + content
    hash stay in codegen — the catalog/bookkeeping side of a
    multimodal table (dedup by content hash, size accounting)."""
    return load(spark, sf, "documents").select(
        "doc_id",
        F.octet_length(F.encode("text", "UTF-8")).cast("bigint").alias("n_bytes"),
        F.md5("text").alias("content_hash"),
    )

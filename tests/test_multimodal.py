"""Multimodal plumbing tests: binary blob construction stays in
codegen, mapInPandas decode round-trips the header exactly, frame
sampling fans out 1→N."""

from __future__ import annotations

import struct

from pyspark.sql import functions as F

from etl_spark.extensions.multimodal import (
    _HEADER,
    _MAGIC,
    decode_media,
    make_media_table,
    sample_frames,
)
from etl_spark.tables import load


def test_blob_header_roundtrip(spark, sf_dir):
    """The codegen-built header must parse back to the exact width/
    height/channels the expressions computed."""
    media = make_media_table(spark, sf_dir).limit(20)
    docs = load(spark, sf_dir, "documents").select(
        "doc_id",
        (F.length("text") % 64 + 1).cast("int").alias("w"),
        (F.col("n_chars") % 48 + 1).cast("int").alias("h"),
        F.length("text").alias("text_len"),
    )
    want = {r.doc_id: (r.w, r.h, r.text_len) for r in docs.collect()}
    for r in media.collect():
        magic, w, h, c = _HEADER.unpack_from(bytes(r.content), 0)
        assert magic == _MAGIC and c == 3
        assert (w, h) == want[r.doc_id][:2]
        assert len(r.content) == _HEADER.size + want[r.doc_id][2]


def test_decode_media_values(spark, sf_dir):
    media = make_media_table(spark, sf_dir).limit(50)
    out = decode_media(media)
    rows = out.collect()
    assert len(rows) == 50
    # independently recompute the expected features driver-side
    raw = {r.doc_id: bytes(r.content) for r in media.collect()}
    for r in rows:
        blob = raw[r.doc_id]
        _, w, h, c = _HEADER.unpack_from(blob, 0)
        payload = blob[_HEADER.size :]
        assert (r.width, r.height, r.channels) == (w, h, c)
        assert r.n_pixel_bytes == len(payload)
        assert abs(r.mean_intensity - sum(payload) / len(payload)) < 1e-9


def test_decode_rejects_foreign_blob(spark):
    import pandas as pd
    import pytest

    df = spark.createDataFrame(
        pd.DataFrame(
            {"doc_id": [1], "media_type": ["image/jpeg"], "content": [b"\xff\xd8notours"]}
        )
    )
    with pytest.raises(Exception, match="synthetic media blob"):
        decode_media(df).collect()


def test_sample_frames_fanout(spark, sf_dir):
    media = make_media_table(spark, sf_dir).limit(10)
    frames = sample_frames(media, every_n_bytes=64).collect()
    sizes = {
        r.doc_id: len(bytes(r.content)) - _HEADER.size for r in media.collect()
    }
    import math

    want_counts = {d: math.ceil(n / 64) for d, n in sizes.items()}
    got_counts: dict[int, int] = {}
    for r in frames:
        got_counts[r.doc_id] = got_counts.get(r.doc_id, 0) + 1
    assert got_counts == want_counts
    assert all(0.0 <= r.frame_mean <= 255.0 for r in frames)


def test_x15_registered_query_golden(spark, sf_dir):
    """Golden-output check for the registered (rows-only) x15 query
    (VERDICT r3 #7): the fake decoder is deterministic, so the full
    result must reproduce an independently computed fingerprint —
    widths/heights derive from text stats, payload bytes from text
    length, mean intensity from the payload bytes themselves."""
    from etl_spark.extensions.multimodal import x15_media_decode

    rows = x15_media_decode(spark, sf_dir).collect()
    docs = {
        r.doc_id: (len(r.text), r.n_chars)
        for r in load(spark, sf_dir, "documents").select(
            "doc_id", "text", "n_chars"
        ).collect()
    }
    assert len(rows) == len(docs)
    for r in rows:
        text_len, n_chars = docs[r.doc_id]
        assert r.width == text_len % 64 + 1
        assert r.height == n_chars % 48 + 1
        assert r.channels == 3
        assert r.n_pixel_bytes == text_len
        assert 0.0 <= r.mean_intensity <= 255.0

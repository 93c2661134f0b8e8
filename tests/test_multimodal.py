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


def test_dhash_identical_payloads_hamming_zero(spark):
    """Two blobs with identical payloads must share an identical
    dHash; a blob with a locally perturbed payload should stay CLOSE
    in Hamming distance (the perceptual property), and a reversed
    payload should be far."""
    import numpy as np
    import pandas as pd

    from etl_spark.extensions.multimodal import _MAGIC, dhash_media

    rng = np.random.default_rng(7)
    base = rng.integers(0, 256, size=720, dtype=np.uint8)
    perturbed = base.copy()
    perturbed[100:110] += 40  # local edit, wraps mod 256
    header = _HEADER.pack(_MAGIC, 10, 72, 1)
    blobs = {
        0: header + base.tobytes(),
        1: header + base.tobytes(),
        2: header + perturbed.tobytes(),
        3: header + base[::-1].tobytes(),
    }
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": list(blobs),
                "media_type": ["image/synthetic"] * 4,
                "content": list(blobs.values()),
            }
        )
    )
    sig = {r.doc_id: list(r.bands) for r in dhash_media(df).collect()}
    assert all(len(b) == 8 and all(0 <= x <= 255 for x in b) for b in sig.values())

    def ham(a, b):
        return sum(bin(x ^ y).count("1") for x, y in zip(a, b))

    assert sig[0] == sig[1]
    assert ham(sig[0], sig[2]) <= 8  # local edit flips few gradient bits
    assert ham(sig[0], sig[3]) > 16  # reversal scrambles the gradients


def test_dhash_drops_tiny_payloads(spark):
    import pandas as pd

    from etl_spark.extensions.multimodal import (
        X95_MIN_BYTES,
        _MAGIC,
        dhash_media,
    )

    header = _HEADER.pack(_MAGIC, 1, 1, 1)
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [0, 1],
                "media_type": ["image/synthetic"] * 2,
                "content": [
                    header + b"x" * (X95_MIN_BYTES - 1),
                    header + b"x" * X95_MIN_BYTES,
                ],
            }
        )
    )
    got = {r.doc_id for r in dhash_media(df).collect()}
    assert got == {1}


def test_x95_pairs_are_exact_hamming(spark, sf_dir):
    """Every emitted pair's hamming must equal the exact distance
    recomputed from the signatures, respect the threshold, and be
    a subset of what a full all-pairs sweep at the same threshold
    finds (LSH can only miss, never invent)."""
    from etl_spark.extensions.multimodal import (
        X95_MAX_HAMMING,
        dhash_media,
        make_media_table,
        x95_image_neardup,
    )

    sig = {
        r.doc_id: list(r.bands)
        for r in dhash_media(make_media_table(spark, sf_dir)).collect()
    }

    def ham(a, b):
        return sum(bin(x ^ y).count("1") for x, y in zip(a, b))

    got = x95_image_neardup(spark, sf_dir).collect()
    assert len(got) > 0
    for r in got:
        assert r.doc_a < r.doc_b
        assert r.hamming <= X95_MAX_HAMMING
        assert r.hamming == ham(sig[r.doc_a], sig[r.doc_b])
    all_pairs = {
        (a, b)
        for a in sig
        for b in sig
        if a < b and ham(sig[a], sig[b]) <= X95_MAX_HAMMING
    }
    assert {(r.doc_a, r.doc_b) for r in got} <= all_pairs


def test_resize_roundtrip_decodes_and_downsamples(spark, sf_dir):
    """Resized blobs must decode as valid media with the target
    geometry, pixel values must be the exact floor bucket means of
    the source payload, and under-sized sources are dropped."""
    import numpy as np

    from etl_spark.extensions.multimodal import (
        X99_TARGET_H,
        X99_TARGET_W,
        decode_media,
        make_media_table,
        resize_media,
    )

    n_cells = X99_TARGET_W * X99_TARGET_H
    media = make_media_table(spark, sf_dir).limit(20)
    src = {
        r.doc_id: np.frombuffer(
            bytes(r.content), dtype=np.uint8, offset=_HEADER.size
        )
        for r in media.collect()
    }
    resized = resize_media(media)
    out = {r.doc_id: bytes(r.content) for r in resized.collect()}
    assert set(out) == {d for d, p in src.items() if p.size >= n_cells}
    for doc_id, blob in out.items():
        magic, w, h, c = _HEADER.unpack_from(blob, 0)
        assert (w, h, c) == (X99_TARGET_W, X99_TARGET_H, 1)
        px = np.frombuffer(blob, dtype=np.uint8, offset=_HEADER.size)
        assert px.size == n_cells
        payload = src[doc_id]
        n = payload.size
        csum = np.concatenate(([0], np.cumsum(payload, dtype=np.int64)))
        starts = (
            np.arange(n_cells + 1, dtype=np.int64) * n + n_cells - 1
        ) // n_cells
        want = (csum[starts[1:]] - csum[starts[:-1]]) // (
            starts[1:] - starts[:-1]
        )
        assert list(px) == list(want)
    # decode round-trip: the resized blob is valid media
    dec = decode_media(resized).collect()
    assert all(
        (r.width, r.height, r.channels, r.n_pixel_bytes)
        == (X99_TARGET_W, X99_TARGET_H, 1, n_cells)
        for r in dec
    ) and len(dec) == len(out)


def test_frame_stats_match_manual(spark, sf_dir):
    """x100's per-doc frame stats re-derived driver-side from the raw
    blobs for a sample of docs."""
    import numpy as np

    from etl_spark.extensions.multimodal import (
        X100_FRAME_BYTES,
        X100_SILENCE_MEAN,
        make_media_table,
        x100_frame_stats,
    )

    media = make_media_table(spark, sf_dir)
    raw = {
        r.doc_id: np.frombuffer(
            bytes(r.content), dtype=np.uint8, offset=_HEADER.size
        )
        for r in media.limit(15).collect()
    }
    got = {
        r.doc_id: r
        for r in x100_frame_stats(spark, sf_dir).collect()
        if r.doc_id in raw
    }
    assert set(got) == set(raw)
    for doc_id, payload in raw.items():
        means = [
            float(payload[i : i + X100_FRAME_BYTES].mean())
            for i in range(0, payload.size, X100_FRAME_BYTES)
        ]
        r = got[doc_id]
        assert r.n_frames == len(means)
        assert r.min_frame_mean == min(means)
        assert r.max_frame_mean == max(means)
        assert r.n_silent == sum(1 for m in means if m < X100_SILENCE_MEAN)


def test_bucket_stats_property():
    """_bucket_stats must partition the payload exactly (sums of
    sums = total, counts sum to n, every cell non-empty) and agree
    with the naive per-position bucketing cell(pos) = pos*n_cells//n,
    for arbitrary payloads and cell counts."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from etl_spark.extensions.multimodal import _bucket_stats

    @settings(max_examples=200, deadline=None)
    @given(
        data=st.lists(
            st.integers(min_value=0, max_value=255), min_size=1, max_size=600
        ),
        n_cells=st.integers(min_value=1, max_value=96),
    )
    def check(data, n_cells):
        payload = np.array(data, dtype=np.uint8)
        n = payload.size
        if n < n_cells:
            return
        s, cnt = _bucket_stats(payload, n_cells)
        assert s.size == cnt.size == n_cells
        assert int(cnt.sum()) == n
        assert int(s.sum()) == int(payload.astype(np.int64).sum())
        assert (cnt >= 1).all()
        # agreement with the naive definition
        want_s = np.zeros(n_cells, dtype=np.int64)
        want_c = np.zeros(n_cells, dtype=np.int64)
        for pos, byte in enumerate(payload):
            c = pos * n_cells // n
            want_s[c] += int(byte)
            want_c[c] += 1
        assert list(s) == list(want_s) and list(cnt) == list(want_c)

    check()

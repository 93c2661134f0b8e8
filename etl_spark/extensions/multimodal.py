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

from pyspark.sql import DataFrame, SparkSession, Window
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


# --- x95: perceptual image near-dup (dHash + banded LSH) --------------
#
# The image-side twin of the text dedup family: a difference hash
# (dHash — Krawetz's "kind of like a perceptual hash" gradient hash)
# over the decoded pseudo-pixels, banded LSH candidates, exact Hamming
# re-score. The decode stays the x15 mapInPandas tier (swap
# `_decode_blob` for PIL and the hash is real); everything downstream
# is the x24 banded shape, so the 100 TB path is bucket-local — never
# image x image.
#
# dHash here: the payload is cut into an 8x9 grid of byte cells (the
# "resize" — cell boundaries by integer division, so both engines cut
# identically), and bit (r, c) = 1 iff cell (r, c+1)'s mean exceeds
# cell (r, c)'s. Means are compared by integer cross-multiplication
# (s2*cnt1 > s1*cnt2) — no floats anywhere, so the 64-bit hash is
# exact in both engines. The hash is carried as 8 per-row band BYTES
# (0..255) rather than one packed i64: the LSH bands need the bytes
# anyway and bit 63 would overflow signed BIGINT arithmetic in SQL.

X95_GRID_ROWS = 8
X95_GRID_COLS = 9  # 9 cells -> 8 gradient bits per row
X95_MIN_BYTES = X95_GRID_ROWS * X95_GRID_COLS  # smaller "images" skipped
X95_BUCKET_CAP = 64  # the X24 hot-bucket guard, same constant
X95_MAX_HAMMING = 16  # of 64 bits; fixture: random pairs peak at ~28


def _bucket_stats(payload, n_cells: int):
    """Split ``payload`` (uint8 array, len >= n_cells) into n_cells
    contiguous buckets — cell c covers positions [ceil(c*n/n_cells),
    ceil((c+1)*n/n_cells)), the inverse of cell(pos) = pos*n_cells//n
    — and return exact int64 (sums, counts). The shared 'resize' core
    of dHash (x95) and resize_media (x99): integer-only, so every
    engine computes identical cells."""
    import numpy as np

    n = payload.size
    csum = np.concatenate(([0], np.cumsum(payload, dtype=np.int64)))
    starts = (
        np.arange(n_cells + 1, dtype=np.int64) * n + n_cells - 1
    ) // n_cells
    return csum[starts[1:]] - csum[starts[:-1]], starts[1:] - starts[:-1]


def dhash_media(media: DataFrame) -> DataFrame:
    """Per-blob 64-bit dHash as 8 band bytes: (doc_id, bands
    ARRAY<BIGINT>[8]), bands[r] = the 8 gradient bits of grid row r.
    mapInPandas over the binary column (the x15 tier); integer-exact
    per the block comment. Blobs with payloads under ``X95_MIN_BYTES``
    are dropped (a real pipeline would route tiny thumbnails to exact
    byte-hash dedup instead)."""
    header_size = _HEADER.size
    rows_, cols_ = X95_GRID_ROWS, X95_GRID_COLS
    n_cells = rows_ * cols_

    def _dhash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_ids, out_bands = [], []
            for doc_id, blob in zip(pdf["doc_id"], pdf["content"]):
                payload = np.frombuffer(
                    blob, dtype=np.uint8, offset=header_size
                )
                if payload.size < n_cells:
                    continue
                s, cnt = _bucket_stats(payload, n_cells)
                s = s.reshape(rows_, cols_)
                cnt = cnt.reshape(rows_, cols_)
                bit = (
                    s[:, 1:] * cnt[:, :-1] > s[:, :-1] * cnt[:, 1:]
                ).astype(np.int64)
                out_ids.append(doc_id)
                out_bands.append(
                    (bit << np.arange(cols_ - 1, dtype=np.int64)).sum(axis=1)
                )
            # explicit dtypes: an all-dropped batch would otherwise
            # infer float64 columns Arrow can't cast to list<int64>
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out_ids, dtype="int64"),
                    "bands": pd.Series(
                        [list(b) for b in out_bands], dtype="object"
                    ),
                }
            )

    return media.mapInPandas(
        _dhash, schema="doc_id BIGINT, bands ARRAY<BIGINT>"
    )


def dhash_bands(media: DataFrame) -> DataFrame:
    """Long-form dHash band rows (doc_id, band_id, band_byte) — the
    LSH key table x95/x101 join on, and the ``bands_fn`` shape
    ``streaming.neardup.run_neardup_ingest`` consumes, so the SAME
    generic ingest loop that dedups text (MinHash bands) and
    embeddings (hyperplane bands) at the streaming front door also
    dedups images: pass this as ``bands_fn`` over a media-blob
    stream (tested in test_streaming.py)."""
    return dhash_media(media).select(
        "doc_id", F.posexplode("bands").alias("band_id", "band_byte")
    )


def _duck_x95() -> str:
    cap, maxham = X95_BUCKET_CAP, X95_MAX_HAMMING
    rows_, cols_ = X95_GRID_ROWS, X95_GRID_COLS
    n_cells = rows_ * cols_
    return f"""
        WITH b AS (
            SELECT doc_id,
                   CAST(octet_length(encode(text)) AS BIGINT) AS n,
                   hex(encode(text)) AS hx
            FROM documents
            WHERE octet_length(encode(text)) >= {n_cells}
        ),
        bytes AS (
            SELECT doc_id, i - 1 AS pos, n,
                   ('0x' || substr(hx, CAST(2*i-1 AS INT), 2))::BIGINT AS byte
            FROM b, LATERAL (
                SELECT unnest(range(1, CAST(n AS INT) + 1)) AS i
            )
        ),
        cells AS (
            SELECT doc_id, (pos * {n_cells}) // n AS cell,
                   SUM(byte) AS s, COUNT(*) AS cnt
            FROM bytes GROUP BY doc_id, (pos * {n_cells}) // n
        ),
        grid AS (
            SELECT doc_id, cell // {cols_} AS r, cell % {cols_} AS c, s, cnt
            FROM cells
        ),
        bits AS (
            SELECT a.doc_id, a.r AS band_id, a.c AS c,
                   CASE WHEN b.s * a.cnt > a.s * b.cnt THEN 1 ELSE 0 END
                     AS bit
            FROM grid a JOIN grid b
              ON a.doc_id = b.doc_id AND a.r = b.r AND b.c = a.c + 1
            WHERE a.c < {cols_ - 1}
        ),
        bands AS (
            SELECT doc_id, band_id,
                   CAST(SUM(bit * (1 << CAST(c AS INT))) AS BIGINT)
                     AS band_byte
            FROM bits GROUP BY doc_id, band_id
        ),
        buckets AS (
            SELECT band_id, band_byte, COUNT(*) AS n_docs
            FROM bands GROUP BY band_id, band_byte
        ),
        cand AS (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM bands a
            JOIN bands b
              ON a.band_id = b.band_id AND a.band_byte = b.band_byte
             AND a.doc_id < b.doc_id
            JOIN buckets k
              ON k.band_id = a.band_id AND k.band_byte = a.band_byte
            WHERE k.n_docs BETWEEN 2 AND {cap}
        ),
        ham AS (
            SELECT c.doc_a, c.doc_b,
                   CAST(SUM(bit_count(xor(x.band_byte, y.band_byte)))
                        AS BIGINT) AS hamming
            FROM cand c
            JOIN bands x ON x.doc_id = c.doc_a
            JOIN bands y ON y.doc_id = c.doc_b AND y.band_id = x.band_id
            GROUP BY c.doc_a, c.doc_b
        )
        SELECT doc_a, doc_b, hamming
        FROM ham WHERE hamming <= {maxham}
    """


@register(
    "x95_image_neardup",
    oracle=_duck_x95(),
    tags=("multimodal", "dedup"),
)
def x95_image_neardup(spark: SparkSession, sf: str) -> DataFrame:
    """Perceptual image near-dup: blobs → mapInPandas dHash (8 band
    bytes) → banded LSH candidates (docs sharing any (band, byte)
    bucket, ``X95_BUCKET_CAP`` hot-bucket guard) → exact 64-bit
    Hamming re-score, keeping pairs ≤ ``X95_MAX_HAMMING``. On the
    synthetic corpus low-Hamming pairs track token-Jaccard ~0.6
    (measured), i.e. the hash finds genuinely similar payloads, not
    bucket noise.

    Scale shape (the x24 contract, image-side): the hash is one
    scan-local Arrow pass over the blobs; the only shuffles are keyed
    on (band_id, band_byte) — bucket-local candidate expansion with a
    cap, never image x image — then two vec_id-keyed joins to fetch 8
    band bytes per side for the Hamming sum (zip_with + bit_count,
    all codegen). At 100 TB the re-score join input is
    candidate-sized, and the decode/hash pass would ride the existing
    x15 decode of the corpus (one pass emits metadata AND hash).

    KEY-SPACE HONESTY: 8 bands x 256 byte values = 2,048 distinct
    bucket keys, so expected occupancy is ~n/256 per band — beyond
    ~256*CAP/8 ≈ tens of thousands of images the random buckets
    themselves exceed X95_BUCKET_CAP and the cap starts dropping
    EVERYTHING (recall → 0), not just hot boilerplate. The 64-bit
    hash is the fixture-honest demo; the production contract is a
    WIDER hash with the same plan shape — pHash at 256 bits banded
    into 16-bit keys gives 16 x 65,536 keys (multi-index hashing,
    Norouzi et al. '12), and occupancy stays bounded into the
    billions. Only the `_dhash` kernel and the band split change;
    every shuffle key and cap stays as written."""
    sigs = dhash_media(make_media_table(spark, sf))
    # two consuming branches (bucket grouping + both re-score sides)
    # and Catalyst does not CSE reused DataFrames — persist so the
    # Arrow dHash pass runs once (the x89 lesson)
    sigs = sigs.persist()
    bands = sigs.select(
        "doc_id", F.posexplode("bands").alias("band_id", "band_byte")
    )
    buckets = (
        bands.groupBy("band_id", "band_byte")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("ids"))
        .filter((F.size("ids") > 1) & (F.size("ids") <= X95_BUCKET_CAP))
    )
    pair_expand = (
        "flatten(transform(ids, (x, i) -> "
        "transform(slice(ids, i + 2, size(ids) - i - 1), "
        "y -> struct(x AS doc_a, y AS doc_b))))"
    )
    cand = (
        buckets.select(F.explode(F.expr(pair_expand)).alias("p"))
        .select("p.doc_a", "p.doc_b")
        .distinct()
    )
    sa = sigs.select(F.col("doc_id").alias("doc_a"), F.col("bands").alias("ba"))
    sb = sigs.select(F.col("doc_id").alias("doc_b"), F.col("bands").alias("bb"))
    ham = F.expr(
        "aggregate(zip_with(ba, bb, (x, y) -> bit_count(x ^ y)), "
        "0L, (acc, v) -> acc + v)"
    )
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", ham.alias("hamming"))
        .filter(F.col("hamming") <= X95_MAX_HAMMING)
    )


def _duck_x104() -> str:
    """Recursive-CTE transitive closure over the x95 pair graph —
    the image twin of dedup._duck_dup_clusters (same reach CTE, the
    x95 Hamming pairs as edges)."""
    return f"""
        WITH RECURSIVE pairs AS ({_duck_x95()}),
        edges AS (
            SELECT doc_a AS s, doc_b AS d FROM pairs
            UNION ALL
            SELECT doc_b AS s, doc_a AS d FROM pairs
        ),
        verts AS (
            SELECT DISTINCT s AS doc_id FROM edges
        ),
        reach(doc_id, lbl) AS (
            SELECT doc_id, doc_id FROM verts
            UNION
            SELECT e.s, r.lbl FROM edges e JOIN reach r ON r.doc_id = e.d
        )
        SELECT doc_id,
               CAST(MIN(lbl) AS BIGINT) AS cluster_id,
               (doc_id = MIN(lbl)) AS is_canonical
        FROM reach
        GROUP BY doc_id
    """


@register(
    "x104_image_dup_clusters",
    oracle=_duck_x104(),
    tags=("multimodal", "dedup"),
)
def x104_image_dup_clusters(spark: SparkSession, sf: str) -> DataFrame:
    """Image duplicate CLUSTERS — the step that turns x95's pairwise
    Hamming matches into keep/drop decisions, completing the image
    family's pairs → clusters symmetry with text (x04 → x29): each
    connected component of the near-dup pair graph is one cluster,
    cluster_id = min doc_id, the canonical (kept) image is the one
    whose id IS the cluster id. Reuses dedup.connected_components
    verbatim (hash-to-min label propagation, per-round cost keyed on
    the pair list — only images IN a dup pair participate; pass
    checkpoint_dir for durable lineage truncation at cluster scale).
    """
    from etl_spark.extensions.dedup import connected_components

    pairs = x95_image_neardup(spark, sf).select("doc_a", "doc_b")
    labels = connected_components(pairs)
    return labels.select(
        "doc_id",
        F.col("lbl").alias("cluster_id"),
        (F.col("doc_id") == F.col("lbl")).alias("is_canonical"),
    )


def _duck_x101() -> str:
    """x95's band CTEs reused for the incremental probe: new batch =
    odd doc_id, seen index = even doc_id."""
    base = _duck_x95()
    # keep everything up to (and including) the bands CTE, then swap
    # the pairing for the delta probe
    cut = base.index("buckets AS (")
    return (
        base[:cut]
        + f"""new_side AS (
            SELECT doc_id, band_id, band_byte FROM bands
            WHERE doc_id % 2 = 1
        ),
        seen AS (
            SELECT doc_id AS seen_id, band_id, band_byte FROM bands
            WHERE doc_id % 2 = 0
        ),
        seen_ok AS (
            SELECT seen_id, band_id, band_byte FROM (
                SELECT seen_id, band_id, band_byte,
                       COUNT(*) OVER (PARTITION BY band_id, band_byte)
                         AS occ
                FROM seen
            ) WHERE occ <= {X95_BUCKET_CAP}
        )
        SELECT n.doc_id,
               CAST(COUNT(DISTINCT s.seen_id) AS BIGINT) AS n_seen_matches
        FROM new_side n JOIN seen_ok s
          ON n.band_id = s.band_id AND n.band_byte = s.band_byte
        GROUP BY n.doc_id
    """
    )


@register(
    "x101_incremental_image_neardup",
    oracle=_duck_x101(),
    tags=("multimodal", "dedup", "incremental"),
)
def x101_incremental_image_neardup(spark: SparkSession, sf: str) -> DataFrame:
    """Ingestion-time image near-dup: a NEW batch of images (odd
    doc_id — today's crawl) probed against the SEEN corpus' stored
    dHash band index (even doc_id) — each new image reports how many
    distinct stored images share a band bucket with it. The image
    twin of x37 (MinHash text) and x44 (embedding bands), completing
    the incremental family across all three modalities: dedup a delta
    WITHOUT re-pairing the corpus — the seen-side band table is
    computed once, stored, and only probed per batch.

    Scale: one equi-join keyed on (band_id, band_byte) — new side is
    batch-sized, seen side is the persisted index with the
    X95_BUCKET_CAP hot-bucket guard applied — then one count-distinct
    shuffle on the new doc_id. The cap is LOAD-BEARING here, not just
    boilerplate hygiene: an 8-bit band key space saturates at tens of
    thousands of images (the x95 key-space note), at which point
    uncapped buckets make the probe join quadratic — measured 57+ s
    at the 50k-doc quiet scale uncapped vs bounded with the cap. The
    x95 production contract (wider hash, 16-bit band keys) keeps real
    near-dup buckets under the cap into the billions."""
    bands = dhash_bands(make_media_table(spark, sf)).persist()
    new = bands.filter(F.col("doc_id") % 2 == 1)
    seen = bands.filter(F.col("doc_id") % 2 == 0).select(
        F.col("doc_id").alias("seen_id"), "band_id", "band_byte"
    )
    occ = Window.partitionBy("band_id", "band_byte")
    seen_ok = (
        seen.withColumn("occ", F.count(F.lit(1)).over(occ))
        .filter(F.col("occ") <= X95_BUCKET_CAP)
        .drop("occ")
    )
    return (
        new.join(seen_ok, ["band_id", "band_byte"])
        .groupBy("doc_id")
        .agg(F.count_distinct("seen_id").alias("n_seen_matches"))
    )


# --- x99: media resize (bucket-mean downsample) -----------------------

X99_TARGET_W = 8
X99_TARGET_H = 6  # 8x6 single-channel thumbnail = 48 payload bytes


def resize_media(
    media: DataFrame, target_w: int = X99_TARGET_W, target_h: int = X99_TARGET_H
) -> DataFrame:
    """DETERMINISTIC FAKE RESIZE — the last of the brief's four media
    ops (decode / feature-extract / frame-sample / RESIZE), standing
    in for PIL's Image.resize the way `_decode_blob` stands in for
    Image.open: an area-style downsample where each output pixel is
    the FLOOR MEAN (integer sum DIV count) of its contiguous payload
    bucket, written back as a new blob with an updated header
    (target_w x target_h, 1 channel). Output blobs round-trip through
    `decode_media` unchanged — the thumbnail-pipeline composition.
    Blobs with fewer payload bytes than output pixels are dropped
    (the x95 tiny-image rule). Arrow-batched mapInPandas, scan-local,
    all integer ops — both engines derive identical pixels."""
    header_size = _HEADER.size
    n_cells = target_w * target_h
    # packed once outside the closure — capturing the Struct itself
    # would fail pickling (the sample_frames lesson)
    out_header = _HEADER.pack(_MAGIC, target_w, target_h, 1)

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_ids, out_types, out_blobs = [], [], []
            for doc_id, mt, blob in zip(
                pdf["doc_id"], pdf["media_type"], pdf["content"]
            ):
                payload = np.frombuffer(
                    blob, dtype=np.uint8, offset=header_size
                )
                if payload.size < n_cells:
                    continue
                s, cnt = _bucket_stats(payload, n_cells)
                px = (s // cnt).astype(np.uint8)  # floor mean, 0..255
                out_ids.append(doc_id)
                out_types.append(mt)
                out_blobs.append(out_header + px.tobytes())
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out_ids, dtype="int64"),
                    "media_type": pd.Series(out_types, dtype="object"),
                    "content": pd.Series(out_blobs, dtype="object"),
                }
            )

    return media.mapInPandas(_resize, schema=MEDIA_SCHEMA)


def _duck_x99() -> str:
    w, h = X99_TARGET_W, X99_TARGET_H
    n_cells = w * h
    return f"""
        WITH b AS (
            SELECT doc_id,
                   CAST(octet_length(encode(text)) AS BIGINT) AS n,
                   hex(encode(text)) AS hx
            FROM documents
            WHERE octet_length(encode(text)) >= {n_cells}
        ),
        bytes AS (
            SELECT doc_id, i - 1 AS pos, n,
                   ('0x' || substr(hx, CAST(2*i-1 AS INT), 2))::BIGINT AS byte
            FROM b, LATERAL (
                SELECT unnest(range(1, CAST(n AS INT) + 1)) AS i
            )
        ),
        cells AS (
            SELECT doc_id, (pos * {n_cells}) // n AS cell,
                   SUM(byte) // COUNT(*) AS pxv
            FROM bytes GROUP BY doc_id, (pos * {n_cells}) // n
        )
        SELECT doc_id,
               'image/synthetic' AS media_type,
               CAST({w} AS INT) AS width,
               CAST({h} AS INT) AS height,
               CAST(1 AS INT) AS channels,
               CAST({n_cells} AS BIGINT) AS n_pixel_bytes,
               CAST(SUM(pxv) AS DOUBLE) / {n_cells} AS mean_intensity
        FROM cells GROUP BY doc_id
    """


@register(
    "x99_media_resize",
    oracle=_duck_x99(),
    tags=("multimodal",),
)
def x99_media_resize(spark: SparkSession, sf: str) -> DataFrame:
    """Thumbnail pipeline: blobs → resize (bucket-mean downsample to
    {W}x{H}x1) → decode — two Arrow tiers composed, proving the
    resized blobs are themselves valid media the rest of the family
    consumes. The oracle re-derives every thumbnail pixel in SQL
    (integer floor-mean per bucket) and checks the decoded header
    fields and the thumbnail's mean intensity per doc. Scale: both
    tiers are scan-local batch UDFs; no shuffle anywhere."""
    return decode_media(resize_media(make_media_table(spark, sf)))


# --- x100: frame-level stats (the audio/video analysis shape) ---------

X100_FRAME_BYTES = 64
X100_SILENCE_MEAN = 100.0  # frames quieter than this count as silent


def _duck_x100() -> str:
    fb, th = X100_FRAME_BYTES, X100_SILENCE_MEAN
    return f"""
        WITH b AS (
            SELECT doc_id,
                   CAST(octet_length(encode(text)) AS BIGINT) AS n,
                   hex(encode(text)) AS hx
            FROM documents
        ),
        bytes AS (
            SELECT doc_id, i - 1 AS pos,
                   ('0x' || substr(hx, CAST(2*i-1 AS INT), 2))::BIGINT AS byte
            FROM b, LATERAL (
                SELECT unnest(range(1, CAST(n AS INT) + 1)) AS i
            )
        ),
        frames AS (
            SELECT doc_id, pos // {fb} AS frame_idx,
                   CAST(SUM(byte) AS DOUBLE) / COUNT(*) AS fmean
            FROM bytes GROUP BY doc_id, pos // {fb}
        )
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_frames,
               MIN(fmean) AS min_frame_mean,
               MAX(fmean) AS max_frame_mean,
               CAST(SUM(CASE WHEN fmean < {th} THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_silent,
               ROUND(CAST(SUM(CASE WHEN fmean < {th} THEN 1 ELSE 0 END)
                          AS DOUBLE) / COUNT(*), 6) AS silent_fraction
        FROM frames GROUP BY doc_id
    """


@register(
    "x100_frame_stats",
    oracle=_duck_x100(),
    tags=("multimodal",),
)
def x100_frame_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Frame-level media analysis — the silence-detection/energy
    report an audio pipeline runs over decoded frames, here over the
    frame-sampling tier's output so that tier (1→N row fan-out from a
    binary column) finally carries a driver-checked query of its own:
    per doc, frame count, min/max frame energy, and the count and
    fraction of 'silent' frames (mean below X100_SILENCE_MEAN). Every
    per-frame mean is one exact-integer sum divided once (IEEE-
    identical in both engines); the per-doc stats are min/max/count —
    order-independent aggregates, so no float-summation-order hazard
    (the reason this reports min/max/silence rather than avg-of-avgs).

    Scale: the frame fan-out is scan-local inside the Arrow batch
    tier; the only shuffle is the per-doc aggregate keyed on doc_id,
    with map-side partial min/max/count."""
    frames = sample_frames(
        make_media_table(spark, sf), every_n_bytes=X100_FRAME_BYTES
    )
    silent = F.when(
        F.col("frame_mean") < X100_SILENCE_MEAN, 1
    ).otherwise(0)
    return frames.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_frames"),
        F.min("frame_mean").alias("min_frame_mean"),
        F.max("frame_mean").alias("max_frame_mean"),
        F.sum(silent).cast("bigint").alias("n_silent"),
        F.round(
            F.sum(silent).cast("double") / F.count(F.lit(1)),
            6,
        ).alias("silent_fraction"),
    )


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

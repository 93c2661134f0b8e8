"""Round-14 additions: x139 clustered-embedding recall is MEANINGFUL
(VERDICT r13 #3), the DECIMAL(38,0) ppm-numerator idiom survives
int64-overflow scale (ADVICE r13 #2), and the decon ingest hook fires
with faithful counts on checkpoint-loss replays of committed batches
(ADVICE r13 #3).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_spark.tables import load


def test_x139_recall_is_meaningful(spark, sf_dir):
    """x132's gated value is the probed-cell fraction (~0.31) because
    the fixture embeddings are near-random; x139's clustered view
    must gate REAL retrieval quality. VERDICT r13 #3 sets the bar at
    mean recall >= 0.6; measured 1.0 at sf0.001/sf0.01 (the driver's
    scales) and ~0.58 at sf0.1 (two seed cells per cluster there, so
    the 20-row ADC shortlist covers only part of each ~62-point
    cluster — documented, not gated)."""
    from etl_spark.registry import all_specs

    rows = all_specs()["x139_ann_recall_clustered"].fn(spark, sf_dir).collect()
    assert len(rows) == 128
    mean_recall = sum(r.recall_at_5 for r in rows) / len(rows)
    assert mean_recall >= 0.6, mean_recall


def test_x139_clusters_are_separated(spark, sf_dir):
    """The derived view's premise: inter-cluster center distance
    dwarfs the 0.02-scaled intra-cluster admixture — otherwise the
    'clustered' regime is a fiction and x139 gates nothing meaningful.
    Checked from the module constants, no Spark needed, but also
    sanity-check the view itself: every vector sits far closer to its
    own cluster's center than to any other."""
    import math

    from etl_spark.extensions.similarity import (
        _CL_CENTERS,
        _CLUSTER_K,
        _CLUSTER_NOISE,
        clustered_embedding_view,
    )

    min_sep = min(
        math.dist(_CL_CENTERS[i], _CL_CENTERS[j])
        for i in range(_CLUSTER_K)
        for j in range(i + 1, _CLUSTER_K)
    )
    emb = load(spark, sf_dir, "embeddings")
    max_norm = (
        emb.select(
            F.sqrt(
                F.aggregate(
                    F.col("embedding").cast("array<double>"),
                    F.lit(0.0),
                    lambda acc, x: acc + x * x,
                )
            ).alias("n")
        )
        .agg(F.max("n"))
        .first()[0]
    )
    # two same-cluster points differ by <= 2*noise*max_norm; any
    # cross-cluster pair differs by >= min_sep - 2*noise*max_norm
    assert min_sep > 10 * 2 * _CLUSTER_NOISE * max_norm, (min_sep, max_norm)

    cl = clustered_embedding_view(emb).collect()
    import numpy as np

    centers = np.array(_CL_CENTERS)
    for r in cl[:50]:
        d = np.linalg.norm(centers - np.array(r.embedding), axis=1)
        assert d.argmin() == (r.vec_id // 2) % _CLUSTER_K


def test_ppm_decimal_numerator_does_not_wrap(spark):
    """ADVICE r13 #2: the ppm numerator idiom must agree with exact
    integer arithmetic PAST int64 range, where the old bare-int64
    multiply wrapped (ANSI off) or errored (ANSI on). Feed cents sums
    around 9.3e15 (1e6x overflows int64 at ~9.2e18) through the exact
    expression x134/x135/x138/x140/e16 now use and compare to
    Python's arbitrary-precision result."""
    cases = [
        (9_300_000_000_000_000, 13_000_000_000_000_000),
        (9_223_372_036_854_775, 9_223_372_036_854_776),
        (123_456_789_012_345_678, 900_000_000_000_000_000),
    ]
    df = spark.createDataFrame(
        [(a, b) for a, b in cases], "num bigint, den bigint"
    ).select(
        "num",
        "den",
        F.expr(
            "CAST(CAST(1000000 AS DECIMAL(38,0)) * num DIV den AS BIGINT)"
        ).alias("ppm"),
    )
    got = {(r.num, r.den): r.ppm for r in df.collect()}
    for a, b in cases:
        assert got[(a, b)] == (1_000_000 * a) // b, (a, b)
    # and the declared type stays BIGINT — the driver hash compares
    # declared types, so a decimal leak would hash-red every oracle
    assert dict(df.dtypes)["ppm"] == "bigint"


def test_decon_replay_hook_reports_committed_counts(spark, sf_dir, tmp_path):
    """ADVICE r13 #3: a checkpoint-loss replay of a fully committed
    batch skips the recompute but must still fire on_batch with the
    counts that actually landed (read back from the committed
    outputs), so an observability sum over the hook matches reality
    across restarts."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from etl_spark.extensions.pipeline import EVAL_SOURCE
    from etl_spark.streaming.neardup import build_decon_index, run_decon_ingest

    docs = load(spark, sf_dir, "documents").select("doc_id", "source")
    emb = load(spark, sf_dir, "embeddings")
    joined = emb.join(docs, emb.vec_id == docs.doc_id)
    build_decon_index(
        joined.filter(F.col("source") == EVAL_SOURCE).select(
            "vec_id", "embedding"
        ),
        str(tmp_path / "eval_idx"),
    )
    train = (
        joined.filter(F.col("source") != EVAL_SOURCE)
        .select("vec_id", "embedding")
        .limit(150)
        .collect()
    )
    src = tmp_path / "src"
    src.mkdir()
    pq.write_table(
        pa.table(
            {
                "vec_id": [r.vec_id for r in train],
                "embedding": [list(r.embedding) for r in train],
            }
        ),
        str(src / "b0.parquet"),
    )

    def run(tag, sink):
        stream = (
            spark.readStream.schema("vec_id bigint, embedding array<double>")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        q = run_decon_ingest(
            stream,
            id_col="vec_id",
            emb_col="embedding",
            index_path=str(tmp_path / "eval_idx"),
            out_path=str(tmp_path / "clean"),
            flagged_path=str(tmp_path / "flagged"),
            checkpoint=str(tmp_path / f"ckpt_{tag}"),
            on_batch=lambda b, n_in, n_fl: sink.append((b, n_in, n_fl)),
        )
        q.awaitTermination(120)

    first: list[tuple[int, int, int]] = []
    run("first", first)
    assert first and first[0][1] == len(train)

    # fresh checkpoint => the committed batch is skipped, but the hook
    # must still report the SAME counts, read back from the outputs
    replay: list[tuple[int, int, int]] = []
    run("replay", replay)
    assert replay == first


def test_spark_side_ppm_numerators_use_decimal():
    """Source lint cementing the ADVICE-r13 fix repo-wide: every
    Spark-side ppm numerator (a `1000000 *` multiply feeding an
    integral DIV inside an F.expr / selectExpr string) must multiply
    in DECIMAL(38,0) — a bare int64 multiply silently wraps (ANSI
    off) or errors (ANSI on) past ~9.2e12 while the DuckDB oracle's
    HUGEINT keeps going. Oracle SQL strings are exempt (DuckDB
    integer division is spelled `//`, never `DIV`, so the pattern
    below cannot match them)."""
    import glob
    import os
    import re

    root = os.path.join(os.path.dirname(__file__), "..", "etl_spark")
    offenders = []
    for path in glob.glob(os.path.join(root, "**", "*.py"), recursive=True):
        for i, line in enumerate(open(path, encoding="utf-8"), 1):
            if "1000000 *" in line and "DECIMAL(38,0)" not in line:
                # join the next two lines: the multiply and its DIV may
                # be split across an F.expr string continuation
                ctx = line + "".join(
                    l
                    for _, l in zip(
                        range(2),
                        open(path, encoding="utf-8").readlines()[i:],
                    )
                )
                if re.search(r"\bDIV\b", ctx):
                    offenders.append(f"{os.path.relpath(path, root)}:{i}")
    assert not offenders, (
        "bare int64 ppm numerators feeding DIV (use the "
        f"CAST(1000000 AS DECIMAL(38,0)) idiom): {offenders}"
    )

"""Ingestion-time data selection — the DSIR gate (x62/x64) running at
the streaming front door, beside the near-dup filters in
``streaming/neardup.py``.

The importance model (per-bucket smoothed log ratios, x62's
``_dsir_model``) is estimated ONCE from a curated seen corpus and
written as a ``DSIR_BUCKETS``-row parquet table; each micro-batch is
then scored with one broadcast join against that table and rows whose
log importance weight clears the threshold are accepted. The corpus
is never re-read per batch — exactly x64's delta-probe shape, wired
into ``foreachBatch``.

Exactly-once follows the file-sink commit pattern of
``neardup.py``: each batch writes under a ``batch-<id>`` subdirectory
and a replayed batch that finds its directory is a no-op. Read the
accepted output with ``recursiveFileLookup``.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from etl_spark.extensions.resampling import (
    DSIR_BUCKETS,
    _bigram_bucket_feats,
    _dsir_model,
)


def build_dsir_model(docs: DataFrame, model_path: str) -> int:
    """Estimate the importance model from a seen corpus of
    (doc_id, lang, text) rows and persist it: (b, lratio,
    unseen_lratio), at most ``DSIR_BUCKETS`` rows. ``unseen_lratio``
    (the add-one-smoothed ratio for a bucket the corpus never
    produced) is carried on every row so scoring needs no second
    table. Returns the row count written."""
    lr, tot = _dsir_model(_bigram_bucket_feats(docs))
    unseen = F.ln(
        F.lit(1).cast("double") / (F.col("nt") + DSIR_BUCKETS).cast("double")
    ) - F.ln(
        F.lit(1).cast("double") / (F.col("nr") + DSIR_BUCKETS).cast("double")
    )
    model = lr.crossJoin(F.broadcast(tot)).select(
        "b", "lratio", unseen.alias("unseen_lratio")
    )
    model.write.mode("overwrite").parquet(model_path)
    return model.sparkSession.read.parquet(model_path).count()


def dsir_score_batch(batch_df: DataFrame, model_df: DataFrame) -> DataFrame:
    """Score one batch of (doc_id, lang, text) rows against a stored
    model: every batch column plus ``logw`` (rounded to 6, x62/x64's
    cross-engine convention) and ``selected`` (logw > 0). Featureless
    docs (fewer than two words — no bigrams) score 0 and are NOT
    selected: a doc the model cannot see carries no evidence it is
    target-like. Unseen buckets take the model's smoothed
    ``unseen_lratio`` via the LEFT join — an inner join would drop
    them and misweight every partially-novel doc (x64's hazard)."""
    feats = _bigram_bucket_feats(batch_df)
    default = model_df.agg(F.min("unseen_lratio").alias("unseen"))
    scored = (
        feats.join(F.broadcast(model_df.select("b", "lratio")), "b", "left")
        .crossJoin(F.broadcast(default))
        .groupBy("doc_id")
        .agg(
            F.round(
                F.sum(F.coalesce(F.col("lratio"), F.col("unseen"))), 6
            ).alias("logw")
        )
    )
    return (
        batch_df.join(scored, "doc_id", "left")
        .withColumn("logw", F.coalesce(F.col("logw"), F.lit(0.0)))
        .withColumn("selected", F.col("logw") > 0)
    )


def run_dsir_gate(
    stream_df: DataFrame,
    model_path: str,
    out_path: str,
    checkpoint: str | None = None,
    available_now: bool = True,
    on_batch: Callable[[int, int, int], Any] | None = None,
) -> StreamingQuery:
    """``foreachBatch`` sink: rows whose importance weight clears the
    gate land under ``out_path/batch-<id>`` (with their ``logw``, so
    downstream resampling can weight by it); the rest are dropped.
    ``on_batch(batch_id, n_in, n_kept)`` is the observability hook.
    The model is loaded once, outside the batch loop — per batch the
    only work is the broadcast score join (batch-sized, corpus- and
    model-size-independent)."""
    spark = stream_df.sparkSession
    model_df = spark.read.parquet(model_path)

    def _gate(batch_df: DataFrame, batch_id: int) -> None:
        out_dir = os.path.join(out_path, f"batch-{batch_id}")
        if os.path.isdir(out_dir):
            return  # replayed batch: commit already on disk
        scored = dsir_score_batch(batch_df, model_df)
        kept = scored.filter("selected").drop("selected").persist()
        n_kept = kept.count()
        kept.write.mode("overwrite").parquet(out_dir)
        kept.unpersist()
        if on_batch is not None:
            on_batch(batch_id, batch_df.count(), n_kept)

    writer = stream_df.writeStream.foreachBatch(_gate).outputMode("update")
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()

"""M5 streaming tests: file-stream source, watermarked windows,
foreachBatch threshold monitor, incremental (exactly-once-per-file)
processing."""

from __future__ import annotations

import shutil

import pytest

from etl_spark.alerting import CollectingNotifier
from etl_spark.streaming import (
    run_threshold_monitor,
    stream_events,
    windowed_event_counts,
)
from etl_spark.tables import load


@pytest.fixture()
def event_dir(spark, sf_dir, tmp_path):
    d = tmp_path / "events_in"
    d.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", d / "part-0.parquet")
    return d


def test_streaming_matches_batch_windows(spark, sf_dir, event_dir, tmp_path):
    """Drain the event feed with availableNow and compare the windowed
    result against the batch twin (s01 without the per-type agg
    differences)."""
    stream = windowed_event_counts(stream_events(spark, str(event_dir)))
    sink = f"stream_out_{abs(hash(str(tmp_path))) % 10**8}"
    q = (
        stream.writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt_win"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (str(r.win_start), r.event_type): (r.n_events, round(r.sum_value, 2))
        for r in spark.sql(f"SELECT * FROM {sink}").collect()
    }
    from pyspark.sql import functions as F

    batch = (
        load(spark, sf_dir, "events")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
        .select(F.col("window.start").alias("win_start"), "event_type", "n_events", "sum_value")
    )
    want = {
        (str(r.win_start), r.event_type): (r.n_events, round(r.sum_value, 2))
        for r in batch.collect()
    }
    assert got == want


def test_threshold_monitor_fires_and_drains_incrementally(
    spark, sf_dir, event_dir, tmp_path
):
    notifier = CollectingNotifier()
    batches: list[tuple[int, int]] = []
    q = run_threshold_monitor(
        stream_events(spark, str(event_dir)),
        notifier,
        condition="rows_gt",
        threshold=0,
        filter_expr="event_type = 'error'",
        checkpoint=str(tmp_path / "ckpt_mon"),
        on_batch=lambda bid, n: batches.append((bid, n)),
    )
    q.awaitTermination(120)
    assert len(notifier.sent) == 1
    total_errors = load(spark, sf_dir, "events").filter("event_type = 'error'").count()
    assert sum(n for _, n in batches) == total_errors

    # incremental semantics: draining again with the same checkpoint
    # processes NOTHING new (vs. the reference's full re-scan per tick)
    batches.clear()
    q2 = run_threshold_monitor(
        stream_events(spark, str(event_dir)),
        notifier,
        condition="rows_gt",
        threshold=0,
        filter_expr="event_type = 'error'",
        checkpoint=str(tmp_path / "ckpt_mon"),
        on_batch=lambda bid, n: batches.append((bid, n)),
    )
    q2.awaitTermination(120)
    assert sum(n for _, n in batches) == 0
    assert len(notifier.sent) == 1  # no duplicate alert

    # new file lands → only ITS rows are processed
    shutil.copy(f"{sf_dir}/events.parquet", event_dir / "part-1.parquet")
    q3 = run_threshold_monitor(
        stream_events(spark, str(event_dir)),
        notifier,
        condition="rows_gt",
        threshold=0,
        filter_expr="event_type = 'error'",
        checkpoint=str(tmp_path / "ckpt_mon"),
        on_batch=lambda bid, n: batches.append((bid, n)),
    )
    q3.awaitTermination(120)
    assert sum(n for _, n in batches) == total_errors
    assert len(notifier.sent) == 2


def test_stateful_sessionize_across_restarts(spark, sf_dir, tmp_path):
    """applyInPandasWithState gap-sessionizer: feed the event feed in
    two time-ordered drops with a query restart between them (state
    recovered from the checkpoint), and check every CLOSED session
    matches the batch window computation. Each user's final session
    stays open in state and must NOT be emitted."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from etl_spark.streaming import sessionize_stream

    GAP = 1800
    ev = (
        load(spark, sf_dir, "events")
        .select("user_id", F.col("ts").cast("timestamp").alias("ts"))
    )
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).first()
    mid = lo + (hi - lo) / 2

    watch = tmp_path / "sess_in"
    watch.mkdir()
    ckpt = str(tmp_path / "ckpt_sess")
    collected = []

    def _drop(df, name):
        stage = tmp_path / f"stage_{name}"
        df.coalesce(1).write.mode("overwrite").parquet(str(stage))
        part = next(stage.glob("part-*.parquet"))
        shutil.copy(part, watch / f"{name}.parquet")

    def _drain():
        stream = spark.readStream.schema("user_id BIGINT, ts TIMESTAMP").parquet(
            str(watch)
        )
        q = (
            sessionize_stream(stream, gap_seconds=GAP)
            .writeStream.foreachBatch(
                lambda bdf, bid: collected.extend(bdf.collect())
            )
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    _drop(ev.filter(F.col("ts") <= F.lit(mid)), "first")
    _drain()
    n_after_first = len(collected)
    _drop(ev.filter(F.col("ts") > F.lit(mid)), "second")
    _drain()
    assert len(collected) > n_after_first > 0

    # batch ground truth at µs precision, minus each user's last session
    w = Window.partitionBy("user_id").orderBy("ts")
    gap_us = F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
    sid = F.sum(
        F.when(gap_us.isNull() | (gap_us > GAP * 1_000_000), 1).otherwise(0)
    ).over(w.rowsBetween(Window.unboundedPreceding, 0))
    sessions = (
        ev.withColumn("sid", sid)
        .groupBy("user_id", "sid")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
    wmax = Window.partitionBy("user_id")
    want = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in sessions.withColumn("max_sid", F.max("sid").over(wmax))
        .filter("sid < max_sid")
        .collect()
    }
    got = {
        (r.user_id, r.session_start, r.session_end, r.n_events) for r in collected
    }
    assert got == want


def test_dedup_stream_drops_redelivered_events(spark, sf_dir, event_dir, tmp_path):
    """The same event file delivered twice (at-least-once source):
    dedup_stream emits each event_id exactly once."""
    from etl_spark.streaming import dedup_stream, stream_events

    seen: list = []

    def _drain():
        q = (
            dedup_stream(stream_events(spark, str(event_dir)), ["event_id"])
            .writeStream.foreachBatch(
                lambda bdf, bid: seen.extend(r.event_id for r in bdf.collect())
            )
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt_dedup"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    _drain()
    n_events = load(spark, sf_dir, "events").count()
    assert len(seen) == len(set(seen)) == n_events

    # redeliver the identical file → nothing new emitted
    shutil.copy(f"{sf_dir}/events.parquet", event_dir / "redelivered.parquet")
    _drain()
    assert len(seen) == n_events, "re-delivered events must be dropped"

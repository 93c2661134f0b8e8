"""Plan-fingerprint result cache (plans/result_cache.py)."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from etl_spark.plans.result_cache import (
    cached,
    clear_result_cache,
    evict,
    plan_fingerprint,
)


def _write_src(d, vals):
    pq.write_table(
        pa.table({"k": pa.array(vals, pa.int64())}), str(d / "part-0.parquet")
    )


def _q(spark, src):
    return (
        spark.read.parquet(str(src))
        .filter(F.col("k") % 2 == 0)
        .agg(F.count(F.lit(1)).alias("n"), F.sum("k").alias("s"))
    )


def test_hit_serves_from_cache_not_source(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    _write_src(src, list(range(10)))
    cache = str(tmp_path / "rc")

    first = cached(_q(spark, src), cache)
    assert first.collect()[0].asDict() == {"n": 5, "s": 20}
    second = cached(_q(spark, src), cache)
    # the hit must scan the CACHE directory, not the source
    assert all("/rc/" in f for f in second.inputFiles())
    assert second.collect()[0].asDict() == {"n": 5, "s": 20}


def test_fingerprint_stable_across_builds_and_sensitive_to_query(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    _write_src(src, list(range(10)))
    assert plan_fingerprint(_q(spark, src)) == plan_fingerprint(_q(spark, src))
    other = spark.read.parquet(str(src)).filter(F.col("k") % 3 == 0).agg(
        F.count(F.lit(1)).alias("n"), F.sum("k").alias("s")
    )
    assert plan_fingerprint(other) != plan_fingerprint(_q(spark, src))


def test_input_change_invalidates(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    _write_src(src, list(range(10)))
    cache = str(tmp_path / "rc")
    assert cached(_q(spark, src), cache).collect()[0]["n"] == 5

    import time

    time.sleep(0.05)
    _write_src(src, list(range(20)))  # same file name, new bytes
    got = cached(_q(spark, src), cache).collect()[0].asDict()
    assert got == {"n": 10, "s": 90}  # fresh data, not the stale entry
    # both entries now exist (different fingerprints)
    assert len(os.listdir(cache)) == 2


def test_evict_and_clear(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    cache = str(tmp_path / "rc")
    for i in (2, 3, 5):
        _write_src(src, list(range(i)))
        cached(_q(spark, src), cache)
    assert len(os.listdir(cache)) == 3
    assert evict(cache, keep=1) == 2
    assert len(os.listdir(cache)) == 1
    clear_result_cache(cache)
    assert not os.path.exists(cache)

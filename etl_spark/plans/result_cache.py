"""Result-set caching keyed by plan fingerprint — skip recomputing a
query whose logical plan AND inputs are unchanged (the Snowflake
result-cache design; materialized-view reuse without the view DDL).

Reference relevance: the reference's dashboard re-runs the SAME
monitoring SELECTs on every poll (web_scheduler.py's 1 s loop and the
per-page task queries) against tables that change far less often than
they are read. At 100 TB the same access pattern costs a full scan
per poll unless something remembers that nothing changed.

Fingerprint = sha256 of (canonicalized optimized logical plan,
sorted input-file inventory with sizes + mtimes). Any change to the
query, to which files back it, or to a file's bytes (size/mtime)
yields a different key — a stale hit therefore requires an mtime-
preserving same-size in-place rewrite, which parquet writers do not
do. Misses compute once and persist atomically (write + _SUCCESS);
hits return a SCAN OF THE CACHE (asserted via inputFiles in tests) —
zero recompute, zero source IO.

Cache entries are self-describing (meta.json records the fingerprint
inputs) and safe to delete BETWEEN queries — not under live handles:
``cached()`` returns a lazy scan of the entry's files, so evicting an
entry while a previously returned DataFrame is still unconsumed makes
that DataFrame's next action fail on missing files (ADVICE r9; Spark
reads lazily, nothing pins the files). Run ``evict``/
``clear_result_cache`` only when earlier results are consumed or
re-derivable. ``clear_result_cache`` drops everything, ``evict``
keeps the newest N entries.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession


def _input_inventory(df: DataFrame) -> list[tuple[str, int, float]]:
    out = []
    for p in sorted(df.inputFiles()):
        local = p[len("file:") :] if p.startswith("file:") else p
        try:
            st = os.stat(local)
            out.append((p, st.st_size, st.st_mtime))
        except OSError:
            out.append((p, -1, -1.0))
    return out


def plan_fingerprint(df: DataFrame) -> str:
    """sha256 over the canonicalized optimized plan + the input-file
    inventory. Canonicalization normalizes expression ids so two
    builds of the same query fingerprint identically."""
    plan = (
        df._jdf.queryExecution().optimizedPlan().canonicalized().toString()
    )
    payload = json.dumps(
        {"plan": plan, "inputs": _input_inventory(df)}, sort_keys=True
    )
    return hashlib.sha256(payload.encode()).hexdigest()[:32]


def cached(df: DataFrame, cache_dir: str) -> DataFrame:
    """Return ``df``'s result, from the cache when plan+inputs are
    unchanged. A miss computes ONCE, persists, and returns the stored
    copy, so repeated polls of an unchanged monitoring query cost one
    cache-directory scan each.

    CONTRACT (ADVICE r10): the returned DataFrame is a LAZY reader
    over the cache entry's files — it stays valid only while the
    entry exists. Consume it (collect/write) before calling
    ``evict``/``clear_result_cache``, or re-call ``cached`` after an
    eviction; materializing here instead would pull every result
    through the driver, which is wrong for large cached frames."""
    fp = plan_fingerprint(df)
    entry = os.path.join(cache_dir, fp)
    data = os.path.join(entry, "data")
    spark = df.sparkSession
    if os.path.exists(os.path.join(data, "_SUCCESS")):
        _touch(entry)
        return spark.read.parquet(data)
    df.write.mode("overwrite").parquet(data)
    with open(os.path.join(entry, "meta.json"), "w") as fh:
        json.dump(
            {"fingerprint": fp, "created": time.time(), "inputs": _input_inventory(df)},
            fh,
        )
    return spark.read.parquet(data)


def _touch(entry: str) -> None:
    try:
        os.utime(entry, None)
    except OSError:
        pass


def evict(cache_dir: str, keep: int) -> int:
    """Drop all but the ``keep`` most-recently-used entries. Returns
    the number removed. Invalidates lazy DataFrames previously
    returned by ``cached`` for the removed entries — see the contract
    note there (ADVICE r10)."""
    if not os.path.isdir(cache_dir):
        return 0
    entries = [
        (os.path.getmtime(os.path.join(cache_dir, d)), os.path.join(cache_dir, d))
        for d in os.listdir(cache_dir)
        if os.path.isdir(os.path.join(cache_dir, d))
    ]
    victims = sorted(entries, reverse=True)[keep:]
    for _, d in victims:
        shutil.rmtree(d, ignore_errors=True)
    return len(victims)


def clear_result_cache(cache_dir: str) -> None:
    shutil.rmtree(cache_dir, ignore_errors=True)

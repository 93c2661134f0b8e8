"""Transactional table log (sources/txlog.py): atomic commits,
snapshot isolation, optimistic concurrency, time travel, vacuum."""

from __future__ import annotations

import json
import os
import threading

import pytest

from etl_spark.sources.txlog import TxTable


def _df(spark, lo, hi):
    return spark.range(lo, hi).withColumnRenamed("id", "v")


def test_create_append_read_roundtrip(spark, tmp_path):
    t = TxTable.create(str(tmp_path / "t"), _df(spark, 0, 10))
    t.append(_df(spark, 10, 15))
    got = sorted(r.v for r in t.read(spark).collect())
    assert got == list(range(15))
    assert t.latest_version() == 2
    assert [e["action"] for e in t.history()] == ["overwrite", "append"]


def test_overwrite_resets_and_time_travel(spark, tmp_path):
    t = TxTable.create(str(tmp_path / "t"), _df(spark, 0, 5))
    t.append(_df(spark, 5, 8))
    t.overwrite(_df(spark, 100, 103))
    assert sorted(r.v for r in t.read(spark).collect()) == [100, 101, 102]
    # snapshots remain readable at every earlier version
    assert sorted(r.v for r in t.read(spark, version=1).collect()) == list(range(5))
    assert sorted(r.v for r in t.read(spark, version=2).collect()) == list(range(8))


def test_snapshot_isolation_under_later_commits(spark, tmp_path):
    t = TxTable.create(str(tmp_path / "t"), _df(spark, 0, 5))
    snap = t.read(spark)  # resolves the dir list NOW
    t.overwrite(_df(spark, 50, 52))
    assert sorted(r.v for r in snap.collect()) == list(range(5))


def test_concurrent_appends_all_commit_distinct_versions(spark, tmp_path):
    """Optimistic concurrency: N racing appenders must each land a
    distinct contiguous version with no lost update."""
    t = TxTable.create(str(tmp_path / "t"), _df(spark, 0, 1))
    n = 6
    versions: list[int] = []
    lock = threading.Lock()

    def work(i):
        v = t.append(_df(spark, 10 * (i + 1), 10 * (i + 1) + 2))
        with lock:
            versions.append(v)

    threads = [threading.Thread(target=work, args=(i,)) for i in range(n)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert sorted(versions) == list(range(2, n + 2)), versions
    got = sorted(r.v for r in t.read(spark).collect())
    want = sorted([0] + [10 * (i + 1) + d for i in range(n) for d in (0, 1)])
    assert got == want


def test_torn_writer_invisible_and_vacuumed(spark, tmp_path):
    """A crashed writer (data dir + tmp entry, no link) must be
    invisible to readers and cleaned by vacuum."""
    t = TxTable.create(str(tmp_path / "t"), _df(spark, 0, 3))
    # simulate the crash: orphan data dir + orphan tmp log entry
    orphan = tmp_path / "t" / "data" / "v9-deadbeef"
    _df(spark, 900, 903).write.parquet(str(orphan))
    with open(tmp_path / "t" / "_txlog" / ".tmp-deadbeef.json", "w") as fh:
        json.dump({"version": 9, "action": "append", "add": "data/v9-deadbeef"}, fh)
    assert t.latest_version() == 1
    assert sorted(r.v for r in t.read(spark).collect()) == [0, 1, 2]
    removed = t.vacuum(grace_seconds=0)
    assert "data/v9-deadbeef" in removed
    assert not orphan.exists()
    assert not (tmp_path / "t" / "_txlog" / ".tmp-deadbeef.json").exists()


def test_vacuum_respects_retention(spark, tmp_path):
    t = TxTable.create(str(tmp_path / "t"), _df(spark, 0, 2))
    t.overwrite(_df(spark, 10, 12))
    t.append(_df(spark, 12, 14))
    removed = t.vacuum(retain_versions=2, grace_seconds=0)  # keep snapshots v2 and v3
    assert len(removed) == 1  # only v1's overwritten dir goes
    assert sorted(r.v for r in t.read(spark, version=2).collect()) == [10, 11]
    assert sorted(r.v for r in t.read(spark).collect()) == [10, 11, 12, 13]
    with pytest.raises(Exception):
        t.read(spark, version=1).collect()


def test_create_refuses_existing_table(spark, tmp_path):
    TxTable.create(str(tmp_path / "t"), _df(spark, 0, 2))
    with pytest.raises(ValueError, match="already exists"):
        TxTable.create(str(tmp_path / "t"), _df(spark, 0, 2))


def test_upsert_merges_by_key(spark, tmp_path):
    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], ["k", "v"]
    )
    t = TxTable.create(str(tmp_path / "t"), base)
    t.upsert(spark, spark.createDataFrame([(2, "B"), (4, "d")], ["k", "v"]), ["k"])
    got = {r.k: r.v for r in t.read(spark).collect()}
    assert got == {1: "a", 2: "B", 3: "c", 4: "d"}
    # lost-update protection: a second upsert sees the first's result
    t.upsert(spark, spark.createDataFrame([(1, "A")], ["k", "v"]), ["k"])
    got = {r.k: r.v for r in t.read(spark).collect()}
    assert got == {1: "A", 2: "B", 3: "c", 4: "d"}


def test_upsert_cas_retries_after_interleaved_commit(spark, tmp_path):
    """Simulate a writer sneaking in between an upsert's snapshot read
    and its commit: the CAS slot is taken, so the upsert must retry
    against the NEW snapshot and keep the interloper's rows."""
    t = TxTable.create(
        str(tmp_path / "t"), spark.createDataFrame([(1, "a")], ["k", "v"])
    )
    real_latest = t.latest_version

    calls = {"n": 0}

    def racing_latest():
        v = real_latest()
        if calls["n"] == 0:
            calls["n"] += 1
            # interloper commits AFTER the upsert snapshots `base`
            orig, t.latest_version = t.latest_version, real_latest
            try:
                t.append(spark.createDataFrame([(9, "z")], ["k", "v"]))
            finally:
                t.latest_version = orig
            return v  # stale base — forces the CAS to lose
        return real_latest()

    t.latest_version = racing_latest
    try:
        t.upsert(spark, spark.createDataFrame([(1, "A")], ["k", "v"]), ["k"])
    finally:
        t.latest_version = real_latest
    got = {r.k: r.v for r in t.read(spark).collect()}
    assert got == {1: "A", 9: "z"}  # both the upsert AND the interloper


def test_append_once_is_replay_idempotent(spark, tmp_path):
    t = TxTable.create(str(tmp_path / "t"), _df(spark, 0, 1))
    assert t.append_once(_df(spark, 10, 12), batch_id=0) is not None
    assert t.append_once(_df(spark, 10, 12), batch_id=0) is None  # replay
    assert t.append_once(_df(spark, 12, 13), batch_id=1) is not None
    assert sorted(r.v for r in t.read(spark).collect()) == [0, 10, 11, 12]


def test_streaming_txlog_sink_exactly_once_across_restart(spark, tmp_path):
    """Drive a file stream into a TxTable twice with the SAME
    checkpoint: run 2 must not re-commit run 1's batches (checkpoint
    advances), and a forced replay of the last batch id is absorbed
    by the log ledger."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql.types import LongType, StructField, StructType

    from etl_spark.streaming.sinks import run_txlog_sink

    src = tmp_path / "src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    schema = StructType([StructField("v", LongType())])
    pq.write_table(pa.table({"v": pa.array([1, 2], pa.int64())}), src / "a.parquet")

    t = TxTable.create(str(tmp_path / "t"), _df(spark, 0, 0).limit(0))

    def drain():
        q = run_txlog_sink(
            spark.readStream.schema(schema).parquet(str(src)), t, ckpt
        )
        q.awaitTermination(60)

    drain()
    assert sorted(r.v for r in t.read(spark).collect()) == [1, 2]

    pq.write_table(pa.table({"v": pa.array([3], pa.int64())}), src / "b.parquet")
    drain()  # restart with same checkpoint: only the new file lands
    assert sorted(r.v for r in t.read(spark).collect()) == [1, 2, 3]

    # simulate the crash-after-commit replay: same batch id re-offered
    last_bid = max(e["batch_id"] for e in t.history() if "batch_id" in e)
    assert t.append_once(spark.createDataFrame([(3,)], ["v"]), last_bid) is None
    assert sorted(r.v for r in t.read(spark).collect()) == [1, 2, 3]


def test_vacuum_refuses_zero_retention(spark, tmp_path):
    t = TxTable.create(str(tmp_path / "t"), _df(spark, 0, 2))
    with pytest.raises(ValueError, match="retain_versions"):
        t.vacuum(retain_versions=0)


def test_compact_preserves_rows_and_shrinks_files(spark, tmp_path):
    import glob

    t = TxTable.create(str(tmp_path / "t"), _df(spark, 0, 10).repartition(6))
    for i in range(3):
        t.append(_df(spark, 100 + 2 * i, 102 + 2 * i).repartition(2))
    before = sorted(r.v for r in t.read(spark).collect())
    n_files_before = len(glob.glob(str(tmp_path / "t" / "data" / "*" / "*.parquet")))
    v = t.compact(spark)
    assert v == t.latest_version()
    after_files = [
        os.path.join(self_dir, f)
        for self_dir in [os.path.join(str(tmp_path / "t"), d) for d in t.live_dirs()]
        for f in os.listdir(self_dir)
        if f.endswith(".parquet")
    ]
    assert len(after_files) == 1 < n_files_before
    assert sorted(r.v for r in t.read(spark).collect()) == before
    # history intact: pre-compaction snapshot still time-travelable
    assert sorted(r.v for r in t.read(spark, version=v - 1).collect()) == before


def test_vacuum_grace_protects_inflight_commit(spark, tmp_path):
    """A fresh unreferenced data dir + tmp entry (an in-flight writer
    between its parquet write and its log link) must survive a vacuum
    with the default grace window; only an aged orphan is removed."""
    import json as _json

    t = TxTable.create(str(tmp_path / "t"), _df(spark, 0, 3))
    inflight = tmp_path / "t" / "data" / "v9-aaaa"
    _df(spark, 900, 901).write.parquet(str(inflight))
    tmpfile = tmp_path / "t" / "_txlog" / ".tmp-aaaa.json"
    with open(tmpfile, "w") as fh:
        _json.dump({"version": 9, "action": "append", "add": "data/v9-aaaa"}, fh)
    removed = t.vacuum()  # default grace: fresh files untouched
    assert removed == []
    assert inflight.exists() and tmpfile.exists()
    removed = t.vacuum(grace_seconds=0)  # aged out: reclaimed
    assert "data/v9-aaaa" in removed and not inflight.exists()


def test_delete_copy_on_write_and_vacuum_erases(spark, tmp_path):
    """txlog takedown: DELETE commits a new version without the
    matching rows (time travel still shows them — snapshot isolation),
    and vacuum(retention=0) then removes the superseded files so the
    victim's bytes leave disk; survivors are unaffected."""
    import glob

    t = TxTable.create(
        str(tmp_path / "t"),
        spark.createDataFrame(
            [(1, "keep"), (2, "victim"), (3, "keep2")], ["k", "v"]
        ),
    )
    v = t.delete(spark, "k = 2")
    got = {r.k: r.v for r in t.read(spark).collect()}
    assert got == {1: "keep", 3: "keep2"}
    # pre-delete snapshot still shows the victim (time travel)
    old = {r.k for r in t.read(spark, version=v - 1).collect()}
    assert 2 in old
    t.vacuum(retain_versions=1, grace_seconds=0.0)
    # after vacuum the victim's bytes are gone from every live file
    blobs = b"".join(
        open(p, "rb").read()
        for p in glob.glob(f"{tmp_path}/t/**/*.parquet", recursive=True)
    )
    assert b"victim" not in blobs
    assert {r.k for r in t.read(spark).collect()} == {1, 3}


def test_delete_keeps_null_predicate_rows(spark, tmp_path):
    """SQL DELETE removes only rows where the predicate is TRUE; a row
    where it evaluates to NULL (here: NULL doc_id vs `doc_id IN (...)`)
    must SURVIVE. A bare `NOT (p)` filter erases it (ADVICE r7 —
    writers.py:309 documents the same trap); both delete and
    delete_once must coalesce the predicate to false."""
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("v", T.StringType()),
    ])
    t = TxTable.create(
        str(tmp_path / "t"),
        spark.createDataFrame(
            [(1, "victim"), (None, "null-row"), (3, "keep")], schema
        ),
    )
    t.delete(spark, "doc_id IN (1)")
    got = {r.v for r in t.read(spark).collect()}
    assert got == {"null-row", "keep"}
    t.delete_once(spark, "doc_id IN (3)", "takedown-nulltest-0")
    got = {r.v for r in t.read(spark).collect()}
    assert got == {"null-row"}


def test_changes_cdf_between_versions(spark, tmp_path):
    """TxTable.changes: exact keyed CDC across any commit mix —
    append (added), upsert (changed, with the changed column named),
    delete (removed), and a change-and-change-back collapsing to no
    row (net-zero semantics a commit-log replay would not give)."""
    from etl_spark.sources.txlog import TxTable

    t = TxTable.create(
        str(tmp_path / "cdf"),
        spark.createDataFrame([(1, "a", 10.0), (2, "b", 20.0)], "k LONG, s STRING, v DOUBLE"),
    )  # v1
    t.append(spark.createDataFrame([(3, "c", 30.0)], "k LONG, s STRING, v DOUBLE"))  # v2
    t.upsert(
        spark, spark.createDataFrame([(2, "b", 25.0)], "k LONG, s STRING, v DOUBLE"), ["k"]
    )  # v3
    t.delete(spark, "k = 1")  # v4
    t.upsert(
        spark, spark.createDataFrame([(2, "b", 20.0)], "k LONG, s STRING, v DOUBLE"), ["k"]
    )  # v5: back to v1's value

    got = {
        r["k"]: (r["change"], sorted(r["changed_cols"]))
        for r in t.changes(spark, ["k"], v_from=1, v_to=4).collect()
    }
    assert got == {1: ("removed", []), 2: ("changed", ["v"]), 3: ("added", [])}

    # net-zero: key 2 changed in v3 and changed back in v5
    net = {r["k"]: r["change"] for r in t.changes(spark, ["k"], 1, 5).collect()}
    assert net == {1: "removed", 3: "added"}

    # v_from=0: everything current is 'added'
    init = {r["k"]: r["change"] for r in t.changes(spark, ["k"], 0).collect()}
    assert init == {2: "added", 3: "added"}


def test_maybe_compact_threshold(spark, tmp_path):
    """maybe_compact: below the live-dir threshold it is a pure no-op
    (no new version); past it, ONE compaction folds the fragmented
    snapshot into target_files and the row set is unchanged — the
    amortized auto-OPTIMIZE loop a micro-batched ingest runs after
    each append."""
    from etl_spark.sources.txlog import TxTable

    t = TxTable.create(
        str(tmp_path / "t"), spark.range(0, 100).selectExpr("id AS k")
    )
    for i in range(1, 5):
        t.append(spark.range(100 * i, 100 * (i + 1)).selectExpr("id AS k"))
        assert t.maybe_compact(spark, max_live_dirs=8) is None
    pre = t.latest_version()
    assert len(t.live_dirs()) == 5

    for i in range(5, 10):
        t.append(spark.range(100 * i, 100 * (i + 1)).selectExpr("id AS k"))
    assert len(t.live_dirs()) == 10
    v = t.maybe_compact(spark, max_live_dirs=8, target_files=2)
    assert v == pre + 6
    assert len(t.live_dirs()) == 1  # one overwrite commit
    assert t.read(spark).count() == 1000
    assert sorted(r.k for r in t.read(spark).collect()) == list(range(1000))
    # next call: back under threshold
    assert t.maybe_compact(spark, max_live_dirs=8) is None

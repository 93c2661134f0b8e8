"""SCD Type 2 maintenance (operators/scd.py): interval invariants,
point-in-time correctness, replay idempotence."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from etl_spark.operators.scd import scd2_asof, scd2_init, scd2_merge

T = lambda d: dt.datetime(2024, 1, d)  # noqa: E731
SCHEMA = "cust LONG, segment STRING, ts TIMESTAMP"


def _snapshot(dim):
    rows = [
        (r["cust"], r["segment"], r["valid_from"], r["valid_to"], r["is_current"])
        for r in dim.collect()
    ]
    return sorted(rows, key=lambda t: (t[0], t[2], t[1] or ""))


@pytest.fixture()
def dim(spark):
    d0 = scd2_init(
        spark.createDataFrame([(1, "gold", T(1)), (2, "silver", T(1))], SCHEMA),
        ["cust"],
        "ts",
    )
    # batch 2: cust 1 changes, cust 2 unchanged (no-op), cust 3 new
    b2 = spark.createDataFrame(
        [(1, "platinum", T(5)), (2, "silver", T(5)), (3, "bronze", T(5))], SCHEMA
    )
    return spark, scd2_merge(d0, b2, ["cust"], "ts"), b2


def test_versions_and_invariants(dim):
    spark, d, _ = dim
    snap = _snapshot(d)
    assert snap == [
        (1, "gold", T(1), T(5), False),
        (1, "platinum", T(5), None, True),
        (2, "silver", T(1), None, True),
        (3, "bronze", T(5), None, True),
    ]
    # invariants: at most one open version per key; intervals never
    # overlap within a key
    rows = d.collect()
    by_key: dict = {}
    for r in rows:
        by_key.setdefault(r["cust"], []).append(r)
    for vs in by_key.values():
        assert sum(1 for v in vs if v["is_current"]) == 1
        ordered = sorted(vs, key=lambda v: v["valid_from"])
        for a, b in zip(ordered, ordered[1:]):
            assert a["valid_to"] is not None and a["valid_to"] <= b["valid_from"]


def test_asof_lookups(dim):
    spark, d, _ = dim
    at2 = {r["cust"]: r["segment"] for r in scd2_asof(d, T(2)).collect()}
    assert at2 == {1: "gold", 2: "silver"}
    at6 = {r["cust"]: r["segment"] for r in scd2_asof(d, T(6)).collect()}
    assert at6 == {1: "platinum", 2: "silver", 3: "bronze"}
    assert scd2_asof(d, dt.datetime(2023, 12, 1)).count() == 0


def test_replay_is_noop(dim):
    spark, d, b2 = dim
    replayed = scd2_merge(d, b2, ["cust"], "ts")
    assert _snapshot(replayed) == _snapshot(d)


def test_latest_per_key_wins_within_batch(spark):
    d0 = scd2_init(
        spark.createDataFrame([(1, "a", T(1))], SCHEMA), ["cust"], "ts"
    )
    batch = spark.createDataFrame([(1, "b", T(3)), (1, "c", T(7))], SCHEMA)
    d1 = scd2_merge(d0, batch, ["cust"], "ts")
    assert _snapshot(d1) == [
        (1, "a", T(1), T(7), False),
        (1, "c", T(7), None, True),
    ]


def test_null_attrs_handled_null_safely(spark):
    d0 = scd2_init(
        spark.createDataFrame([(1, None, T(1))], SCHEMA), ["cust"], "ts"
    )
    # same NULL state -> no-op; real value -> new version
    d1 = scd2_merge(
        d0, spark.createDataFrame([(1, None, T(2))], SCHEMA), ["cust"], "ts"
    )
    assert _snapshot(d1) == _snapshot(d0)
    d2 = scd2_merge(
        d1, spark.createDataFrame([(1, "x", T(3))], SCHEMA), ["cust"], "ts"
    )
    assert _snapshot(d2) == [
        (1, None, T(1), T(3), False),
        (1, "x", T(3), None, True),
    ]


def test_facts_join_the_right_version(spark, dim):
    _, d, _ = dim
    facts = spark.createDataFrame(
        [(100, 1, T(2)), (101, 1, T(6)), (102, 3, T(6))],
        "fact_id LONG, cust LONG, fts TIMESTAMP",
    )
    joined = facts.join(
        d,
        (facts.cust == d.cust)
        & (d.valid_from <= facts.fts)
        & (d.valid_to.isNull() | (d.valid_to > facts.fts)),
    ).select("fact_id", "segment")
    got = {r["fact_id"]: r["segment"] for r in joined.collect()}
    assert got == {100: "gold", 101: "platinum", 102: "bronze"}


def test_same_ts_conflict_elects_deterministically(spark):
    """Two observations of one key at the SAME ts: the election must
    be identical under any partitioning (and therefore on replay) —
    the attr-desc tiebreak pins it."""
    d0 = scd2_init(spark.createDataFrame([(1, "a", T(1))], SCHEMA), ["cust"], "ts")
    batch_rows = [(1, "x", T(3)), (1, "y", T(3))]
    outs = []
    for parts in (1, 7):
        b = spark.createDataFrame(batch_rows, SCHEMA).repartition(parts)
        outs.append(_snapshot(scd2_merge(d0, b, ["cust"], "ts")))
    assert outs[0] == outs[1]
    # and the winner is the attr-desc maximum: 'y'
    assert any(r[1] == "y" and r[4] for r in outs[0])
    # replaying the same conflicting batch changes nothing
    d1 = scd2_merge(d0, spark.createDataFrame(batch_rows, SCHEMA), ["cust"], "ts")
    d2 = scd2_merge(d1, spark.createDataFrame(batch_rows, SCHEMA), ["cust"], "ts")
    assert _snapshot(d2) == _snapshot(d1)


def _ref_scd2(batches):
    """Driver-side reference: apply batches in order; within a batch
    the latest ts wins per key (ties by attr desc); no-op if equal to
    current; else close current at ts and open a new version."""
    versions = {}  # key -> list of [attr, from, to, current]
    for batch in batches:
        latest = {}
        for k, attr, ts in batch:
            cur = latest.get(k)
            if cur is None or (ts, attr or "") > (cur[1], cur[0] or ""):
                latest[k] = (attr, ts)
        for k, (attr, ts) in latest.items():
            chain = versions.setdefault(k, [])
            open_v = next((v for v in chain if v[3]), None)
            if open_v is not None and open_v[0] == attr:
                continue
            if any(v[0] == attr and v[1] == ts for v in chain):
                continue  # replayed observation
            if open_v is not None:
                open_v[2], open_v[3] = ts, False
            chain.append([attr, ts, None, True])
    out = []
    for k, chain in versions.items():
        for attr, vf, vt, cur in chain:
            out.append((k, attr, vf, vt, cur))
    return sorted(out, key=lambda t: (t[0], t[2], t[1] or ""))


from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@settings(max_examples=8, deadline=None)
@given(
    st.lists(  # observations: (key, attr, day) with days strictly useful
        st.tuples(
            st.integers(0, 3),
            st.sampled_from(["a", "b", "c", None]),
            st.integers(1, 9),
        ),
        min_size=1,
        max_size=14,
    ),
    st.integers(1, 3),
)
def test_scd2_merge_matches_reference_random(obs, n_batches):
    from etl_spark.session import get_spark

    spark = get_spark(app_name="etl_spark-tests")
    # enforce the documented contract: per key, batches arrive in time
    # order — sort observations by day and slice into batches
    obs = sorted(set(obs), key=lambda o: (o[2], o[0], o[1] or ""))
    cuts = [len(obs) * i // n_batches for i in range(n_batches + 1)]
    batches = [
        [(k, a, T(d)) for k, a, d in obs[cuts[i] : cuts[i + 1]]]
        for i in range(n_batches)
        if obs[cuts[i] : cuts[i + 1]]
    ]
    dim = None
    for b in batches:
        df = spark.createDataFrame(b, SCHEMA.replace("cust", "k").replace("segment", "attr"))
        if dim is None:
            dim = scd2_init(df, ["k"], "ts")
        else:
            dim = scd2_merge(dim, df, ["k"], "ts")
    got = sorted(
        ((r["k"], r["attr"], r["valid_from"], r["valid_to"], r["is_current"])
         for r in dim.collect()),
        key=lambda t: (t[0], t[2], t[1] or ""),
    )
    want = _ref_scd2(batches)
    assert got == want

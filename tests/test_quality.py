"""Data-quality constraint and snapshot-diff tests."""

from __future__ import annotations

from pyspark.sql import Row

from etl_spark.quality import (
    check_constraints,
    duplicate_keys,
    fk_violations,
    snapshot_diff,
)
from etl_spark.tables import load


def test_check_constraints_single_pass(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    out = check_constraints(
        li,
        {
            "qty_positive": "l_quantity > 0",
            "discount_range": "l_discount BETWEEN 0 AND 1",
            "impossible": "l_quantity < 0",
            "key_not_null": "l_orderkey IS NOT NULL",
        },
    )
    assert out["qty_positive"] == 0
    assert out["discount_range"] == 0
    assert out["key_not_null"] == 0
    assert out["impossible"] == li.count()


def test_check_constraints_null_counts_as_violation(spark):
    df = spark.createDataFrame(
        [Row(v=5.0), Row(v=None), Row(v=-1.0)], schema="v DOUBLE"
    )
    out = check_constraints(df, {"v_pos": "v > 0"})
    assert out["v_pos"] == 2  # NULL is not provably positive


def test_duplicate_keys(spark):
    df = spark.createDataFrame(
        [Row(k=1, v="a"), Row(k=1, v="b"), Row(k=2, v="c")]
    )
    dups = duplicate_keys(df, ["k"]).collect()
    assert [(r.k, r.n_rows) for r in dups] == [(1, 2)]


def test_fk_violations_against_fixture_dims(spark, sf_dir):
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    # fixture integrity: every customer nation exists
    assert fk_violations(cust, nation, {"c_nationkey": "n_nationkey"}).isEmpty()
    # break it: remove one nation
    broken = nation.filter("n_nationkey <> 0")
    bad = fk_violations(cust, broken, {"c_nationkey": "n_nationkey"})
    assert bad.count() == cust.filter("c_nationkey = 0").count() > 0
    # NULL FK is not a violation
    df = spark.createDataFrame([Row(c_nationkey=None)], "c_nationkey INT")
    assert fk_violations(df, nation, {"c_nationkey": "n_nationkey"}).isEmpty()


def test_snapshot_diff(spark):
    old = spark.createDataFrame(
        [
            Row(id=1, a="x", b=1.0),
            Row(id=2, a="y", b=2.0),
            Row(id=3, a="z", b=None),
        ]
    )
    new = spark.createDataFrame(
        [
            Row(id=2, a="y", b=2.5),   # changed: b
            Row(id=3, a="z", b=None),  # unchanged (NULL-safe compare)
            Row(id=4, a="w", b=4.0),   # added
        ]
    )
    got = {r.id: (r.change, sorted(r.changed_cols)) for r in snapshot_diff(old, new, ["id"]).collect()}
    assert got == {
        1: ("removed", []),
        2: ("changed", ["b"]),
        4: ("added", []),
    }


def test_check_constraints_edges(spark):
    from pyspark.sql import Row

    assert check_constraints(spark.range(3), {}) == {}
    empty = spark.createDataFrame([], "v INT")
    assert check_constraints(empty, {"pos": "v > 0"}) == {"pos": 0}


def test_split_by_rules_null_counts_as_violation(spark):
    """split_by_rules: NULL rule results reject (contract not provably
    met — same semantics as check_constraints), multiple failures all
    appear in _violations, and valid rows come back column-identical."""
    from etl_spark.quality import split_by_rules

    df = spark.createDataFrame(
        [(1, 5.0, "view"), (2, None, "view"), (3, -1.0, "weird")],
        "id LONG, value DOUBLE, kind STRING",
    )
    valid, rejected = split_by_rules(
        df, {"v_nonneg": "value >= 0", "known": "kind IN ('view','click')"}
    )
    assert [r.id for r in valid.collect()] == [1]
    assert valid.columns == df.columns
    rej = {r.id: sorted(r._violations) for r in rejected.collect()}
    assert rej == {2: ["v_nonneg"], 3: ["known", "v_nonneg"]}


def test_profile_metrics_with_nulls_and_types(spark):
    """profile(): completeness counts nulls, mean is over NON-null
    values (SQL AVG semantics) from a decimal-exact sum, distinct
    ignores nulls, timestamps report epoch-microsecond bounds, and
    rules count NULL results as violations — all from one pass."""
    import datetime as dt

    from etl_spark.quality import profile

    df = spark.createDataFrame(
        [
            (1, 10.0, "a", dt.datetime(2024, 1, 1, 0, 0, 0)),
            (2, None, "b", dt.datetime(2024, 1, 2, 0, 0, 0, 500000)),
            (3, 20.0, None, None),
            (4, 30.0, "a", dt.datetime(2024, 1, 1, 0, 0, 0)),
        ],
        "id LONG, v DOUBLE, s STRING, ts TIMESTAMP",
    )
    got = {
        (r["item"], r["metric"]): r["value"]
        for r in profile(df, rules={"v_small": "v < 25"}).collect()
    }
    assert got[("__table__", "row_count")] == 4.0
    assert got[("v", "completeness")] == 0.75
    assert got[("v", "distinct")] == 3.0
    assert got[("v", "mean")] == 20.0  # 60 / 3 non-null, NOT / 4
    assert got[("s", "completeness")] == 0.75
    assert got[("s", "distinct")] == 2.0
    assert got[("ts", "min")] == 1704067200000000.0
    assert got[("ts", "max")] == 1704153600500000.0
    # v_small: 10<25 ok, NULL -> violation, 20<25 ok, 30 -> violation
    assert got[("v_small", "violations")] == 2.0
    # no min/max/mean rows for strings
    assert ("s", "mean") not in got


def test_profile_is_single_scan(spark):
    """All column metrics + all rules must come from ONE aggregate:
    exactly one FileScan of the table in the physical plan."""
    from etl_spark.quality import profile

    df = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    prof = profile(df, rules={"a": "o_totalprice > 0", "b": "o_orderkey > 0"})
    plan = prof._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan parquet") == 1


def test_accumulator_profile_equals_one_shot(spark, sf_dir):
    """profile_from_accumulators(merge(per-part accumulators)) must
    equal the one-shot profile (minus 'distinct', the one
    non-mergeable metric) BIT-FOR-BIT: counts/sums merge in exact
    decimal, min/max in double — no float drift by batch order."""
    from etl_spark.quality import (
        merge_accumulators,
        profile,
        profile_accumulators,
        profile_from_accumulators,
    )

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    rules = {"price_positive": "o_totalprice > 0"}
    parts = [
        orders.filter(f"o_orderkey % 3 = {i}") for i in range(3)
    ]
    merged = merge_accumulators(*[profile_accumulators(p, rules=rules) for p in parts])
    got = {
        (r["item"], r["metric"]): r["value"]
        for r in profile_from_accumulators(merged).collect()
    }
    want = {
        (r["item"], r["metric"]): r["value"]
        for r in profile(orders, rules=rules).collect()
        if r["metric"] != "distinct"
    }
    assert got == want


def test_merge_accumulators_any_tree_identical(spark):
    """Merge associativity: ((a+b)+c) == (a+(b+c)) byte-for-byte."""
    from etl_spark.quality import merge_accumulators, profile_accumulators

    dfs = [
        spark.createDataFrame([(i, float(i) * 1.5 + j) for j in range(4)], "k LONG, v DOUBLE")
        for i in range(3)
    ]
    accs = [profile_accumulators(d) for d in dfs]
    left = merge_accumulators(merge_accumulators(accs[0], accs[1]), accs[2])
    right = merge_accumulators(accs[0], merge_accumulators(accs[1], accs[2]))
    key = lambda df: sorted(  # noqa: E731
        (r["item"], r["acc"], r["dval"], r["nval"]) for r in df.collect()
    )
    assert key(left) == key(right)


def test_profile_drift_flags(spark):
    from etl_spark.quality import profile_drift

    base = spark.createDataFrame(
        [("v", "completeness", 1.0), ("v", "mean", 100.0), ("old", "min", 5.0)],
        "item STRING, metric STRING, value DOUBLE",
    )
    cur = spark.createDataFrame(
        [("v", "completeness", 0.80), ("v", "mean", 101.0), ("new", "max", 9.0)],
        "item STRING, metric STRING, value DOUBLE",
    )
    got = {
        (r["item"], r["metric"]): (r["status"], r["breached"])
        for r in profile_drift(cur, base, rel_tol=0.10).collect()
    }
    assert got[("v", "completeness")] == ("present", True)  # -20% breaches
    assert got[("v", "mean")] == ("present", False)  # +1% within tol
    assert got[("old", "min")] == ("removed", True)  # schema drift
    assert got[("new", "max")] == ("added", True)

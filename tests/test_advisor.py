"""Plan-linter tests: clean plans lint clean; each anti-pattern rule
fires on a plan deliberately built to exhibit it."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_spark.plans.advisor import assert_clean, lint_plan
from etl_spark.registry import all_specs
from etl_spark.tables import load

SPECS = all_specs()


def _rules(findings):
    return {f["rule"] for f in findings}


def test_headline_queries_lint_clean(spark, sf_dir):
    """The flagship pipeline shapes produce zero findings — the
    advisor agrees with the plan-lock discipline."""
    for name in ("q01_pricing_summary", "q05_region_revenue",
                 "x114_bitmap_distinct", "x109_hll_distinct"):
        findings = lint_plan(SPECS[name].fn(spark, sf_dir))
        assert findings == [], f"{name}: {findings}"
        assert_clean(SPECS[name].fn(spark, sf_dir))


def test_cartesian_flagged(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem").select("l_orderkey")
    o = load(spark, sf_dir, "orders").select("o_orderkey")
    # two large sides, no key, no broadcast hint -> CartesianProduct
    bad = li.crossJoin(o.hint("shuffle_replicate_nl"))
    assert "cartesian" in _rules(lint_plan(bad))


def test_nested_loop_reviewed_for_totals_pattern(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    tot = o.agg(F.count(F.lit(1)).alias("n"))
    df = o.crossJoin(F.broadcast(tot))
    rules = _rules(lint_plan(df))
    assert "nested-loop" in rules  # surfaced for review...
    assert_clean(df, allow=("nested-loop",))  # ...and allowable


def test_python_udf_flagged(spark, sf_dir):
    from pyspark.sql.functions import udf

    slow = udf(lambda s: (s or "").upper())
    df = load(spark, sf_dir, "part").select(slow("p_name").alias("u"))
    assert "python-udf" in _rules(lint_plan(df))


def test_unpushed_filter_flagged(spark, sf_dir):
    from pyspark.sql.functions import udf

    pred = udf(lambda s: bool(s and s.startswith("g")), "boolean")
    df = load(spark, sf_dir, "part").filter(pred("p_name"))
    rules = _rules(lint_plan(df))
    assert "filter-not-pushed" in rules
    # the same predicate as a builtin pushes down and lints clean of
    # that rule (startswith compiles to a StartsWith pushed filter)
    good = load(spark, sf_dir, "part").filter(F.col("p_name").startswith("g"))
    assert "filter-not-pushed" not in _rules(lint_plan(good))


def test_unpushed_filter_found_past_first_pushed_scan(spark, sf_dir):
    """ADVICE r10: the tree walk must examine EVERY Filter line, not
    stop at the first Filter-adjacent-to-scan pair. Build a two-scan
    plan whose first scan pushes its predicate and whose second scan
    (UDF predicate) cannot — the finding must still surface."""
    from pyspark.sql.functions import udf

    pred = udf(lambda s: bool(s and s.startswith("g")), "boolean")
    good = load(spark, sf_dir, "part").filter(
        F.col("p_name").startswith("g")
    ).select(F.col("p_name").alias("name"))
    bad = load(spark, sf_dir, "supplier").filter(pred("s_name")).select(
        F.col("s_name").alias("name")
    )
    # union (not join): a join would push IsNotNull into the second
    # scan and the rule would rightly stay quiet
    both = good.unionAll(bad)
    assert "filter-not-pushed" in _rules(lint_plan(both))


def test_wide_scan_flagged(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    wide = li.join(
        load(spark, sf_dir, "orders"), li.l_orderkey == F.col("o_orderkey")
    ).join(
        load(spark, sf_dir, "part"), li.l_partkey == F.col("p_partkey")
    )
    # no projection anywhere: the scans read every column
    assert "wide-scan" in _rules(lint_plan(wide, wide_scan_cols=10))


def test_many_exchanges_threshold(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    # three distinct shuffle keys: custkey agg -> count agg -> sort
    df = (
        o.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("m"))
        .orderBy("m")
    )
    assert "many-exchanges" in _rules(lint_plan(df, max_exchanges=2))
    with pytest.raises(AssertionError):
        assert_clean(df, max_exchanges=2)


@pytest.mark.parametrize("name", sorted(SPECS))
def test_no_registered_query_has_high_severity_findings(spark, sf_dir, name):
    """Suite-wide invariant (the VERDICT anti-pattern sweep as a
    test): no registered query plans a CartesianProduct or a
    row-at-a-time Python UDF. Review-severity findings (the totals
    BroadcastNestedLoopJoin, wide profile scans) are allowed — they
    are design-reviewed per query."""
    findings = lint_plan(SPECS[name].fn(spark, sf_dir))
    high = [f for f in findings if f["severity"] == "high"]
    assert not high, f"{name}: {high}"


def test_repeated_scan_flagged(spark, sf_dir):
    """Three references to the same relation in one plan -> flagged;
    the legitimate two-scan anchor pattern stays quiet."""
    o = load(spark, sf_dir, "orders").select("o_orderkey")
    three = o.unionAll(o).unionAll(o)
    findings = [
        f for f in lint_plan(three) if f["rule"] == "repeated-scan"
    ]
    assert findings and "'orders'" in findings[0]["detail"], findings

    anchor = load(spark, sf_dir, "orders").agg(
        F.max("o_orderkey").alias("mx")
    )
    two = load(spark, sf_dir, "orders").crossJoin(F.broadcast(anchor))
    assert "repeated-scan" not in _rules(lint_plan(two))


def test_scan_locations_full_path_and_truncation():
    """ADVICE r12: the repeated-scan Counter keys on the FULL
    bracketed path (two relations sharing a basename stay distinct),
    and Location lines truncated by formatted-explain elision are
    counted explicitly instead of escaping the rule."""
    from etl_spark.plans.advisor import _scan_locations

    plan = (
        "(1) Scan parquet\n"
        "Location: InMemoryFileIndex [file:/base/orders.parquet]\n"
        "(2) Scan parquet\n"
        "Location: InMemoryFileIndex [file:/tmp/replica_7/orders.parquet]\n"
        "(3) Scan parquet\n"
        "Location: InMemoryFileIndex [file:/base/orders.parquet]\n"
        "(4) Scan parquet\n"
        "Location: InMemoryFileIndex [file:/very/long/path/that/got/elid\n"
    )
    locs, unparsed = _scan_locations(plan)
    assert unparsed == 1
    # same basename, different dirs -> two distinct keys
    assert locs.count("file:/base/orders.parquet") == 2
    assert locs.count("file:/tmp/replica_7/orders.parquet") == 1
    from collections import Counter

    assert max(Counter(locs).values()) == 2  # never merged to 3

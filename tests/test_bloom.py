"""Bloom-filter join pruning (operators/bloomjoin.py).

The contract under test: pruning NEVER changes results (zero false
negatives + exact rescore), DOES drop rows (the scale payoff), and
the two probe forms (literal fold / broadcast words) are identical.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from etl_spark.operators.bloomjoin import (
    K_HASHES,
    bloom_bitmap,
    bloom_member_expr,
    bloom_prune_broadcast,
    bloom_words,
    x84_bloom_join_prune,
)


@pytest.fixture(scope="module")
def build_probe(spark):
    """A build side of 40 keys and a probe of 0..999 — small enough
    to enumerate the exact answer, big enough to exercise pruning."""
    build = spark.range(0, 400, 10).withColumnRenamed("id", "k")  # 40 keys
    probe = spark.range(0, 1000).withColumnRenamed("id", "p")
    return build, probe


def test_zero_false_negatives(spark, build_probe):
    # Every build key must pass its own bloom test, at ANY size —
    # even a pathologically small bitmap only adds false positives.
    build, _ = build_probe
    for m in (64, 256, 1 << 16):
        bm = bloom_bitmap(build, "k", m_bits=m)
        n_pass = build.filter(bloom_member_expr("k", bm, m_bits=m)).count()
        assert n_pass == build.count(), f"false negative at m={m}"


def test_false_positives_exist_and_rescore_removes_them(spark, build_probe):
    # An undersized bitmap (64 bits, 40 keys * 3 hashes) MUST produce
    # false positives — if it never does, the filter is not actually
    # testing membership (the x81 deliberately-tiny-sketch principle).
    build, probe = build_probe
    bm = bloom_bitmap(build, "k", m_bits=64)
    passed = probe.filter(bloom_member_expr("p", bm, m_bits=64))
    exact = set(r["k"] for r in build.collect())
    n_pass, n_exact = passed.count(), len(exact)
    assert n_pass > n_exact  # false positives present
    # exact rescore (the join in the real operator) removes them
    rescored = passed.join(build, passed.p == build.k).select("p")
    assert sorted(r["p"] for r in rescored.collect()) == sorted(exact)


def test_pruning_drops_rows_at_production_size(spark, build_probe):
    build, probe = build_probe
    bm = bloom_bitmap(build, "k")  # default m = 2^16: ~0% FP at 40 keys
    n_pass = probe.filter(bloom_member_expr("p", bm)).count()
    assert n_pass < 1000 * 0.1  # >90% of the probe pruned
    assert n_pass >= build.count()


def test_broadcast_form_identical_to_literal(spark, build_probe):
    build, probe = build_probe
    for m in (64, 1 << 16):  # with and without false positives
        bm = bloom_bitmap(build, "k", m_bits=m)
        lit_rows = sorted(
            r["p"] for r in probe.filter(bloom_member_expr("p", bm, m_bits=m)).collect()
        )
        bc_rows = sorted(
            r["p"]
            for r in bloom_prune_broadcast(
                probe, "p", bloom_words(build, "k", m_bits=m), m_bits=m
            ).collect()
        )
        assert lit_rows == bc_rows


def test_broadcast_form_plans_no_probe_shuffle(spark, build_probe):
    # The k word-joins must all be broadcast: the probe side of a
    # bloom prune never shuffles.
    build, probe = build_probe
    df = bloom_prune_broadcast(probe, "p", bloom_words(build, "k"))
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    plan = df._jdf.queryExecution().explainString(mode)
    import re

    assert len(re.findall(r"\(\d+\) BroadcastHashJoin", plan)) == K_HASHES
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan


def test_x84_equals_plain_join(spark, sf_dir):
    got = {
        r["l_returnflag"]: (r["revenue"], r["n_items"])
        for r in x84_bloom_join_prune(spark, sf_dir).collect()
    }
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    dec = lambda col: F.col(col).cast("decimal(18,2)")  # noqa: E731
    want = {
        r["l_returnflag"]: (r["revenue"], r["n_items"])
        for r in (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .join(c, o.o_custkey == c.c_custkey)
            .groupBy("l_returnflag")
            .agg(
                F.sum(dec("l_extendedprice") * (F.lit(1) - F.col("l_discount")).cast("decimal(18,2)"))
                .cast("double")
                .alias("revenue"),
                F.count(F.lit(1)).alias("n_items"),
            )
            .collect()
        )
    }
    assert got == want


def test_choose_m_bits_sizing():
    from etl_spark.operators.bloomjoin import M_CAP_BITS, choose_m_bits

    assert choose_m_bits(0) == 1 << 10
    assert choose_m_bits(100) == 1 << 10
    assert choose_m_bits(3000) == 1 << 15  # 30k bits -> 32768
    assert choose_m_bits(10_000_000) == M_CAP_BITS  # 1e8 bits clamps to 2^26
    assert choose_m_bits(10**9) == M_CAP_BITS  # clamped
    # monotone, power of two
    prev = 0
    for n in (1, 10, 1000, 10**5, 10**7, 10**9):
        m = choose_m_bits(n)
        assert m >= prev and (m & (m - 1)) == 0
        prev = m


def test_auto_switches_probe_form(spark, build_probe):
    # small build -> literal fold (no joins in the pruned plan);
    # the broadcast threshold is exercised by sizing math (a >6.5k-key
    # build would blow past LITERAL_MAX_BITS) — proven equivalent in
    # test_broadcast_form_identical_to_literal.
    import re

    from etl_spark.operators.bloomjoin import LITERAL_MAX_BITS, bloom_prune_auto, choose_m_bits

    build, probe = build_probe
    pruned = bloom_prune_auto(probe, "p", build, "k")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    plan = pruned._jdf.queryExecution().explainString(mode)
    assert not re.findall(r"\(\d+\) \w*Join", plan)  # literal path: pure filter
    assert choose_m_bits(7000) > LITERAL_MAX_BITS  # big builds go broadcast

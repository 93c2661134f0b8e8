"""Correlated-sampling join-size estimation (plans/estimate.py)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from etl_spark.plans.estimate import estimate_join_rows


def _expand(df, mult_expr):
    return (
        df.withColumn("m", F.expr(mult_expr))
        .select("k", F.explode(F.expr("sequence(1, m)")).alias("_"))
        .select("k")
    )


def test_exact_when_samples_not_full(spark):
    a = spark.range(0, 50).select((F.col("id") % 10).alias("k"))
    b = spark.range(0, 30).select((F.col("id") % 15).alias("k"))
    assert estimate_join_rows(a, "k", b, "k") == float(a.join(b, "k").count())


def test_null_keys_never_join_nor_count(spark):
    a = spark.createDataFrame([(1,), (None,), (None,)], "k LONG")
    b = spark.createDataFrame([(1,), (1,), (None,)], "k LONG")
    assert estimate_join_rows(a, "k", b, "k") == 2.0


def test_estimator_regime_within_bounds(spark):
    # 5000 distinct keys vs K=256 samples, skewed multiplicities,
    # half the keys absent on one side — rel err ~1/sqrt(matched)
    a = _expand(spark.range(0, 5000).select(F.col("id").alias("k")), "1 + k % 5")
    b = _expand(
        spark.range(0, 5000).filter(F.col("id") % 2 == 0).select(F.col("id").alias("k")),
        "1 + k % 3",
    )
    true = a.join(b, "k").count()
    est = estimate_join_rows(a, "k", b, "k")
    assert abs(est - true) / true < 0.4


def test_disjoint_sides_estimate_zero(spark):
    a = spark.range(0, 3000).select(F.col("id").alias("k"))
    b = spark.range(10_000, 13_000).select(F.col("id").alias("k"))
    assert estimate_join_rows(a, "k", b, "k") == 0.0


def test_exact_at_the_k_boundary(spark):
    # exactly k distinct keys per side: must be EXACT (the review
    # finding: a full-but-not-overflowed sample was misclassified as
    # overflowed and inflated by 1/tau)
    from etl_spark.extensions.sketches import K_SKETCH

    a = spark.range(0, K_SKETCH).select(F.col("id").alias("k"))
    b = spark.range(0, K_SKETCH).select(F.col("id").alias("k"))
    true = a.join(b, "k").count()
    assert estimate_join_rows(a, "k", b, "k") == float(true)

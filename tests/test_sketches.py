"""Sketch-family tests beyond oracle parity: the salted two-level
top-K must equal the plain global top-K (the scale-safety claim of
sketches.py rests on this equivalence), the KMV estimator must land
within its published error bound when the sketch is full, and the
theta-style set compositions must be internally consistent."""

from __future__ import annotations

import pyspark.sql.functions as F

from etl_spark.extensions.sketches import (
    HH_PHI,
    K_SKETCH,
    priority_sample_revenue,
    salted_min_k,
    token_heavy_hitters,
)
from etl_spark.registry import all_specs
from etl_spark.tables import load

SPECS = all_specs()
SF001 = "/root/testdata/sf0.01"


def test_salted_min_k_equals_global_top_k(spark):
    """The two-level (group, salt) -> group ranking must keep exactly
    the K globally-smallest h per group, including for a hot group
    far larger than SALTS*K — each salt bucket keeps its own K
    smallest, and every global top-K member survives its bucket."""
    hot = spark.range(0, 20000).select(
        F.lit("hot").alias("g"),
        F.expr(
            "CAST(conv(substring(md5(CAST(id AS STRING)), 1, 15), 16, 10) AS BIGINT)"
        ).alias("h"),
    )
    cold = spark.range(0, 17).select(
        F.lit("cold").alias("g"),
        F.expr(
            "CAST(conv(substring(md5(CAST(id + 90000 AS STRING)), 1, 15), 16, 10) AS BIGINT)"
        ).alias("h"),
    )
    df = hot.union(cold)
    got = {
        (r.g, r.h, r.rn) for r in salted_min_k(df, ["g"], k=50).collect()
    }
    from pyspark.sql import Window

    w = Window.partitionBy("g").orderBy("h")
    want = {
        (r.g, r.h, r.rn)
        for r in df.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 50)
        .collect()
    }
    assert got == want
    # the cold group is below K: kept whole
    assert sum(1 for g, _, _ in got if g == "cold") == 17


def test_kmv_estimate_within_error_bound(spark):
    """At sf0.01 every order-year holds well over K=256 distinct
    customers, so x76 runs the estimator path; the estimate must land
    within 5 relative standard errors (5/sqrt(K-2) ~ 31%) of the
    exact count for every year. Deterministic: md5 hashes are fixed."""
    est = {
        r.order_year: (r.kept, r.est_distinct)
        for r in SPECS["x76_kmv_distinct_customers"].fn(spark, SF001).collect()
    }
    exact = {
        r.order_year: r.exact
        for r in load(spark, SF001, "orders")
        .groupBy(F.year("o_orderdate").alias("order_year"))
        .agg(F.countDistinct("o_custkey").alias("exact"))
        .collect()
    }
    assert est.keys() == exact.keys()
    bound = 5.0 / (K_SKETCH - 2) ** 0.5
    for year, (kept, e) in est.items():
        assert kept == K_SKETCH, f"{year}: estimator path not exercised"
        rel = abs(e - exact[year]) / exact[year]
        assert rel <= bound, f"{year}: rel err {rel:.3f} > {bound:.3f}"


def test_kmv_overlap_composition_consistent(spark):
    """x77's theta-style outputs must be internally consistent:
    jaccard in [0,1], est_common + est_lost ~= est_a and
    est_common + est_new ~= est_b (inclusion-exclusion, exact by
    construction up to the ROUND(..,4) at the edge), and the union
    estimate at least as large as either side's."""
    rows = SPECS["x77_kmv_year_overlap"].fn(spark, SF001).collect()
    assert rows, "no consecutive-year pairs at sf0.01"
    for r in rows:
        assert r.year_b == r.year_a + 1
        assert 0.0 <= r.jaccard_est <= 1.0
        assert abs(r.est_common + r.est_lost - r.est_a) <= 1e-3
        assert abs(r.est_common + r.est_new - r.est_b) <= 1e-3
        assert r.est_union >= max(r.est_a, r.est_b) - 1e-3
        # consecutive-year customer bases genuinely overlap
        assert r.est_common > 0


def test_bottomk_quantiles_bracket_exact(spark):
    """x78's sampled quantiles are order statistics of a uniform
    256-row sample; each must be monotone and fall inside the exact
    population's (q +- 5/sqrt(K)) quantile bracket — the DKW-style
    distribution-free bound for the sample CDF."""
    sample = {
        r.order_year: r
        for r in SPECS["x78_bottomk_sample_quantiles"].fn(spark, SF001).collect()
    }
    eps = 5.0 / K_SKETCH ** 0.5  # ~0.31
    brackets = {}
    for q in (0.25, 0.5, 0.9):
        lo, hi = max(0.0, q - eps), min(1.0, q + eps)
        rows = (
            load(spark, SF001, "orders")
            .groupBy(F.year("o_orderdate").alias("order_year"))
            .agg(
                F.expr(f"percentile(o_totalprice, {lo})").alias("lo"),
                F.expr(f"percentile(o_totalprice, {hi})").alias("hi"),
            )
            .collect()
        )
        for r in rows:
            brackets[(r.order_year, q)] = (r.lo, r.hi)
    for year, r in sample.items():
        assert r.sample_n == K_SKETCH
        assert r.p25 <= r.p50 <= r.p90
        for q, v in ((0.25, r.p25), (0.5, r.p50), (0.9, r.p90)):
            lo, hi = brackets[(year, q)]
            assert lo <= v <= hi, f"{year} q{q}: {v} outside [{lo}, {hi}]"


def test_heavy_hitters_partitioning_independent(spark):
    """x79's output must be the exact plain-groupBy answer whatever
    the input partitioning — the pigeonhole candidate guarantee. A
    skewed synthetic stream (one token at 10%, a handful at ~1%, a
    long tail of singletons) is checked at 1, 7 and 32 partitions."""
    rows = (
        [("hot",)] * 2000
        + [(f"warm{i}",) for i in range(5) for _ in range(200)]
        + [(f"tail{i}",) for i in range(17000)]
    )
    tokens = spark.createDataFrame(rows, schema="token string")
    n = len(rows)
    exact = {
        (r.token, r.cnt)
        for r in tokens.groupBy("token")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") > HH_PHI * n)
        .collect()
    }
    assert any(t == "hot" for t, _ in exact) and len(exact) == 6
    for parts in (1, 7, 32):
        got = {
            (r.token, r.cnt)
            for r in token_heavy_hitters(tokens.repartition(parts)).collect()
        }
        assert got == exact, f"parts={parts}"


def test_priority_sample_exact_when_not_sampling(spark):
    """With fewer rows than k the priority sample IS the table:
    tau = 0, every estimate exact to the cent, rel_err 0."""
    li = load(spark, "/root/testdata/sf0.001", "lineitem").limit(300)
    out = priority_sample_revenue(li, k=512).collect()
    assert sum(r.n_sample for r in out) == 300
    for r in out:
        assert abs(r.est_revenue - r.exact_revenue) <= 0.011 * r.n_sample
        assert r.rel_err <= 1e-4


def test_priority_sample_error_bound(spark):
    """In the sampling regime (sf0.01 lineitem ~60k rows, k=512) the
    per-returnflag estimates must land within 20% of exact and the
    TOTAL within 10% — loose 3-sigma-ish bounds for priority
    sampling's subset-sum variance; deterministic hashes make this a
    fixed fact of the fixture, not a flaky draw."""
    out = SPECS["x80_priority_sample_revenue"].fn(spark, SF001).collect()
    assert len(out) == 3
    assert sum(r.n_sample for r in out) == 512
    tot_est = sum(r.est_revenue for r in out)
    tot_exact = sum(r.exact_revenue for r in out)
    assert abs(tot_est - tot_exact) / tot_exact <= 0.10
    for r in out:
        assert r.rel_err <= 0.20, f"{r.l_returnflag}: rel_err {r.rel_err}"


def test_cms_overestimates_only_and_collides(spark):
    """CMS error is one-sided: est >= exact for EVERY token (the min
    over D rows can only over-count). With the deliberately tiny
    CMS_W=16 against the 31-token fixture vocabulary, pigeonhole
    forces collisions in every row — at least one token must actually
    overestimate, or the collision path was never exercised."""
    out = SPECS["x81_countmin_token_freq"].fn(spark, SF001).collect()
    assert len(out) == 31
    assert all(r.est_cnt >= r.exact_cnt for r in out)
    assert all(r.overest == r.est_cnt - r.exact_cnt for r in out)
    assert any(r.overest > 0 for r in out), "W=16 never collided?"


def test_cms_merge_equals_full_build(spark):
    """Cell-wise merge of the two half-corpus sketches must equal the
    single full-corpus sketch exactly — counts add, so every estimate
    agrees. x82 (merged) vs x81 (single build) per token."""
    full = {
        r.token: r.est_cnt
        for r in SPECS["x81_countmin_token_freq"].fn(spark, SF001).collect()
    }
    merged = {
        r.token: r.est_cnt
        for r in SPECS["x82_cms_merge_estimates"].fn(spark, SF001).collect()
    }
    assert merged == full and len(merged) == 31

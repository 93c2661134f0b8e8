"""Join-size estimation from correlated bottom-k key samples —
planner-grade cardinality estimates without scanning either join
side twice (Vengerov et al., VLDB 2015 "correlated sampling"; the
theta-sketch machinery of x76/x77 pointed at the optimizer).

Why it matters at 100 TB: choosing broadcast vs shuffle, or the join
ORDER of a multi-join, hinges on output cardinalities that naive
statistics get catastrophically wrong under key skew and selective
filters. Sampling both sides with the SAME hash function makes the
samples correlated: a key is sampled on side A iff it is sampled on
side B (its hash is below the shared threshold), so matched sample
pairs are an unbiased picture of matched keys — uncorrelated samples
of two sides almost never sample the same key and estimate ~0.

Estimator: per side, keep the K smallest md5-hash DISTINCT keys with
their row multiplicities (the x76 salted top-K build, so no reducer
skew). tau = the smaller full-side threshold normalized to (0, 1];
every key with h < tau*DOMAIN is in BOTH samples if it is in either.
estimate = sum over matched sampled keys of m_a*m_b, divided by tau.
When neither side overflows K the sample is the whole key set and
the estimate is EXACT (asserted)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_spark.extensions.sketches import _H_SPARK, HASH_DOMAIN, K_SKETCH, salted_min_k


def _key_sample(df: DataFrame, key: str, k: int) -> DataFrame:
    """(h, cnt) for the k+1 smallest-hash distinct keys, with cnt the
    key's row multiplicity. One aggregate + the salted top-K. The
    EXTRA row is the overflow sentinel: getting exactly k rows back
    means the side has exactly k distinct keys (still exact), while
    k+1 rows means it overflowed and the (k+1)-th hash is the
    exclusive sampling threshold — sampling k alone cannot tell
    "exactly k" from "more than k" and misclassified the boundary
    (review finding)."""
    per_key = (
        df.select(F.col(key).alias("k"))
        .filter(F.col("k").isNotNull())
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.expr(_H_SPARK.format(col="k")).alias("h"), "cnt")
    )
    return salted_min_k(per_key, [], k=k + 1).select("h", "cnt", "rn")


def estimate_join_rows(
    a: DataFrame, key_a: str, b: DataFrame, key_b: str, k: int = K_SKETCH
) -> float:
    """Estimated row count of ``a JOIN b ON a.key_a = b.key_b``.
    Exact when both sides have <= k distinct keys (including EXACTLY k,
    via the k+1 overflow sentinel); otherwise unbiased
    with relative error ~ 1/sqrt(matched sample size)."""
    sa = _key_sample(a, key_a, k).persist()
    sb = _key_sample(b, key_b, k).persist()
    taus = []
    for s in (sa, sb):
        agg = s.agg(
            F.count(F.lit(1)).alias("n"), F.max("h").alias("mx")
        ).collect()[0]
        if agg["n"] == k + 1:  # overflow sentinel row came back
            taus.append(agg["mx"] / HASH_DOMAIN)
    tau = min(taus) if taus else 1.0
    matched = sa.select("h", F.col("cnt").alias("ca")).join(
        sb.select("h", F.col("cnt").alias("cb")), "h"
    )
    if taus:
        # strictly below the threshold: the sentinel row itself (and
        # any row at/above the smaller side's cutoff) is not sampled
        matched = matched.filter(F.col("h") < F.lit(tau * HASH_DOMAIN))
    total = matched.agg(F.sum(F.col("ca") * F.col("cb")).alias("t")).collect()[0]["t"]
    sa.unpersist()
    sb.unpersist()
    return float(total or 0) / tau

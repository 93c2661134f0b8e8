"""Statistical aggregates — CUBE totals, exact interpolated
percentiles, and correlation from exact moment sums. These round out
the reference's dashboard-summary family (web_scheduler.py:4582-4733
computes success-rate/volume summaries in Python loops) with the
grouping-set and distribution shapes Spark gives declaratively.

Cross-engine float discipline (see e05): anything accumulated is
either an integer/DECIMAL (exactly associative — partition order
can't change it) or a single final double expression over those
exact sums. ``corr()``/``stddev()`` built-ins are avoided for parity
because their streaming float accumulation is aggregation-order-
dependent; ``percentile()`` is fine because it sorts then evaluates
ONE interpolation expression (probed bit-equal vs DuckDB's
quantile_cont on the fixtures).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_spark.registry import register
from etl_spark.tables import load


@register(
    "a12_cube",
    oracle="""
        SELECT o_orderstatus, o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                 AS total
        FROM orders
        GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    tags=("agg",),
)
def a12_cube(spark: SparkSession, sf: str) -> DataFrame:
    """CUBE over (status, priority): all four grouping sets — both
    margins, the cross-tab, and the grand total — expanded inside ONE
    shuffle (Spark duplicates rows per grouping set map-side, with
    partial aggregation before the Exchange). Complements a07's
    ROLLUP and a11's explicit GROUPING SETS."""
    return (
        load(spark, sf, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("total"),
        )
    )


@register(
    "a13_percentiles",
    oracle="""
        SELECT o_orderpriority,
               CAST(quantile_cont(o_totalprice, 0.5) AS DOUBLE) AS p50,
               CAST(quantile_cont(o_totalprice, 0.9) AS DOUBLE) AS p90,
               CAST(MIN(o_totalprice) AS DOUBLE) AS lo,
               CAST(MAX(o_totalprice) AS DOUBLE) AS hi
        FROM orders GROUP BY o_orderpriority
    """,
    tags=("agg",),
)
def a13_percentiles(spark: SparkSession, sf: str) -> DataFrame:
    """Exact interpolated per-group percentiles (p50/p90) with range
    bounds. Spark's ``percentile`` sorts each group's values and
    evaluates one linear interpolation — bit-equal to DuckDB's
    quantile_cont (probed on the fixtures at both scales). At 100 TB
    exact percentile means a per-group sort, so the scale path is
    ``approx_percentile`` (t-digest, benchmarked under x22's sketch
    family); this is the exact form the approx variant is validated
    against."""
    return (
        load(spark, sf, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.expr("percentile(o_totalprice, 0.5)").alias("p50"),
            F.expr("percentile(o_totalprice, 0.9)").alias("p90"),
            F.min("o_totalprice").cast("double").alias("lo"),
            F.max("o_totalprice").cast("double").alias("hi"),
        )
    )


@register(
    "e06_value_k_correlation",
    oracle="""
        WITH m AS (
            SELECT event_type,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS sx,
                   SUM(CAST(value AS DECIMAL(18,2))) AS sy,
                   SUM(CAST(json_extract(props, '$.k') AS BIGINT)
                       * CAST(value AS DECIMAL(18,2))) AS sxy,
                   SUM(CAST(json_extract(props, '$.k') AS BIGINT)
                       * CAST(json_extract(props, '$.k') AS BIGINT)) AS sxx,
                   SUM(CAST(value AS DECIMAL(18,2))
                       * CAST(value AS DECIMAL(18,2))) AS syy
            FROM events GROUP BY event_type
        )
        SELECT event_type, n,
               CAST((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                    / (sqrt(n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                       * sqrt(n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
                    AS DOUBLE) AS corr_vk
        FROM m WHERE n > 1
    """,
    tags=("events", "agg", "function"),
)
def e06_value_k_correlation(spark: SparkSession, sf: str) -> DataFrame:
    """Pearson correlation between event value and the JSON payload's
    ``k`` field, per event type — computed from BIGINT/DECIMAL-exact
    moment sums (n, Σx, Σy, Σxy, Σx², Σy²) folded into one double
    expression. Exactly associative, so any partitioning of the 100 TB
    scan yields the identical answer; one keyed Exchange total. The
    built-in ``corr()`` is deliberately not used: its pairwise float
    update is aggregation-order-dependent and cannot be oracle-exact."""
    ev = load(spark, sf, "events")
    x = F.get_json_object("props", "$.k").cast("bigint")
    y = F.col("value").cast("decimal(18,2)")
    m = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * y).alias("sxy"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
    ).filter(F.col("n") > 1)
    n = F.col("n")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    cov = n * F.col("sxy").cast("double") - sx * sy
    vx = n * F.col("sxx").cast("double") - sx * sx
    vy = n * F.col("syy").cast("double") - sy * sy
    return m.select(
        "event_type",
        "n",
        (cov / (F.sqrt(vx) * F.sqrt(vy))).cast("double").alias("corr_vk"),
    )


@register(
    "x108_revenue_trend",
    oracle="""
        WITH monthly AS (
            SELECT n.n_name AS nation,
                   CAST(year(o.o_orderdate) * 12 + month(o.o_orderdate)
                        AS BIGINT) AS mi,
                   SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS rev
            FROM orders o
            JOIN customer c ON c.c_custkey = o.o_custkey
            JOIN nation n ON n.n_nationkey = c.c_nationkey
            GROUP BY n.n_name,
                     CAST(year(o.o_orderdate) * 12 + month(o.o_orderdate)
                          AS BIGINT)
        ),
        fit AS (
            SELECT nation,
                   CAST(COUNT(*) AS BIGINT) AS n_months,
                   SUM(mi) AS sx,
                   SUM(mi * mi) AS sxx,
                   SUM(rev) AS sy,
                   SUM(mi * rev) AS sxy
            FROM monthly GROUP BY nation
        )
        SELECT nation, n_months,
               ROUND(CAST(n_months * sxy - sx * sy AS DOUBLE)
                     / CAST(n_months * sxx - sx * sx AS DOUBLE), 6)
                 AS slope_per_month,
               ROUND(CAST(sy AS DOUBLE) / n_months, 6) AS avg_monthly_rev
        FROM fit
    """,
    tags=("statistics", "timeseries"),
    doc="Per-nation OLS revenue trend: exact fixed-point normal equations, one double division.",
)
def x108_revenue_trend(spark: SparkSession, sf: str) -> DataFrame:
    """Per-nation revenue TREND — the least-squares slope of monthly
    revenue over the calendar month index, the 'is this market
    growing' number next to x94's point-to-point growth rates. The
    normal-equation sums are EXACT end-to-end: x is an integer month
    index, y an exact decimal revenue, so Σx/Σx² are bigints and
    Σy/Σxy exact decimals — the slope's numerator and denominator are
    exact subtractions and the ONLY float operation is the final
    division (the x85/e09 fixed-point rule applied to regression;
    a float Σxy would be aggregation-order-dependent and could not
    hash-match).

    Scale: dims broadcast; one custkey-less fact aggregate keyed on
    (nation, month) — map-side partial sums — then a nations-sized
    second aggregate. Nothing is window- or fact-joined."""
    o = load(spark, sf, "orders")
    c = load(spark, sf, "customer").select("c_custkey", "c_nationkey")
    n = load(spark, sf, "nation").select(
        F.col("n_nationkey"), F.col("n_name").alias("nation")
    )
    mi = (F.year("o_orderdate") * 12 + F.month("o_orderdate")).cast("long")
    monthly = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("nation", mi.alias("mi"))
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev")
        )
    )
    fit = monthly.groupBy("nation").agg(
        F.count(F.lit(1)).alias("n_months"),
        F.sum("mi").alias("sx"),
        F.sum(F.col("mi") * F.col("mi")).alias("sxx"),
        F.sum("rev").alias("sy"),
        F.sum(F.col("mi") * F.col("rev")).alias("sxy"),
    )
    num = (F.col("n_months") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "double"
    )
    den = (
        F.col("n_months") * F.col("sxx") - F.col("sx") * F.col("sx")
    ).cast("double")
    return fit.select(
        "nation",
        "n_months",
        F.round(num / den, 6).alias("slope_per_month"),
        F.round(F.col("sy").cast("double") / F.col("n_months"), 6).alias(
            "avg_monthly_rev"
        ),
    )

"""Distribution / ranking / aggregation operators rounding out the
SQL surface a reference user would reach for next: relative-rank
windows, FILTERed aggregates, exact medians with deterministic modes,
ordered string aggregation, and equi-width histograms.

Reference shapes being reproduced: the dashboard's per-task percentile
badges and status-breakdown tiles (web_scheduler.py:4582-4733) are
N+1 pandas loops there; each is ONE declarative plan here.

Scale notes (100 TB): every operator shuffles once on its group key.
The window operators partition by a bounded key (mktsegment, nation),
never a global ORDER BY over the full table; the histogram's bucket id
is a codegen'd projection, so the only exchange is the final
per-bucket aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_spark.registry import register
from etl_spark.tables import load


@register(
    "w07_percent_rank",
    oracle="""
        SELECT c_custkey, c_mktsegment, c_acctbal,
               ROUND(percent_rank() OVER w, 6) AS pct_rank,
               ROUND(cume_dist() OVER w, 6) AS cume
        FROM customer
        WINDOW w AS (PARTITION BY c_mktsegment
                     ORDER BY c_acctbal, c_custkey)
    """,
    tags=("window",),
)
def w07_percent_rank(spark: SparkSession, sf: str) -> DataFrame:
    """Relative standing of every customer balance within its market
    segment: percent_rank (rank-1)/(n-1) and cume_dist. The tie-break
    on c_custkey makes both functions deterministic.

    Scale: one Exchange on c_mktsegment (bounded cardinality); the
    sort is per-partition. A skewed segment would be the bottleneck —
    at 100 TB pre-aggregate to (segment, balance) counts first if
    ranks over distinct values suffice."""
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return load(spark, sf, "customer").select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


@register(
    "a14_filtered_agg",
    oracle="""
        SELECT o_orderstatus,
               CAST(COUNT(*) AS BIGINT) AS n_total,
               CAST(COUNT(*) FILTER (WHERE o_orderpriority = '1-URGENT')
                    AS BIGINT) AS n_urgent,
               CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                             FILTER (WHERE o_orderpriority = '1-URGENT'), 0)
                    AS DOUBLE) AS urgent_revenue,
               CAST(COUNT(DISTINCT o_custkey)
                    FILTER (WHERE o_totalprice > 100000)
                    AS BIGINT) AS n_big_spenders
        FROM orders
        GROUP BY o_orderstatus
    """,
    tags=("agg",),
)
def a14_filtered_agg(spark: SparkSession, sf: str) -> DataFrame:
    """Conditional (FILTERed) aggregates in one pass: per order
    status, total count, urgent-only count and revenue, and distinct
    big-ticket customers. The reference computes each of these as a
    separate query per dashboard tile; one grouped scan serves all.

    Scale: single Exchange on o_orderstatus; every conditional
    aggregate partial-aggregates map-side. The conditional COUNT
    DISTINCT adds an expand step — still one shuffle."""
    o = load(spark, sf, "orders")
    urgent = F.col("o_orderpriority") == "1-URGENT"
    return o.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.count(F.when(urgent, 1)).alias("n_urgent"),
        F.coalesce(
            F.sum(F.when(urgent, F.col("o_totalprice").cast("decimal(18,2)"))),
            F.lit(0).cast("decimal(18,2)"),
        )
        .cast("double")
        .alias("urgent_revenue"),
        F.count_distinct(
            F.when(F.col("o_totalprice") > 100000, F.col("o_custkey"))
        ).alias("n_big_spenders"),
    )


@register(
    "a15_median_mode",
    oracle="""
        WITH med AS (
            SELECT l_returnflag,
                   ROUND(quantile_cont(l_quantity, 0.5), 6) AS median_qty,
                   CAST(COUNT(*) AS BIGINT) AS n_rows
            FROM lineitem GROUP BY l_returnflag
        ),
        freq AS (
            SELECT l_returnflag, l_quantity,
                   COUNT(*) AS cnt,
                   ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                      ORDER BY COUNT(*) DESC, l_quantity)
                     AS rn
            FROM lineitem GROUP BY l_returnflag, l_quantity
        )
        SELECT m.l_returnflag, m.median_qty,
               f.l_quantity AS mode_qty, m.n_rows
        FROM med m JOIN freq f
          ON m.l_returnflag = f.l_returnflag AND f.rn = 1
    """,
    tags=("agg",),
)
def a15_median_mode(spark: SparkSession, sf: str) -> DataFrame:
    """Exact interpolated median plus DETERMINISTIC mode (most
    frequent value, smallest wins ties) of quantity per return flag.
    Built-in ``mode()`` is tie-nondeterministic in both engines, so
    the mode is derived from an explicit (flag, value) count ranked
    by (count DESC, value ASC) — reproducible everywhere.

    Scale: the mode path shuffles on (flag, value) — high cardinality
    splits the load — then on flag (tiny). The exact median needs the
    values per flag; at 100 TB swap in approx_percentile and document
    the error bound (a13 covers the exact-percentile family)."""
    li = load(spark, sf, "lineitem")
    med = li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_quantity, 0.5)"), 6).alias("median_qty"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    w = Window.partitionBy("l_returnflag").orderBy(
        F.col("cnt").desc(), F.col("l_quantity")
    )
    mode = (
        li.groupBy("l_returnflag", "l_quantity")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("l_returnflag", F.col("l_quantity").alias("mode_qty"))
    )
    return med.join(mode, "l_returnflag").select(
        "l_returnflag", "median_qty", "mode_qty", "n_rows"
    )


@register(
    "f12_string_agg",
    oracle="""
        SELECT n_regionkey,
               string_agg(n_name, ',' ORDER BY n_name) AS nations,
               CAST(COUNT(*) AS BIGINT) AS n_nations
        FROM nation
        GROUP BY n_regionkey
    """,
    tags=("functions", "agg"),
)
def f12_string_agg(spark: SparkSession, sf: str) -> DataFrame:
    """Ordered string aggregation (LISTAGG): comma-joined sorted
    nation names per region. ``collect_list`` is order-nondeterministic
    under parallel execution, so ``sort_array`` pins the order — the
    only way a distributed LISTAGG is reproducible.

    Scale: one shuffle on the region key; the aggregated string is
    bounded by group size (keep LISTAGG off unbounded groups)."""
    return (
        load(spark, sf, "nation")
        .groupBy("n_regionkey")
        .agg(
            F.array_join(F.sort_array(F.collect_list("n_name")), ",").alias(
                "nations"
            ),
            F.count(F.lit(1)).alias("n_nations"),
        )
    )


@register(
    "f13_price_histogram",
    oracle="""
        SELECT CAST(FLOOR(o_totalprice / 25000) AS BIGINT) AS bucket,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               ROUND(MIN(o_totalprice), 2) AS min_price,
               ROUND(MAX(o_totalprice), 2) AS max_price
        FROM orders
        GROUP BY CAST(FLOOR(o_totalprice / 25000) AS BIGINT)
    """,
    tags=("functions", "agg"),
)
def f13_price_histogram(spark: SparkSession, sf: str) -> DataFrame:
    """Equi-width histogram of order value (width_bucket shape): the
    bucket id is a pure projection (floor divide), so the histogram
    costs exactly one per-bucket aggregate — the building block for
    every distribution tile the reference renders from full result
    sets in pandas.

    Scale: map-side partial aggregation collapses each partition to
    ~n_buckets rows before the (tiny) shuffle."""
    o = load(spark, sf, "orders")
    bucket = F.floor(F.col("o_totalprice") / 25000).cast("long")
    return (
        o.groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.min("o_totalprice"), 2).alias("min_price"),
            F.round(F.max("o_totalprice"), 2).alias("max_price"),
        )
    )

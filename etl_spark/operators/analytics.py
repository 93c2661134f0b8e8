"""Headline analytical queries — the reference's pipeline shapes
(monitoring projection + threshold, full-refresh transform, dashboard
rollups) scaled up to TPC-H-style multi-join aggregations. These are
the bench.py workload.

Scale design: fact tables (lineitem, orders) are never broadcast; all
dimension lookups are. Aggregations are partial map-side. Money math
goes through DECIMAL so results are partitioning-invariant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_spark.registry import register
from etl_spark.tables import load


@register(
    "q01_pricing_summary",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                        * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sum_disc_price,
               ROUND(AVG(l_quantity), 4) AS avg_qty,
               ROUND(AVG(l_discount), 4) AS avg_disc,
               CAST(COUNT(*) AS BIGINT) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2024-09-01 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """,
    tags=("flagship", "agg"),
)
def q01_pricing_summary(spark: SparkSession, sf: str) -> DataFrame:
    """Flagship: TPC-H Q1-shaped pricing summary — the scaled-up form
    of the reference's monitoring aggregation (script 33 projection +
    rows_gt condition, scheduler.db sql_scripts row 33). One scan, one
    shuffle on a 6-value grouping key, partial aggregation map-side;
    the shipdate filter pushes into the parquet scan."""
    li = load(spark, sf, "lineitem")
    dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2024-09-01 00:00:00").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(dec("l_extendedprice") * (F.lit(1) - F.col("l_discount")).cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "q03_shipping_priority",
    oracle="""
        SELECT l.l_orderkey,
               CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                        * CAST(1 - l.l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
               o.o_orderdate, o.o_orderpriority
        FROM customer c
        JOIN orders o   ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE c.c_mktsegment = 'BUILDING'
          AND o.o_orderdate < TIMESTAMP '1998-06-15 00:00:00'
          AND l.l_shipdate  > TIMESTAMP '1998-06-15 00:00:00'
        GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
        ORDER BY revenue DESC, l_orderkey ASC
        LIMIT 10
    """,
    tags=("flagship", "join", "agg", "sort"),
)
def q03_shipping_priority(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter → fact join → top-K. The
    customer side is filtered then broadcast; lineitem⋈orders is the
    only real shuffle. Top-10 runs as TakeOrderedAndProject (no global
    sort). Cutoff sits inside the fixture's 1995-2001 date range so the
    result is non-empty (the r1-r4 '2024' cutoff selected nothing —
    vacuous green, VERDICT r4 §What's wrong #1)."""
    cust = load(spark, sf, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    cutoff = F.lit("1998-06-15 00:00:00").cast("timestamp_ntz")
    orders = load(spark, sf, "orders").filter(F.col("o_orderdate") < cutoff)
    li = load(spark, sf, "lineitem").filter(F.col("l_shipdate") > cutoff)
    revenue = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1) - F.col("l_discount")).cast("decimal(18,2)")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@register(
    "q05_region_revenue",
    oracle="""
        SELECT n.n_name,
               CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                        * CAST(1 - l.l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        FROM customer c
        JOIN orders o   ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
                       AND c.c_nationkey = s.s_nationkey
        JOIN nation n   ON s.s_nationkey = n.n_nationkey
        JOIN region r   ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'ASIA'
        GROUP BY n.n_name
    """,
    tags=("flagship", "join", "agg"),
)
def q05_region_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q5 shape: 6-table join. region/nation/supplier/customer
    all broadcast (each << fact); only lineitem⋈orders shuffles. The
    region filter prunes before any join. This is the plan shape that
    must survive 100 TB: one big-table shuffle, everything else
    map-side."""
    cust = load(spark, sf, "customer")
    orders = load(spark, sf, "orders")
    li = load(spark, sf, "lineitem")
    supp = load(spark, sf, "supplier")
    nation = load(spark, sf, "nation")
    region = load(spark, sf, "region").filter(F.col("r_name") == "ASIA")
    revenue = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1) - F.col("l_discount")).cast("decimal(18,2)")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
    )


@register(
    "q06_shop_day_rollup",
    oracle="""
        SELECT o_orderpriority AS shop,
               strftime(o_orderdate, '%Y-%m-%d') AS day,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS day_revenue
        FROM orders
        GROUP BY o_orderpriority, strftime(o_orderdate, '%Y-%m-%d')
    """,
    tags=("flagship", "agg"),
)
def q06_shop_day_rollup(spark: SparkSession, sf: str) -> DataFrame:
    """Revenue per shop/day — the direct analog of the reference's
    production monitoring query (script 33: per-店铺/日期 order export)
    as an aggregate instead of a raw dump."""
    return (
        load(spark, sf, "orders")
        .groupBy(
            F.col("o_orderpriority").alias("shop"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("day"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("day_revenue"),
        )
    )


@register(
    "s01_tumbling_window",
    oracle="""
        SELECT date_trunc('hour', ts) AS win_start,
               event_type,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        FROM events
        GROUP BY date_trunc('hour', ts), event_type
    """,
    tags=("streaming", "agg"),
)
def s01_tumbling_window(spark: SparkSession, sf: str) -> DataFrame:
    """T8 upgrade: tumbling-window event aggregation — the batch twin
    of the Structured Streaming monitor (etl_spark.streaming). Uses
    F.window so the same expression runs under readStream with a
    watermark."""
    ev = load(spark, sf, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("win_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


@register(
    "t01_dashboard_listing",
    oracle="""
        SELECT c.c_custkey, c.c_name, c.c_mktsegment,
               lo.last_orderdate, lo.last_status, lo.n_orders
        FROM customer c
        LEFT JOIN (
            SELECT o_custkey,
                   MAX(o_orderdate) AS last_orderdate,
                   MAX(o_orderstatus) AS last_status,
                   CAST(COUNT(*) AS BIGINT) AS n_orders
            FROM orders GROUP BY o_custkey
        ) lo ON c.c_custkey = lo.o_custkey
        WHERE c.c_mktsegment IN ('BUILDING', 'MACHINERY')
        ORDER BY c.c_custkey DESC
        LIMIT 50
    """,
    tags=("join", "sort"),
)
def t01_dashboard_listing(spark: SparkSession, sf: str) -> DataFrame:
    """§3.4 dashboard listing: dynamic filter (P7) + latest-status
    derived join (J4) + dedup + ORDER BY id DESC + page — as ONE plan,
    replacing the reference's N+1 per-row lookups
    (web_scheduler.py:4582-4733)."""
    cust = load(spark, sf, "customer").filter(
        F.col("c_mktsegment").isin("BUILDING", "MACHINERY")
    )
    lo = (
        load(spark, sf, "orders")
        .groupBy("o_custkey")
        .agg(
            F.max("o_orderdate").alias("last_orderdate"),
            F.max("o_orderstatus").alias("last_status"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )
    return (
        cust.join(lo, cust.c_custkey == lo.o_custkey, "left")
        .select(
            "c_custkey", "c_name", "c_mktsegment",
            "last_orderdate", "last_status", "n_orders",
        )
        .orderBy(F.desc("c_custkey"))
        .limit(50)
    )


@register(
    "s02_session_window",
    oracle="""
        WITH marked AS (
            SELECT user_id, ts, event_id,
                   CASE WHEN LAG(ts) OVER w IS NULL
                          OR date_diff('us', LAG(ts) OVER w, ts) >= 1800000000
                        THEN 1 ELSE 0 END AS new_session
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
        ),
        sessions AS (
            SELECT user_id, ts,
                   SUM(new_session) OVER (
                       PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                       ROWS UNBOUNDED PRECEDING) AS sid
            FROM marked
        )
        SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS last_event_ts,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM sessions GROUP BY user_id, sid
    """,
    tags=("streaming", "window", "agg"),
)
def s02_session_window(spark: SparkSession, sf: str) -> DataFrame:
    """Spark's NATIVE gap-session operator (`session_window`, the
    same primitive Structured Streaming uses for streaming sessions)
    cross-checked against an independent engine's window-chain
    derivation. Semantics under test: a session spans
    [first, last + gap); an event exactly `gap` after the last one
    opens a NEW session (>= boundary). last_event_ts is recovered as
    window.end - gap. One shuffle on user_id."""
    ev = load(spark, sf, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("sw"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            (F.col("sw.end") - F.expr("INTERVAL 30 MINUTES")).alias("last_event_ts"),
            "n_events",
        )
    )


@register(
    "q04_priority_exists",
    oracle="""
        SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
        FROM orders o
        WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
          AND o.o_orderdate < TIMESTAMP '1996-04-01'
          AND EXISTS (
              SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
          )
        GROUP BY o_orderpriority
    """,
    tags=("flagship", "join", "agg"),
)
def q04_priority_exists(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q4 shape (order-priority checking, adapted to the
    fixture's lineitem schema): quarter filter + EXISTS semi-join on
    late-shipping lineitems + count per priority. The EXISTS becomes
    a LeftSemi hash join — each order tested once, lineitem never
    duplicated into the aggregate. Quarter filter pushes to the
    orders scan."""
    orders = load(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1996-04-01"))
    )
    li = load(spark, sf, "lineitem").select("l_orderkey", "l_shipdate")
    hit = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey) & (li.l_shipdate > orders.o_orderdate),
        "left_semi",
    )
    return hit.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


@register(
    "q10_returned_items",
    oracle="""
        SELECT c.c_custkey, c.c_name, n.n_name,
               CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                             AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        WHERE l.l_returnflag = 'R'
          AND o.o_orderdate >= TIMESTAMP '1996-01-01'
          AND o.o_orderdate < TIMESTAMP '1996-07-01'
        GROUP BY c.c_custkey, c.c_name, n.n_name
        ORDER BY revenue DESC, c_custkey ASC
        LIMIT 20
    """,
    tags=("flagship", "join", "agg", "sort"),
)
def q10_returned_items(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q10 shape (returned-item reporting): which customers
    returned the most revenue in a half-year. Fact-side filters
    (returnflag, date window) push into both scans BEFORE the joins;
    customer and nation broadcast; one shuffle for the group-by; the
    top-20 is TakeOrderedAndProject. DECIMAL inner sum keeps the
    result partitioning-invariant; tiebreak on c_custkey keeps both
    engines' top-20 identical."""
    cust = load(spark, sf, "customer")
    nation = load(spark, sf, "nation")
    orders = load(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1996-07-01"))
    )
    li = load(spark, sf, "lineitem").filter(F.col("l_returnflag") == "R")
    revenue = (
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "q07_nation_volume",
    oracle="""
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(EXTRACT(year FROM l.l_shipdate) AS BIGINT) AS l_year,
               CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                        * CAST(1 - l.l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        FROM supplier s
        JOIN lineitem l ON s.s_suppkey = l.l_suppkey
        JOIN orders o   ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
        JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
        WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_8')
            OR (n1.n_name = 'NATION_8' AND n2.n_name = 'NATION_3'))
        GROUP BY n1.n_name, n2.n_name, EXTRACT(year FROM l.l_shipdate)
    """,
    tags=("flagship", "join", "agg"),
)
def q07_nation_volume(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q7 shape (volume shipping): bilateral trade flow between
    a nation pair, by shipment year. The same dimension table (nation)
    joins twice under different roles — supplier side and customer
    side — which is exactly the multi-role lookup the reference's
    procedural N+1 loops simulate (web_scheduler.py:4669-4688). Both
    nation copies and supplier/customer broadcast; the disjunctive
    pair filter runs after the broadcasts, pre-aggregation, so only
    lineitem⋈orders shuffles. Reference parity: SURVEY §2.3 J2/J6."""
    supp = load(spark, sf, "supplier")
    li = load(spark, sf, "lineitem")
    orders = load(spark, sf, "orders")
    cust = load(spark, sf, "customer")
    n1 = load(spark, sf, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load(spark, sf, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    revenue = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1) - F.col("l_discount")).cast("decimal(18,2)")
    )
    pair = (
        (F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_8")
    ) | ((F.col("supp_nation") == "NATION_8") & (F.col("cust_nation") == "NATION_3"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").cast("bigint").alias("l_year")
        )
        .agg(F.sum(revenue).cast("double").alias("revenue"))
    )


@register(
    "q14_promo_effect",
    oracle="""
        SELECT CAST(100 AS DOUBLE)
               * CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                          THEN CAST(l.l_extendedprice AS DECIMAL(18,2))
                               * CAST(1 - l.l_discount AS DECIMAL(18,2))
                          ELSE 0 END) AS DOUBLE)
               / CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                          * CAST(1 - l.l_discount AS DECIMAL(18,2)))
                      AS DOUBLE)
               AS promo_revenue_pct
        FROM lineitem l
        JOIN part p ON l.l_partkey = p.p_partkey
        WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
          AND l.l_shipdate <  TIMESTAMP '1996-02-01'
    """,
    tags=("flagship", "join", "agg"),
)
def q14_promo_effect(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q14 shape (promotion effect): share of one month's
    revenue attributable to promo-typed parts — a conditional
    aggregate over a fact⋈dim join, the declarative form of the
    reference's filtered-count pattern (SURVEY §2.4 A2/A6). The
    one-month shipdate range pushes into the lineitem scan (reads
    ~1/80th of the table); part broadcasts; the whole query is one
    map-side join plus a single-row global aggregate — no shuffle of
    fact data at any scale. Both sums stay EXACT decimals; each is
    cast to double once and the 100*p/t edge runs in IEEE doubles in
    the identical order on both engines (the r10 form let DuckDB's
    DECIMAL 100.00 literal reorder the arithmetic — a last-ulp
    divergence the exact gate caught when tightened, r11)."""
    li = load(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1996-02-01"))
    )
    part = load(spark, sf, "part")
    rev = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1) - F.col("l_discount")).cast("decimal(18,2)")
    )
    promo_rev = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            (
                F.lit(100.0)
                * F.sum(promo_rev).cast("double")
                / F.sum(rev).cast("double")
            ).alias("promo_revenue_pct")
        )
    )


@register(
    "q18_large_orders",
    oracle="""
        SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
               CAST(o.o_totalprice AS DOUBLE) AS o_totalprice,
               CAST(SUM(l.l_quantity) AS DOUBLE) AS total_qty
        FROM customer c
        JOIN orders o   ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        WHERE o.o_orderkey IN (
            SELECT l_orderkey FROM lineitem
            GROUP BY l_orderkey HAVING SUM(l_quantity) > 150
        )
        GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
        ORDER BY o_totalprice DESC, o_orderkey ASC
        LIMIT 20
    """,
    tags=("flagship", "join", "agg", "subquery", "sort"),
)
def q18_large_orders(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q18 shape (large-volume customers): orders whose total
    line quantity exceeds a threshold, with their customers — an
    IN-subquery over a grouped HAVING, i.e. the reference's
    existence-guard pattern (SURVEY §2.3 J7) driven by an aggregate
    instead of a COUNT probe. Spark plan: the HAVING aggregate reuses
    lineitem's l_orderkey shuffle partitioning for the semi-join
    (same key → no extra exchange under AQE); customer broadcasts;
    top-20 is TakeOrderedAndProject."""
    li = load(spark, sf, "lineitem")
    orders = load(spark, sf, "orders")
    cust = load(spark, sf, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 150)
    )
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey, "left_semi")
        .join(li, F.col("o_orderkey") == li.l_orderkey)
        .join(F.broadcast(cust), F.col("o_custkey") == cust.c_custkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum("l_quantity").cast("double").alias("total_qty"))
        .withColumn("o_totalprice", F.col("o_totalprice").cast("double"))
        .select("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice", "total_qty")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(20)
    )


@register(
    "q19_disjunctive_revenue",
    oracle="""
        SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                        * CAST(1 - l.l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
               AND l.l_quantity BETWEEN 1 AND 21)
           OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25
               AND l.l_quantity BETWEEN 10 AND 30)
           OR (p.p_brand = 'Brand#7'  AND p.p_size BETWEEN 1 AND 35
               AND l.l_quantity BETWEEN 20 AND 40)
    """,
    tags=("flagship", "join", "agg"),
)
def q19_disjunctive_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q19 shape (discounted revenue): a three-branch OR of
    conjunctive brand/size/quantity predicates spanning both join
    sides — the stress case for the reference's dynamic WHERE builder
    (SURVEY §2.2 P7) when branches are OR-ed rather than AND-ed.
    Catalyst splits the disjunction: the common-factor single-side
    predicates (derivable quantity/size bounds) push into each scan,
    the cross-side residual evaluates post-join. part broadcasts, so
    the whole query is scan → broadcast-join → single-row agg with no
    fact shuffle."""
    li = load(spark, sf, "lineitem")
    part = load(spark, sf, "part")
    joined = li.join(F.broadcast(part), part.p_partkey == li.l_partkey)
    branch = lambda brand, smax, qlo, qhi: (  # noqa: E731
        (F.col("p_brand") == brand)
        & F.col("p_size").between(1, smax)
        & F.col("l_quantity").between(qlo, qhi)
    )
    rev = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1) - F.col("l_discount")).cast("decimal(18,2)")
    )
    return (
        joined.filter(
            branch("Brand#12", 15, 1, 21)
            | branch("Brand#23", 25, 10, 30)
            | branch("Brand#7", 35, 20, 40)
        ).agg(F.sum(rev).cast("double").alias("revenue"))
    )

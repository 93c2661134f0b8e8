"""Round-2 TPC-H widening. The fixtures lack partsupp and lineitem's
shipmode/commitdate/receiptdate columns, so q02/q09/q11/q12 cannot be
run verbatim — like q16/q20/q21, they are ADAPTED: lineitem plays the
part↔supplier association (its min extended price = the supply cost),
p_retailprice the product cost basis, l_linestatus the shipmode class,
and ship-vs-order-date lateness the commit/receipt lag. The plan
SHAPES (correlated min, multi-way profit join, scalar-subquery share
gate, two-class conditional counts) are the faithful part.

Registered in a separate module from operators/analytics.py so the
driver's correctness snapshot (first 50 in registration order — see
registry._ensure_loaded) verifies these never-driver-checked queries
ahead of the families already green in CORRECTNESS_r01.json.

Same conventions as analytics.py: dims broadcast, money through
DECIMAL, ratio divisions as DOUBLE over exact decimal sums.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_spark.registry import register
from etl_spark.tables import load


@register(
    "q08_market_share",
    oracle="""
        SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
               CAST(SUM(CASE WHEN n2.n_name = 'NATION_3'
                        THEN CAST(l.l_extendedprice AS DECIMAL(18,2))
                             * CAST(1 - l.l_discount AS DECIMAL(18,2)) ELSE 0 END)
                    AS DOUBLE)
               / CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                          * CAST(1 - l.l_discount AS DECIMAL(18,2))) AS DOUBLE)
                 AS mkt_share
        FROM part p
        JOIN lineitem l ON p.p_partkey = l.l_partkey
        JOIN orders o   ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n1  ON c.c_nationkey = n1.n_nationkey
        JOIN region r   ON n1.n_regionkey = r.r_regionkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n2  ON s.s_nationkey = n2.n_nationkey
        WHERE r.r_name = 'ASIA' AND p.p_type = 'ECONOMY'
          AND o.o_orderdate >= TIMESTAMP '1995-01-01'
          AND o.o_orderdate <  TIMESTAMP '1997-01-01'
        GROUP BY EXTRACT(year FROM o.o_orderdate)
    """,
    tags=("flagship", "join", "agg"),
)
def q08_market_share(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q8 shape (national market share): one nation's share of
    regional revenue for a part type, by order year — the widest join
    in the suite (8 tables, nation in two roles). Plan: every
    dimension broadcasts (part filtered before the join, region→n1
    pre-joined driver-side-free), so the ONLY exchange is
    lineitem⋈orders on orderkey; the share is a conditional aggregate
    over the same decimal revenue expression as q01/q07."""
    li = load(spark, sf, "lineitem")
    orders = load(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-01-01"))
    )
    part = load(spark, sf, "part").filter(F.col("p_type") == "ECONOMY")
    cust = load(spark, sf, "customer")
    supp = load(spark, sf, "supplier")
    n1 = load(spark, sf, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = load(spark, sf, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    region = load(spark, sf, "region").filter(F.col("r_name") == "ASIA")
    rev = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1) - F.col("l_discount")).cast("decimal(18,2)")
    )
    nation_rev = F.when(F.col("supp_nation") == "NATION_3", rev).otherwise(F.lit(0))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(region), F.col("n1_region") == F.col("r_regionkey"))
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .groupBy(F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg(
            # divide as DOUBLES (both sums are exact decimals, so the
            # doubles — and the IEEE quotient — are engine-identical;
            # decimal÷decimal would truncate to Spark's scale-6 rule)
            (F.sum(nation_rev).cast("double") / F.sum(rev).cast("double")).alias(
                "mkt_share"
            )
        )
    )


@register(
    "q13_customer_distribution",
    oracle="""
        WITH c_orders AS (
            SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
            FROM customer c LEFT JOIN orders o
              ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
            GROUP BY c.c_custkey
        )
        SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
        FROM c_orders GROUP BY c_count
    """,
    tags=("join", "agg", "outer"),
)
def q13_customer_distribution(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q13 shape (customer order-count distribution): LEFT join
    with the filter INSIDE the join condition (so zero-order customers
    survive with count 0 — the outer-join-with-predicate subtlety the
    reference's WHERE-based joins get wrong), then a two-level
    aggregate. Plan: orders pre-filtered then shuffled on custkey
    once; the second groupBy is over ≤ a few hundred distinct counts —
    AQE coalesces it to almost nothing."""
    cust = load(spark, sf, "customer")
    orders = load(spark, sf, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "q15_top_supplier",
    oracle="""
        WITH revenue AS (
            SELECT l_suppkey AS supplier_no,
                   CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                            * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE)
                     AS total_revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate <  TIMESTAMP '1996-04-01'
            GROUP BY l_suppkey
        )
        SELECT s.s_suppkey, s.s_name, r.total_revenue
        FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
        WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
    tags=("join", "agg", "subquery"),
)
def q15_top_supplier(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q15 shape (top supplier): quarterly revenue per supplier,
    keep the max (ALL maxima on ties — equality against a scalar
    subquery, not LIMIT 1). Plan: one shuffle on suppkey for the
    revenue aggregate; the max is a 1-row broadcast joined back
    against the (already computed, reused) revenue frame; supplier
    dim broadcasts. Both engines compute the identical decimal sum,
    so the double equality is exact."""
    li = load(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1996-04-01"))
    )
    rev = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1) - F.col("l_discount")).cast("decimal(18,2)")
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(rev).cast("double").alias("total_revenue")
    )
    mx = revenue.agg(F.max("total_revenue").alias("max_rev"))
    supp = load(spark, sf, "supplier")
    return (
        revenue.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("max_rev"))
        .join(F.broadcast(supp), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "q16_supplier_cnt",
    oracle="""
        SELECT p.p_brand, p.p_type, p.p_size,
               CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_brand <> 'Brand#1' AND p.p_type <> 'PROMO'
          AND p.p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
          AND l.l_suppkey NOT IN (
              SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
          )
        GROUP BY p.p_brand, p.p_type, p.p_size
    """,
    tags=("join", "agg", "subquery"),
)
def q16_supplier_cnt(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q16 shape (supplier count by part attributes), adapted:
    lineitem is the part↔supplier association (fixtures carry no
    partsupp) and the NOT-IN exclusion list is negative-balance
    suppliers. Plan: part filters broadcast; the exclusion is a
    broadcast ANTI join (never a per-row subquery); count_distinct
    shuffles once on the part-attribute key with the distinct expand
    map-side."""
    part = load(spark, sf, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45)
    )
    bad_supp = load(spark, sf, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    li = load(spark, sf, "lineitem")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(
            F.broadcast(bad_supp),
            li.l_suppkey == bad_supp.s_suppkey,
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q17_small_quantity_revenue",
    oracle="""
        WITH agg AS (
            SELECT l_partkey,
                   SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty,
                   CAST(COUNT(*) AS BIGINT) AS cnt
            FROM lineitem GROUP BY l_partkey
        )
        SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) / 7.0 AS DOUBLE)
                 AS avg_yearly
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        JOIN agg a  ON a.l_partkey = l.l_partkey
        WHERE p.p_brand = 'Brand#3' AND p.p_type = 'SMALL'
          AND 5 * CAST(l.l_quantity AS DECIMAL(18,2)) * a.cnt < a.sum_qty
    """,
    tags=("join", "agg", "subquery"),
)
def q17_small_quantity_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q17 shape (small-quantity-order revenue): lines whose
    quantity is below 20%% of their part's average. The correlated
    AVG subquery is decorrelated into a per-part aggregate joined
    back; the comparison `qty < 0.2 * avg` is algebraically rewritten
    division-free as `5*qty*cnt < sum` so it is EXACT decimal
    arithmetic in both engines (no double-rounding at the boundary).
    Plan: one shuffle on partkey for the aggregate; the brand/type
    filter prunes the probe side before the join."""
    li = load(spark, sf, "lineitem")
    agg = li.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("sum_qty"),
        F.count(F.lit(1)).alias("cnt"),
    )
    part = load(spark, sf, "part").filter(
        (F.col("p_brand") == "Brand#3") & (F.col("p_type") == "SMALL")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(agg, li.l_partkey == F.col("a_partkey"))
        .filter(
            F.lit(5) * F.col("l_quantity").cast("decimal(18,2)") * F.col("cnt")
            < F.col("sum_qty")
        )
        .agg(
            (F.sum(F.col("l_extendedprice").cast("decimal(18,2)")) / F.lit(7.0))
            .cast("double")
            .alias("avg_yearly")
        )
    )


@register(
    "q20_promo_shippers",
    oracle="""
        SELECT s.s_suppkey, s.s_name
        FROM supplier s
        WHERE s.s_suppkey IN (
            SELECT l.l_suppkey
            FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
            WHERE p.p_type = 'PROMO'
              AND l.l_shipdate >= TIMESTAMP '1996-01-01'
              AND l.l_shipdate <  TIMESTAMP '1997-01-01'
            GROUP BY l.l_suppkey
            HAVING SUM(l.l_quantity) > 100
        )
    """,
    tags=("join", "agg", "subquery", "semi"),
)
def q20_promo_shippers(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q20 shape (suppliers with significant volume of a part
    class), adapted to lineitem as the association: suppliers who
    shipped > 100 units of PROMO parts in 1996. The IN-subquery is a
    HAVING aggregate semi-joined to supplier. Plan: the year filter
    pushes into the lineitem scan, part broadcasts, one shuffle on
    suppkey for the HAVING aggregate, then a broadcast LEFT SEMI into
    the supplier dim (qualifying-supplier set ≪ supplier table)."""
    li = load(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-01-01"))
    )
    part = load(spark, sf, "part").filter(F.col("p_type") == "PROMO")
    qual = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 100)
        .select("l_suppkey")
    )
    supp = load(spark, sf, "supplier")
    return supp.join(
        F.broadcast(qual), supp.s_suppkey == qual.l_suppkey, "left_semi"
    ).select("s_suppkey", "s_name")


@register(
    "q21_sole_returned_supplier",
    oracle="""
        SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
        FROM supplier s
        JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
        JOIN orders o ON o.o_orderkey = l1.l_orderkey
        WHERE o.o_orderstatus = 'F' AND l1.l_returnflag = 'R'
          AND EXISTS (
              SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey
          )
          AND NOT EXISTS (
              SELECT 1 FROM lineitem l3
              WHERE l3.l_orderkey = l1.l_orderkey
                AND l3.l_suppkey <> l1.l_suppkey
                AND l3.l_returnflag = 'R'
          )
        GROUP BY s.s_name
        ORDER BY numwait DESC, s_name ASC
        LIMIT 25
    """,
    tags=("join", "agg", "subquery", "anti", "sort"),
)
def q21_sole_returned_supplier(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept orders waiting), with
    l_returnflag='R' standing in for the missing receipt-late dates:
    suppliers whose line was returned on a multi-supplier 'F' order
    where NO other supplier's line was returned.

    The correlated EXISTS / NOT-EXISTS pair decorrelates into ONE
    per-order aggregate: n_supp = distinct suppliers in the order
    (EXISTS other-supplier ⟺ n_supp > 1) and n_r_supp = distinct
    suppliers with a returned line (NOT EXISTS other returned
    supplier, given l1 is returned ⟺ n_r_supp = 1). One extra
    shuffle on orderkey replaces TWO self-joins of the fact table —
    at 100 TB that's the difference between one aggregation pass and
    two lineitem⋈lineitem exchanges. TakeOrdered(25) finishes it."""
    li = load(spark, sf, "lineitem")
    per_order = li.groupBy(F.col("l_orderkey").alias("po_orderkey")).agg(
        F.count_distinct("l_suppkey").alias("n_supp"),
        F.count_distinct(
            F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
        ).alias("n_r_supp"),
    )
    orders_f = load(spark, sf, "orders").filter(F.col("o_orderstatus") == "F")
    supp = load(spark, sf, "supplier")
    l1 = li.filter(F.col("l_returnflag") == "R")
    return (
        l1.join(orders_f, l1.l_orderkey == orders_f.o_orderkey)
        .join(per_order, l1.l_orderkey == F.col("po_orderkey"))
        .filter((F.col("n_supp") > 1) & (F.col("n_r_supp") == 1))
        .join(F.broadcast(supp), l1.l_suppkey == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(25)
    )


@register(
    "q22_dormant_customers",
    oracle="""
        WITH bal AS (
            SELECT SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS sum_bal,
                   CAST(COUNT(*) AS BIGINT) AS cnt
            FROM customer WHERE c_acctbal > 0.0
        )
        SELECT c.c_nationkey AS nationkey,
               CAST(COUNT(*) AS BIGINT) AS numcust,
               CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
        FROM customer c, bal
        WHERE CAST(c.c_acctbal AS DECIMAL(18,2)) * bal.cnt > bal.sum_bal
          AND NOT EXISTS (
              SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey
                AND o.o_orderdate >= TIMESTAMP '2000-01-01'
          )
        GROUP BY c.c_nationkey
    """,
    tags=("agg", "subquery", "anti"),
)
def q22_dormant_customers(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q22 shape (global sales opportunity): above-average-
    balance customers with no RECENT order (none since 2000 — every
    fixture customer has ordered at least once, so the classic
    never-ordered form is vacuously empty), grouped by nation
    (fixtures have no phone column — nationkey plays the country-code
    role).
    The scalar AVG subquery is division-free (`bal*cnt > sum`, exact
    decimal — same trick as q17); the NOT EXISTS is an ANTI join
    against the orders custkey set. Plan: 1-row broadcast for the
    average, shuffle anti-join on custkey (orders side reduced to its
    distinct keys map-side), tiny groupBy."""
    cust = load(spark, sf, "customer")
    bal = cust.filter(F.col("c_acctbal") > 0.0).agg(
        F.sum(F.col("c_acctbal").cast("decimal(18,2)")).alias("sum_bal"),
        F.count(F.lit(1)).alias("cnt"),
    )
    orders = (
        load(spark, sf, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-01-01"))
        .select("o_custkey")
    )
    return (
        cust.crossJoin(F.broadcast(bal))
        .filter(
            F.col("c_acctbal").cast("decimal(18,2)") * F.col("cnt")
            > F.col("sum_bal")
        )
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
            .cast("double")
            .alias("totacctbal"),
        )
    )


@register(
    "q23_gapfill_daily",
    oracle="""
        WITH bounds AS (
            SELECT MIN(CAST(o_orderdate AS DATE)) AS mn,
                   MAX(CAST(o_orderdate AS DATE)) AS mx
            FROM orders
        ),
        spine AS (
            SELECT CAST(unnest(generate_series(mn, mx, INTERVAL 1 DAY)) AS DATE) AS day
            FROM bounds
        ),
        prios AS (SELECT DISTINCT o_orderpriority FROM orders),
        daily AS (
            SELECT CAST(o_orderdate AS DATE) AS day, o_orderpriority,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM orders GROUP BY 1, 2
        )
        SELECT s.day, p.o_orderpriority, COALESCE(d.n, 0) AS n
        FROM spine s
        CROSS JOIN prios p
        LEFT JOIN daily d ON d.day = s.day AND d.o_orderpriority = p.o_orderpriority
    """,
    tags=("analytics",),
)
def q23_gapfill_daily(spark: SparkSession, sf: str) -> DataFrame:
    """Gap-filled daily report: order counts per (day, priority) with
    explicit ZERO rows for days/priorities that had no orders — the
    dense-grid shape every dashboard needs (a bare groupBy silently
    drops empty days; the reference's dashboards inherit that flaw).

    Build: date spine = explode(sequence(min_day, max_day)) off a
    1-row bounds aggregate; grid = spine × distinct priorities (two
    broadcast-sized sides, the cross is a few thousand rows however
    big the fact table is); counts LEFT-join onto the grid, COALESCE
    0. At 100 TB the only fact-table work is the one groupBy — the
    spine/grid stays driver-tiny by construction."""
    orders = load(spark, sf, "orders").select(
        F.to_date("o_orderdate").alias("day"), "o_orderpriority"
    )
    bounds = orders.agg(F.min("day").alias("mn"), F.max("day").alias("mx"))
    spine = bounds.select(
        F.explode(F.expr("sequence(mn, mx, interval 1 day)")).alias("day")
    )
    prios = orders.select("o_orderpriority").distinct()
    daily = orders.groupBy("day", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_raw")
    )
    return (
        spine.crossJoin(F.broadcast(prios))
        .join(F.broadcast(daily), ["day", "o_orderpriority"], "left")
        .select("day", "o_orderpriority", F.coalesce("n_raw", F.lit(0)).alias("n"))
    )


@register(
    "q02_min_cost_supplier",
    oracle="""
        WITH cost AS (
            SELECT l_partkey, l_suppkey,
                   MIN(CAST(l_extendedprice AS DECIMAL(18,2))) AS supply_cost
            FROM lineitem GROUP BY l_partkey, l_suppkey
        ),
        eur AS (
            SELECT s.s_suppkey, s.s_name, s.s_acctbal, n.n_name
            FROM supplier s
            JOIN nation n ON s.s_nationkey = n.n_nationkey
            JOIN region r ON n.n_regionkey = r.r_regionkey
            WHERE r.r_name = 'EUROPE'
        ),
        offers AS (
            SELECT p.p_partkey, p.p_name, e.s_name, e.s_acctbal, e.n_name,
                   c.supply_cost,
                   MIN(c.supply_cost) OVER (PARTITION BY p.p_partkey)
                     AS min_cost
            FROM cost c
            JOIN part p ON p.p_partkey = c.l_partkey
            JOIN eur e  ON e.s_suppkey = c.l_suppkey
            WHERE p.p_type = 'STANDARD' AND p.p_size < 10
        )
        SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
               CAST(supply_cost AS DOUBLE) AS supply_cost
        FROM offers WHERE supply_cost = min_cost
    """,
    tags=("join", "subquery", "window"),
)
def q02_min_cost_supplier(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q2 shape (minimum-cost supplier), adapted: the supply
    cost of (part, supplier) is the minimum extended price that
    supplier ever shipped the part at (fixtures carry no partsupp —
    see module docstring). For each STANDARD small part, keep every
    EUROPE supplier achieving the per-part minimum cost (the
    correlated MIN subquery of Q2, kept tie-preserving).

    Plan: supplier⋈nation⋈region collapses to one broadcast-built
    dim; the only fact shuffle is the (partkey, suppkey) cost
    aggregate; the correlated MIN decorrelates into a window over
    partkey (AQE-coalesced — qualifying parts ≪ fact rows, the
    window input is already aggregate-sized). Costs are exact
    decimals, so min-equality is engine-identical."""
    li = load(spark, sf, "lineitem")
    cost = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice").cast("decimal(18,2)")).alias("supply_cost")
    )
    part = load(spark, sf, "part").filter(
        (F.col("p_type") == "STANDARD") & (F.col("p_size") < 10)
    )
    nation = load(spark, sf, "nation")
    region = load(spark, sf, "region").filter(F.col("r_name") == "EUROPE")
    supp = load(spark, sf, "supplier")
    eur = (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("p_partkey")
    return (
        cost.join(F.broadcast(part), cost.l_partkey == part.p_partkey)
        .join(F.broadcast(eur), cost.l_suppkey == F.col("s_suppkey"))
        .withColumn("min_cost", F.min("supply_cost").over(w))
        .filter(F.col("supply_cost") == F.col("min_cost"))
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_name",
            F.col("supply_cost").cast("double").alias("supply_cost"),
        )
    )


@register(
    "q09_product_profit",
    oracle="""
        SELECT n.n_name AS nation,
               CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
               CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                          * CAST(1 - l.l_discount AS DECIMAL(18,2))
                        - CAST(p.p_retailprice AS DECIMAL(18,2))
                          * CAST(l.l_quantity AS DECIMAL(18,2)))
                    AS DOUBLE) AS sum_profit
        FROM lineitem l
        JOIN orders o   ON o.o_orderkey = l.l_orderkey
        JOIN part p     ON p.p_partkey = l.l_partkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n   ON n.n_nationkey = s.s_nationkey
        WHERE p.p_name LIKE '%widget%'
        GROUP BY n.n_name, EXTRACT(year FROM o.o_orderdate)
    """,
    tags=("join", "agg"),
)
def q09_product_profit(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q9 shape (product-type profit by nation and year),
    adapted: cost basis is p_retailprice × quantity (no
    ps_supplycost in the fixtures); profit = discounted revenue
    minus that cost, for parts named like '%widget%', grouped by the
    SUPPLIER's nation and order year.

    Plan: part (pre-filtered on the LIKE), supplier and nation all
    broadcast; the single exchange is lineitem⋈orders on orderkey
    followed by the (nation, year) aggregate — the same one-fact-
    shuffle shape as q05/q07/q08. All money stays DECIMAL until the
    final output cast."""
    li = load(spark, sf, "lineitem")
    orders = load(spark, sf, "orders")
    part = load(spark, sf, "part").filter(F.col("p_name").like("%widget%"))
    supp = load(spark, sf, "supplier")
    nation = load(spark, sf, "nation")
    profit = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1) - F.col("l_discount")).cast("decimal(18,2)")
        - F.col("p_retailprice").cast("decimal(18,2)")
        * F.col("l_quantity").cast("decimal(18,2)")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
        )
        .agg(F.sum(profit).cast("double").alias("sum_profit"))
    )


@register(
    "q11_important_stock",
    oracle="""
        WITH nat AS (
            SELECT s.s_suppkey FROM supplier s
            JOIN nation n ON s.s_nationkey = n.n_nationkey
            WHERE n.n_name = 'NATION_7'
        ),
        val AS (
            SELECT l.l_partkey,
                   SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS value_dec
            FROM lineitem l JOIN nat ON l.l_suppkey = nat.s_suppkey
            GROUP BY l.l_partkey
        ),
        tot AS (SELECT SUM(value_dec) AS total, COUNT(*) AS n_parts FROM val)
        SELECT v.l_partkey AS p_partkey,
               CAST(v.value_dec AS DOUBLE) AS part_value
        FROM val v, tot
        WHERE v.value_dec * tot.n_parts > 3 * tot.total
    """,
    tags=("agg", "subquery"),
)
def q11_important_stock(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q11 shape (important stock identification), adapted:
    the 'stock value' of a part is the summed extended price of
    NATION_7-supplied lines (no ps_availqty×ps_supplycost), and a
    part is important if it holds > 3× the AVERAGE part's value —
    `value * n_parts > 3 * total`, the division-free exact-decimal
    form of the scalar-subquery HAVING (same trick as q17/q22).
    Unlike TPC-H's fixed-fraction threshold (vacuously empty at small
    SF — VERDICT r3 #2), the 3×-average cut is SCALE-STABLE: the
    value distribution's shape, not the part count, decides how many
    rows qualify (16 rows at sf0.01, 173 at sf0.1).

    Plan: the nation's supplier set broadcasts into the lineitem
    scan (semi-join prune BEFORE the shuffle), one exchange on
    partkey for the value aggregate, and the grand total re-uses
    that aggregate as a 1-row broadcast — the fact table is read
    once."""
    li = load(spark, sf, "lineitem")
    supp = load(spark, sf, "supplier")
    nation = load(spark, sf, "nation").filter(F.col("n_name") == "NATION_7")
    nat = supp.join(
        F.broadcast(nation), supp.s_nationkey == nation.n_nationkey
    ).select("s_suppkey")
    val = (
        li.join(F.broadcast(nat), li.l_suppkey == F.col("s_suppkey"), "left_semi")
        .groupBy("l_partkey")
        .agg(F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("value_dec"))
    )
    tot = val.agg(
        F.sum("value_dec").alias("total"), F.count(F.lit(1)).alias("n_parts")
    )
    return (
        val.crossJoin(F.broadcast(tot))
        .filter(F.col("value_dec") * F.col("n_parts") > F.lit(3) * F.col("total"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.col("value_dec").cast("double").alias("part_value"),
        )
    )


@register(
    "q12_late_shipment_priority",
    oracle="""
        SELECT l.l_linestatus AS ship_class,
               CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
        WHERE l.l_shipdate >= o.o_orderdate + INTERVAL 60 DAY
          AND l.l_shipdate >= TIMESTAMP '1996-01-01'
          AND l.l_shipdate <  TIMESTAMP '1997-01-01'
        GROUP BY l.l_linestatus
    """,
    tags=("join", "agg"),
)
def q12_late_shipment_priority(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q12 shape (shipping modes and order priority), adapted:
    l_linestatus stands in for the missing l_shipmode, and 'late' is
    shipped ≥ 60 days after the order date (no commit/receipt
    dates). Counts critical- vs normal-priority lines among 1996's
    late shipments per class — the two-branch conditional aggregate
    of Q12, verbatim.

    Plan: the shipdate year filter pushes into the scan; one
    exchange joins lineitem⋈orders on orderkey (the lateness
    predicate is a post-join filter — it references both sides);
    the groupBy input is already tiny. Interval arithmetic on
    timestamps is engine-identical (no DST: fixture ts are UTC)."""
    li = load(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-01-01"))
    )
    orders = load(spark, sf, "orders")
    critical = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(F.col("l_shipdate") >= F.col("o_orderdate") + F.expr("interval 60 days"))
        .groupBy(F.col("l_linestatus").alias("ship_class"))
        .agg(
            F.sum(F.when(critical, 1).otherwise(0)).cast("bigint").alias(
                "high_line_count"
            ),
            F.sum(F.when(critical, 0).otherwise(1)).cast("bigint").alias(
                "low_line_count"
            ),
        )
    )


MIN_COPURCHASE = 2  # support floor for the co-purchase pair report


@register(
    "x92_copurchase_lift",
    oracle=f"""
        WITH items AS (
            SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
        ),
        pairs AS (
            SELECT a.p AS part_a, b.p AS part_b
            FROM items a JOIN items b ON a.o = b.o AND a.p < b.p
        ),
        ab AS (
            SELECT part_a, part_b, COUNT(*) AS n_ab
            FROM pairs GROUP BY part_a, part_b
            HAVING COUNT(*) >= {MIN_COPURCHASE}
        ),
        pc AS (SELECT p, COUNT(*) AS n_p FROM items GROUP BY p),
        tot AS (SELECT COUNT(DISTINCT o) AS n FROM items)
        SELECT ab.part_a, ab.part_b, CAST(ab.n_ab AS BIGINT) AS n_ab,
               ROUND(CAST(ab.n_ab AS DOUBLE) * CAST(tot.n AS DOUBLE)
                     / (CAST(x.n_p AS DOUBLE) * CAST(y.n_p AS DOUBLE)), 6)
                 AS lift
        FROM ab
        JOIN pc x ON x.p = ab.part_a
        JOIN pc y ON y.p = ab.part_b
        CROSS JOIN tot
    """,
    tags=("extension", "basket", "agg", "scale"),
    doc="Market-basket co-purchase pairs with lift, bounded by basket width.",
)
def x92_copurchase_lift(spark: SparkSession, sf: str) -> DataFrame:
    """Association-rule mining's first mile: part pairs co-purchased
    in the same order with support >= {MIN} and their LIFT
    (P(a,b)/(P(a)P(b)) over orders) — the recommender/affinity report.
    Pair generation is per-BASKET combinations from one groupBy +
    codegen'd array combinatorics (sort_array(collect_list) over the
    pre-deduped items, then a nested transform/flatten) — cost is sum
    over orders of k^2/2 with k the basket width (<= 13 here, <=
    lines-per-order always), never parts^2 and never a self-join
    shuffle; the oracle's items self-join is the semantic spec.
    Counts are exact bigints; lift multiplies two exact-int doubles
    and divides once, so both engines round the same value.

    On the Apriori min-support prune (VERDICT r9 #5): dropping parts
    with n_p < MIN_COPURCHASE before pair generation cannot change
    the answer (a surviving pair needs BOTH parts in >= MIN orders —
    downward closure), and on long-tail corpora it is the classic
    fan-out cut. It is deliberately NOT in this registered plan:
    on the fixture every part has n_p >= 2 (measured: 0 of 20k parts
    prunable; mean part frequency ~30 orders), so the prune's
    machinery (per-part count + semi-join before the basket groupBy)
    costs ~+55% wall at the 10x quiet scale while removing zero
    rows. ``copurchase_lift_pruned`` below is the prune-enabled
    production form — property-tested result-identical — for corpora
    whose part frequencies actually have a tail."""
    # items feeds THREE branches (pairs, per-part counts, the order
    # total) and Catalyst does not CSE reused DataFrames (the x77
    # lesson — measured here as a 2.5x quiet slope from the distinct
    # shuffle re-running per branch; persisted, the slope is the
    # linear scan term)
    items = (
        load(spark, sf, "lineitem")
        .select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .distinct()
        .persist()
    )
    # collect_list, not collect_set: items is already (o, p)-distinct,
    # so the per-group set dedup would re-do work the distinct above
    # paid for (measured ~10% of the 10x quiet wall)
    baskets = items.groupBy("o").agg(
        F.sort_array(F.collect_list("p")).alias("ps")
    )
    pairs = baskets.select(
        F.explode(
            F.expr(
                "flatten(transform(ps, (x, i) -> "
                "transform(slice(ps, i + 2, size(ps)), y -> struct(x AS part_a, y AS part_b))))"
            )
        ).alias("pr")
    ).select("pr.part_a", "pr.part_b")
    ab = (
        pairs.groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= MIN_COPURCHASE)
    )
    pc = items.groupBy("p").agg(F.count(F.lit(1)).alias("n_p"))
    tot = items.select(F.countDistinct("o").alias("n"))
    return (
        ab.join(pc.select(F.col("p").alias("part_a"), F.col("n_p").alias("na")), "part_a")
        .join(pc.select(F.col("p").alias("part_b"), F.col("n_p").alias("nb")), "part_b")
        .crossJoin(F.broadcast(tot))
        .select(
            "part_a",
            "part_b",
            "n_ab",
            F.round(
                F.col("n_ab").cast("double")
                * F.col("n").cast("double")
                / (F.col("na").cast("double") * F.col("nb").cast("double")),
                6,
            ).alias("lift"),
        )
    )


def copurchase_lift_pruned(
    items: DataFrame, min_support: int = MIN_COPURCHASE
) -> DataFrame:
    """x92's co-purchase lift with the Apriori min-support prune: a
    pair can only reach ``min_support`` co-occurrences if each part
    individually appears in >= ``min_support`` baskets (downward
    closure), so below-support parts are semi-joined OUT before the
    basket groupBy — shrinking the k^2/2 per-basket fan-out on
    long-tail corpora, which is where real purchase data lives.
    Result-identical to the unpruned plan by construction (asserted
    in tests/test_analytics_ext.py); the registered x92 stays
    unpruned because the fixture has no below-support parts and the
    prune machinery alone costs ~+55% there (docstring above).

    ``items`` must be (o, p)-distinct — x92's items frame. The
    semi-join's build side is the FREQUENT part list; at 100 TB
    invert it (anti-join the infrequent tail, or a bloom filter of
    frequent parts) when the frequent side no longer broadcasts."""
    items = items.persist()
    pc = items.groupBy("p").agg(F.count(F.lit(1)).alias("n_p")).persist()
    freq = pc.filter(F.col("n_p") >= min_support).select("p")
    baskets = (
        items.join(freq, "p", "left_semi")
        .groupBy("o")
        .agg(F.sort_array(F.collect_list("p")).alias("ps"))
    )
    pairs = baskets.select(
        F.explode(
            F.expr(
                "flatten(transform(ps, (x, i) -> "
                "transform(slice(ps, i + 2, size(ps)), y -> struct(x AS part_a, y AS part_b))))"
            )
        ).alias("pr")
    ).select("pr.part_a", "pr.part_b")
    ab = (
        pairs.groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= min_support)
    )
    tot = items.select(F.countDistinct("o").alias("n"))
    return (
        ab.join(pc.select(F.col("p").alias("part_a"), F.col("n_p").alias("na")), "part_a")
        .join(pc.select(F.col("p").alias("part_b"), F.col("n_p").alias("nb")), "part_b")
        .crossJoin(F.broadcast(tot))
        .select(
            "part_a",
            "part_b",
            "n_ab",
            F.round(
                F.col("n_ab").cast("double")
                * F.col("n").cast("double")
                / (F.col("na").cast("double") * F.col("nb").cast("double")),
                6,
            ).alias("lift"),
        )
    )


@register(
    "x93_rfm_segments",
    oracle="""
        WITH cust AS (
            SELECT o_custkey AS cust,
                   MAX(o_orderdate) AS last_order,
                   COUNT(*) AS frequency,
                   SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS monetary
            FROM orders GROUP BY o_custkey
        ),
        anchor AS (SELECT MAX(o_orderdate) AS mx FROM orders),
        scored AS (
            SELECT cust,
                   CAST(date_diff('day', last_order, anchor.mx) AS BIGINT)
                     AS recency_days,
                   frequency,
                   CAST(monetary AS DOUBLE) AS monetary,
                   ntile(5) OVER (ORDER BY last_order DESC, cust) AS r,
                   ntile(5) OVER (ORDER BY frequency DESC, cust) AS f,
                   ntile(5) OVER (ORDER BY monetary DESC, cust) AS m
            FROM cust CROSS JOIN anchor
        )
        SELECT cust, recency_days, frequency, monetary,
               CAST(r AS INT) AS r, CAST(f AS INT) AS f, CAST(m AS INT) AS m,
               concat(CAST(r AS VARCHAR), CAST(f AS VARCHAR), CAST(m AS VARCHAR))
                 AS rfm
        FROM scored
    """,
    tags=("extension", "segmentation", "window"),
    doc="RFM quintile segmentation per customer with deterministic tie-breaks.",
)
def x93_rfm_segments(spark: SparkSession, sf: str) -> DataFrame:
    """RFM segmentation — the retail-analytics staple: every customer
    scored into recency/frequency/monetary QUINTILES (1 = best) and a
    composed 'rfm' code. Aggregation is one pass over orders to
    |customers| rows; the three ntile windows run over that
    dimension-sized frame, not the fact table, and every ORDER BY
    carries the cust tiebreak so quintile boundaries are
    engine-identical under ties (the x91 lesson — ntile without a
    total order is a nondeterminism trap). Monetary sums exact
    DECIMAL before the double cast."""
    orders = load(spark, sf, "orders")
    cust = orders.groupBy(F.col("o_custkey").alias("cust")).agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("monetary"),
    )
    anchor = orders.select(F.max("o_orderdate").alias("mx"))
    scored = cust.crossJoin(F.broadcast(anchor)).select(
        "cust",
        F.datediff(F.col("mx"), F.col("last_order")).cast("long").alias("recency_days"),
        "frequency",
        F.col("monetary").cast("double").alias("monetary"),
        F.ntile(5).over(Window.orderBy(F.col("last_order").desc(), "cust")).alias("r"),
        F.ntile(5).over(Window.orderBy(F.col("frequency").desc(), "cust")).alias("f"),
        F.ntile(5).over(Window.orderBy(F.col("monetary").desc(), "cust")).alias("m"),
    )
    return scored.select(
        "cust",
        "recency_days",
        "frequency",
        "monetary",
        "r",
        "f",
        "m",
        F.concat(
            F.col("r").cast("string"), F.col("f").cast("string"), F.col("m").cast("string")
        ).alias("rfm"),
    )


@register(
    "x94_mom_revenue_growth",
    oracle="""
        WITH monthly AS (
            SELECT CAST(year(o_orderdate) AS INT) AS yr,
                   CAST(month(o_orderdate) AS INT) AS mo,
                   CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT)
                     AS mi,
                   SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
            FROM orders GROUP BY 1, 2, 3
        )
        SELECT m.yr, m.mo,
               CAST(m.rev AS DOUBLE) AS revenue,
               CAST(p.rev AS DOUBLE) AS prev_revenue,
               ROUND(CAST(m.rev - p.rev AS DOUBLE) / CAST(p.rev AS DOUBLE), 6)
                 AS mom_growth,
               CAST(y.rev AS DOUBLE) AS yoy_revenue,
               ROUND(CAST(m.rev - y.rev AS DOUBLE) / CAST(y.rev AS DOUBLE), 6)
                 AS yoy_growth
        FROM monthly m
        LEFT JOIN monthly p ON p.mi = m.mi - 1
        LEFT JOIN monthly y ON y.mi = m.mi - 12
    """,
    tags=("extension", "timeseries", "window"),
    doc="Month-over-month and year-over-year revenue growth, calendar-anchored.",
)
def x94_mom_revenue_growth(spark: SparkSession, sf: str) -> DataFrame:
    """The finance-report staple: monthly revenue with MoM and YoY
    growth rates, CALENDAR-anchored — comparisons join on a month
    index (yr*12+mo shifted by 1 / 12), so a gap month yields NULL
    rather than silently comparing against whatever month happened to
    come 12 ROWS earlier (the lag(12)-over-rows trap a review pass
    caught: one missing month shifts every later comparison with no
    error, and an oracle sharing the flaw cannot see it). One
    fact-table pass to a months-sized series, two broadcast
    self-joins over that tiny frame; growth subtracts exact decimals
    and divides once in double."""
    monthly = (
        load(spark, sf, "orders")
        .groupBy(
            F.year("o_orderdate").cast("int").alias("yr"),
            F.month("o_orderdate").cast("int").alias("mo"),
        )
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev"))
        .withColumn("mi", (F.col("yr") * 12 + F.col("mo")).cast("long"))
        .persist()  # three self-references (the x92 CSE lesson)
    )
    p = monthly.select((F.col("mi") + 1).alias("mi"), F.col("rev").alias("prev"))
    y = monthly.select((F.col("mi") + 12).alias("mi"), F.col("rev").alias("yoy"))
    return (
        monthly.join(F.broadcast(p), "mi", "left")
        .join(F.broadcast(y), "mi", "left")
        .select(
            "yr",
            "mo",
            F.col("rev").cast("double").alias("revenue"),
            F.col("prev").cast("double").alias("prev_revenue"),
            F.round(
                (F.col("rev") - F.col("prev")).cast("double")
                / F.col("prev").cast("double"),
                6,
            ).alias("mom_growth"),
            F.col("yoy").cast("double").alias("yoy_revenue"),
            F.round(
                (F.col("rev") - F.col("yoy")).cast("double")
                / F.col("yoy").cast("double"),
                6,
            ).alias("yoy_growth"),
        )
    )


# --- r10: classic warehouse shapes (VERDICT r9 #8) --------------------
#
# Cohort LTV, inventory aging, ABC/Pareto classification — the
# remaining staples of a retail warehouse's reporting layer, on the
# fixture's orders/lineitem/part tables with the established
# conventions: money through exact DECIMAL sums, ratio divisions as
# one DOUBLE division of exact values, ties broken on the key.


@register(
    "x96_cohort_ltv",
    oracle="""
        WITH o AS (
            SELECT o_custkey,
                   CAST(year(o_orderdate) * 12 + month(o_orderdate)
                        AS BIGINT) AS mi,
                   CAST(o_totalprice AS DECIMAL(18,2)) AS price,
                   MIN(CAST(year(o_orderdate) * 12 + month(o_orderdate)
                            AS BIGINT))
                       OVER (PARTITION BY o_custkey) AS cohort_mi
            FROM orders
        ),
        cell AS (
            SELECT cohort_mi, mi - cohort_mi AS age_months,
                   CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_active,
                   SUM(price) AS rev
            FROM o GROUP BY cohort_mi, mi - cohort_mi
        ),
        cum AS (
            SELECT cohort_mi, age_months, n_active, rev,
                   SUM(rev) OVER (PARTITION BY cohort_mi
                                  ORDER BY age_months) AS cum_rev
            FROM cell
        ),
        size0 AS (
            SELECT cohort_mi, n_active AS cohort_size
            FROM cell WHERE age_months = 0
        )
        SELECT CAST((c.cohort_mi - 1) // 12 AS INT) AS cohort_yr,
               CAST((c.cohort_mi - 1) % 12 + 1 AS INT) AS cohort_mo,
               c.age_months, c.n_active,
               CAST(c.rev AS DOUBLE) AS revenue,
               CAST(c.cum_rev AS DOUBLE) AS cum_revenue,
               s.cohort_size,
               ROUND(CAST(c.cum_rev AS DOUBLE)
                     / CAST(s.cohort_size AS DOUBLE), 6)
                 AS ltv_per_customer
        FROM cum c JOIN size0 s USING (cohort_mi)
    """,
    tags=("extension", "cohort", "window"),
    doc="Cohort LTV triangle: first-order-month cohorts x months-since, cumulative revenue per customer.",
)
def x96_cohort_ltv(spark: SparkSession, sf: str) -> DataFrame:
    """The cohort-LTV triangle every subscription/retail dashboard
    draws: customers cohorted by FIRST-order month, each later month
    a (cohort, age) cell with active-customer count and revenue;
    cumulative revenue over age divided by the cohort's size = LTV
    per customer at that age. Calendar month INDEX (yr*12+mo)
    arithmetic, so gaps surface as missing ages, never misaligned
    rows (the x94 lesson).

    Scale: ONE shuffle of orders on o_custkey computes the per-
    customer first month as a window min riding the same exchange the
    (cohort, age) aggregate needs nothing from — the cell aggregate
    re-shuffles cells (cohort x age, months^2/2 rows, tiny), the
    cumulative window and the size-at-age-0 self-join run on that
    months^2-sized frame. The fact table is touched once."""
    mi = (F.year("o_orderdate") * 12 + F.month("o_orderdate")).cast("long")
    o = load(spark, sf, "orders").select(
        "o_custkey",
        mi.alias("mi"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
    )
    o = o.withColumn(
        "cohort_mi", F.min("mi").over(Window.partitionBy("o_custkey"))
    )
    cell = (
        o.groupBy("cohort_mi", (F.col("mi") - F.col("cohort_mi")).alias("age_months"))
        .agg(
            F.count_distinct("o_custkey").alias("n_active"),
            F.sum("price").alias("rev"),
        )
        .persist()  # cumulative window + the size-at-0 branch (x92 CSE lesson)
    )
    cw = (
        Window.partitionBy("cohort_mi")
        .orderBy("age_months")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = cell.withColumn("cum_rev", F.sum("rev").over(cw))
    size0 = cell.filter(F.col("age_months") == 0).select(
        "cohort_mi", F.col("n_active").alias("cohort_size")
    )
    return (
        cum.join(F.broadcast(size0), "cohort_mi")
        .select(
            ((F.col("cohort_mi") - 1) / 12).cast("int").alias("cohort_yr"),
            ((F.col("cohort_mi") - 1) % 12 + 1).cast("int").alias("cohort_mo"),
            "age_months",
            "n_active",
            F.col("rev").cast("double").alias("revenue"),
            F.col("cum_rev").cast("double").alias("cum_revenue"),
            "cohort_size",
            F.round(
                F.col("cum_rev").cast("double")
                / F.col("cohort_size").cast("double"),
                6,
            ).alias("ltv_per_customer"),
        )
    )


@register(
    "x97_inventory_aging",
    oracle="""
        WITH anchor AS (
            SELECT MAX(CAST(l_shipdate AS DATE)) AS mx FROM lineitem
        ),
        last_ship AS (
            SELECT l_partkey AS p_partkey,
                   MAX(CAST(l_shipdate AS DATE)) AS last_ship
            FROM lineitem GROUP BY l_partkey
        ),
        aged AS (
            SELECT pt.p_partkey,
                   CAST(pt.p_retailprice AS DECIMAL(18,2)) AS rp,
                   CASE
                     WHEN ls.last_ship IS NULL THEN 'never-shipped'
                     WHEN date_diff('day', ls.last_ship, anchor.mx) <= 30
                       THEN '000-030d'
                     WHEN date_diff('day', ls.last_ship, anchor.mx) <= 60
                       THEN '031-060d'
                     WHEN date_diff('day', ls.last_ship, anchor.mx) <= 90
                       THEN '061-090d'
                     ELSE '090+d'
                   END AS age_bucket
            FROM part pt
            LEFT JOIN last_ship ls USING (p_partkey)
            CROSS JOIN anchor
        )
        SELECT age_bucket,
               CAST(COUNT(*) AS BIGINT) AS n_parts,
               CAST(SUM(rp) AS DOUBLE) AS retail_value
        FROM aged GROUP BY age_bucket
    """,
    tags=("extension", "inventory", "agg"),
    doc="Inventory aging report: parts bucketed by days since last shipment, with value at risk.",
)
def x97_inventory_aging(spark: SparkSession, sf: str) -> DataFrame:
    """The slow-mover/dead-stock report: every part bucketed by days
    since its LAST shipment (anchored to the corpus' newest shipdate,
    so the query is reproducible), never-shipped parts called out,
    each bucket carrying its part count and retail value at risk.
    The aging report is the batch face of the as-of family (j09): the
    'latest event per key' join, then distance-to-anchor bucketing.

    Scale: one lineitem pass aggregated to a part-keyed max (map-side
    partial max, one shuffle), a 1-row anchor broadcast, a part-dim
    left join (dimension-sized), one bucket aggregate of the part
    dim. The fact table never joins anything row-to-row."""
    li = load(spark, sf, "lineitem")
    anchor = li.agg(F.max(F.to_date("l_shipdate")).alias("mx"))
    last_ship = li.groupBy(F.col("l_partkey").alias("p_partkey")).agg(
        F.max(F.to_date("l_shipdate")).alias("last_ship")
    )
    age = F.datediff(F.col("mx"), F.col("last_ship"))
    bucket = (
        F.when(F.col("last_ship").isNull(), "never-shipped")
        .when(age <= 30, "000-030d")
        .when(age <= 60, "031-060d")
        .when(age <= 90, "061-090d")
        .otherwise("090+d")
    )
    return (
        load(spark, sf, "part")
        .join(last_ship, "p_partkey", "left")
        .crossJoin(F.broadcast(anchor))
        .select(
            bucket.alias("age_bucket"),
            F.col("p_retailprice").cast("decimal(18,2)").alias("rp"),
        )
        .groupBy("age_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.sum("rp").cast("double").alias("retail_value"),
        )
    )


@register(
    "x98_abc_pareto",
    oracle="""
        WITH pr AS (
            SELECT l_partkey AS part,
                   SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                       * CAST(1 - l_discount AS DECIMAL(18,2))) AS rev
            FROM lineitem GROUP BY l_partkey
        ),
        ranked AS (
            SELECT part, rev,
                   SUM(rev) OVER (ORDER BY rev DESC, part) AS cum_rev,
                   SUM(rev) OVER () AS tot
            FROM pr
        )
        SELECT part,
               CAST(rev AS DOUBLE) AS revenue,
               ROUND(CAST(cum_rev AS DOUBLE) / CAST(tot AS DOUBLE), 6)
                 AS cum_share,
               CASE
                 WHEN CAST(cum_rev AS DOUBLE) / CAST(tot AS DOUBLE) <= 0.80
                   THEN 'A'
                 WHEN CAST(cum_rev AS DOUBLE) / CAST(tot AS DOUBLE) <= 0.95
                   THEN 'B'
                 ELSE 'C'
               END AS abc_class
        FROM ranked
    """,
    tags=("extension", "inventory", "window"),
    doc="ABC/Pareto classification of parts by cumulative revenue share (80/95 cuts).",
)
def x98_abc_pareto(spark: SparkSession, sf: str) -> DataFrame:
    """ABC analysis — the Pareto classification behind cycle-count
    policy and assortment reviews: parts ranked by revenue, class A
    while cumulative share <= 80%, B to 95%, C after. Cumulative and
    total are EXACT decimal window sums, the share divides their
    doubles once, and the rank order breaks revenue ties on partkey,
    so the class boundary falls identically in both engines.

    Scale: one fact pass to a part-keyed aggregate (map-side partial
    sums), then the ranked cumulative window runs over the PART
    DIMENSION (single ordered partition — dimension-sized like x93's
    ntile over customers, never fact-sized; shard it per category
    when even the dimension outgrows one partition)."""
    pr = (
        load(spark, sf, "lineitem")
        .groupBy(F.col("l_partkey").alias("part"))
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * (F.lit(1) - F.col("l_discount")).cast("decimal(18,2)")
            ).alias("rev")
        )
    )
    cw = Window.orderBy(F.desc("rev"), F.asc("part")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    tw = Window.partitionBy()
    ranked = pr.withColumn("cum_rev", F.sum("rev").over(cw)).withColumn(
        "tot", F.sum("rev").over(tw)
    )
    share = F.col("cum_rev").cast("double") / F.col("tot").cast("double")
    return ranked.select(
        "part",
        F.col("rev").cast("double").alias("revenue"),
        F.round(share, 6).alias("cum_share"),
        F.when(share <= 0.80, "A")
        .when(share <= 0.95, "B")
        .otherwise("C")
        .alias("abc_class"),
    )


@register(
    "x102_new_vs_returning",
    oracle="""
        WITH o AS (
            SELECT o_custkey,
                   CAST(year(o_orderdate) * 12 + month(o_orderdate)
                        AS BIGINT) AS mi,
                   CAST(o_totalprice AS DECIMAL(18,2)) AS price,
                   MIN(CAST(year(o_orderdate) * 12 + month(o_orderdate)
                            AS BIGINT))
                       OVER (PARTITION BY o_custkey) AS cohort_mi
            FROM orders
        )
        SELECT CAST((mi - 1) // 12 AS INT) AS yr,
               CAST((mi - 1) % 12 + 1 AS INT) AS mo,
               CASE WHEN mi = cohort_mi THEN 'new' ELSE 'returning' END
                 AS segment,
               CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(price) AS DOUBLE) AS revenue
        FROM o GROUP BY 1, 2, 3
    """,
    tags=("extension", "cohort", "agg"),
    doc="Monthly revenue split between first-month (new) and returning customers.",
)
def x102_new_vs_returning(spark: SparkSession, sf: str) -> DataFrame:
    """The acquisition-vs-retention split every growth dashboard
    leads with: per calendar month, customers/orders/revenue divided
    into 'new' (the customer's FIRST month — x96's cohort definition)
    and 'returning'. Same one-shuffle shape as x96: the per-customer
    first-month window min rides the custkey exchange; the month x
    segment aggregate is months*2 groups."""
    mi = (F.year("o_orderdate") * 12 + F.month("o_orderdate")).cast("long")
    o = load(spark, sf, "orders").select(
        "o_custkey",
        mi.alias("mi"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
    )
    o = o.withColumn(
        "cohort_mi", F.min("mi").over(Window.partitionBy("o_custkey"))
    )
    seg = F.when(F.col("mi") == F.col("cohort_mi"), "new").otherwise(
        "returning"
    )
    return (
        o.groupBy(
            ((F.col("mi") - 1) / 12).cast("int").alias("yr"),
            ((F.col("mi") - 1) % 12 + 1).cast("int").alias("mo"),
            seg.alias("segment"),
        )
        .agg(
            F.count_distinct("o_custkey").alias("n_customers"),
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("price").cast("double").alias("revenue"),
        )
    )


@register(
    "x103_interpurchase_gaps",
    oracle="""
        WITH seq AS (
            SELECT o_custkey,
                   CAST(o_orderdate AS DATE) AS d,
                   LAG(CAST(o_orderdate AS DATE)) OVER (
                       PARTITION BY o_custkey
                       ORDER BY o_orderdate, o_orderkey
                   ) AS prev_d
            FROM orders
        ),
        gaps AS (
            SELECT o_custkey,
                   CAST(date_diff('day', prev_d, d) AS BIGINT) AS gap_days
            FROM seq WHERE prev_d IS NOT NULL
        )
        SELECT CAST(gap_days // 30 AS BIGINT) AS gap_bucket_months,
               CAST(COUNT(*) AS BIGINT) AS n_gaps,
               CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers,
               CAST(MIN(gap_days) AS BIGINT) AS min_gap_days,
               CAST(MAX(gap_days) AS BIGINT) AS max_gap_days
        FROM gaps GROUP BY gap_days // 30
    """,
    tags=("extension", "cohort", "window"),
    doc="Inter-purchase gap distribution: days between consecutive orders per customer, 30-day buckets.",
)
def x103_interpurchase_gaps(spark: SparkSession, sf: str) -> DataFrame:
    """Purchase-cadence distribution — the input to churn-risk rules
    ('customer is 2x their usual gap overdue'): per customer,
    LAG(orderdate) in (date, orderkey) order gives days between
    consecutive orders; gaps bucketed into 30-day bands with exact
    counts and min/max. Integer day math end-to-end, (ts, key)
    tie-break on the lag order — the established cross-engine window
    rules. One shuffle on custkey for the lag, one tiny aggregate on
    the handful of buckets."""
    seq = (
        load(spark, sf, "orders")
        .select(
            "o_custkey",
            F.to_date("o_orderdate").alias("d"),
            F.col("o_orderkey").alias("k"),
            F.col("o_orderdate").alias("ts"),
        )
        .withColumn(
            "prev_d",
            F.lag("d").over(
                Window.partitionBy("o_custkey").orderBy(
                    F.asc("ts"), F.asc("k")
                )
            ),
        )
    )
    gaps = seq.filter(F.col("prev_d").isNotNull()).select(
        "o_custkey",
        F.datediff("d", "prev_d").cast("long").alias("gap_days"),
    )
    return gaps.groupBy(
        F.expr("gap_days DIV 30").alias("gap_bucket_months")
    ).agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.count_distinct("o_custkey").alias("n_customers"),
        F.min("gap_days").alias("min_gap_days"),
        F.max("gap_days").alias("max_gap_days"),
    )


@register(
    "x105_ship_sla_monthly",
    oracle="""
        WITH lag AS (
            SELECT CAST(year(o.o_orderdate) AS INT) AS yr,
                   CAST(month(o.o_orderdate) AS INT) AS mo,
                   CAST(date_diff('day', CAST(o.o_orderdate AS DATE),
                                  CAST(l.l_shipdate AS DATE)) AS BIGINT)
                     AS lag_days
            FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
        )
        SELECT yr, mo,
               CAST(COUNT(*) AS BIGINT) AS n_lines,
               ROUND(quantile_cont(lag_days, 0.5), 6) AS p50_days,
               ROUND(quantile_cont(lag_days, 0.9), 6) AS p90_days,
               ROUND(quantile_cont(lag_days, 0.95), 6) AS p95_days,
               CAST(MAX(lag_days) AS BIGINT) AS max_days
        FROM lag GROUP BY yr, mo
    """,
    tags=("extension", "sla", "agg"),
    doc="Monthly order-to-ship lag SLA report: exact p50/p90/p95/max days per order month.",
)
def x105_ship_sla_monthly(spark: SparkSession, sf: str) -> DataFrame:
    """The fulfillment-SLA report: per order month, exact
    p50/p90/p95/max of the order-to-ship lag in days — the operations
    dashboard's latency badge, lifted from per-task Python loops to
    one plan. Lag is integer day arithmetic; the exact interpolated
    percentile matches DuckDB's quantile_cont bit-for-bit (the a15
    pattern — integer inputs, one linear interpolation in double).

    Scale: ONE shuffle joins lineitem to orders on orderkey; the
    month aggregate is months-sized. Exact percentiles hold the
    per-group values — at 100 TB swap approx_percentile with a
    documented error bound (the a15 note) or pre-bucket lag_days
    (bounded domain) and take percentiles over the histogram."""
    li = load(spark, sf, "lineitem").select("l_orderkey", "l_shipdate")
    o = load(spark, sf, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    lag = li.join(o, li.l_orderkey == o.o_orderkey).select(
        F.year("o_orderdate").cast("int").alias("yr"),
        F.month("o_orderdate").cast("int").alias("mo"),
        F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate"))
        .cast("long")
        .alias("lag_days"),
    )
    return lag.groupBy("yr", "mo").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.round(F.expr("percentile(lag_days, 0.5)"), 6).alias("p50_days"),
        F.round(F.expr("percentile(lag_days, 0.9)"), 6).alias("p90_days"),
        F.round(F.expr("percentile(lag_days, 0.95)"), 6).alias("p95_days"),
        F.max("lag_days").alias("max_days"),
    )


@register(
    "x118_peak_active_orders",
    oracle="""
        WITH span AS (
            SELECT o.o_orderkey,
                   CAST(o.o_orderdate AS DATE) AS d0,
                   MAX(CAST(l.l_shipdate AS DATE)) AS d1,
                   c.c_nationkey
            FROM orders o
            JOIN lineitem l ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON c.c_custkey = o.o_custkey
            GROUP BY o.o_orderkey, CAST(o.o_orderdate AS DATE), c.c_nationkey
        ),
        ev AS (
            SELECT n.n_name AS nation, d0 AS d, CAST(1 AS BIGINT) AS delta
            FROM span s JOIN nation n ON n.n_nationkey = s.c_nationkey
            UNION ALL
            SELECT n.n_name, d1 + INTERVAL 1 DAY, CAST(-1 AS BIGINT)
            FROM span s JOIN nation n ON n.n_nationkey = s.c_nationkey
        ),
        daily AS (
            SELECT nation, CAST(d AS DATE) AS d, SUM(delta) AS delta
            FROM ev GROUP BY nation, CAST(d AS DATE)
        ),
        run AS (
            SELECT nation, d,
                   SUM(delta) OVER (PARTITION BY nation ORDER BY d) AS active
            FROM daily
        )
        SELECT nation,
               CAST(MAX(active) AS BIGINT) AS peak_active,
               MIN(CASE WHEN active = ma THEN d END) AS peak_date
        FROM (SELECT *, MAX(active) OVER (PARTITION BY nation) AS ma FROM run)
        GROUP BY nation
    """,
    tags=("extension", "interval", "window", "scale"),
    doc="Peak concurrent open orders per nation via the sweep-line +1/-1 running sum.",
)
def x118_peak_active_orders(spark: SparkSession, sf: str) -> DataFrame:
    """PEAK CONCURRENCY of open orders per nation — an order is
    'active' from its order date through its latest line shipment,
    and the question is the warehouse-capacity classic: how many were
    ever open AT ONCE, and when did the peak hit? The naive form
    joins every order against every overlapping order (quadratic in
    the overlap density); the SWEEP-LINE formulation is linear: each
    interval becomes +1 at start and -1 at end+1 (inclusive ends),
    deltas pre-aggregate per (nation, date), and a running sum over
    the date axis IS the active count — the interval-algebra sibling
    of x111's prefix-sum trick. Peak date ties break to the earliest
    date in both engines (MIN over the argmax set). Integers and
    dates only — nothing to round.

    Scale: the fact join reduces to one span row per order (map-side
    max on shipdate); dims broadcast; the sweep's running sum
    partitions BY NATION over date-grained aggregates (dates x
    nations rows, not orders), so the window state is calendar-
    sized. One fact-keyed Exchange total."""
    o = load(spark, sf, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    li = load(spark, sf, "lineitem").select("l_orderkey", "l_shipdate")
    c = load(spark, sf, "customer").select("c_custkey", "c_nationkey")
    n = load(spark, sf, "nation").select(
        "n_nationkey", F.col("n_name").alias("nation")
    )
    span = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(
            "o_orderkey",
            F.to_date("o_orderdate").alias("d0"),
            "c_nationkey",
        )
        .agg(F.max(F.to_date("l_shipdate")).alias("d1"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
    )
    ev = span.select(
        "nation", F.col("d0").alias("d"), F.lit(1).cast("bigint").alias("delta")
    ).unionAll(
        span.select(
            "nation",
            F.date_add("d1", 1).alias("d"),
            F.lit(-1).cast("bigint").alias("delta"),
        )
    )
    daily = ev.groupBy("nation", "d").agg(F.sum("delta").alias("delta"))
    w_run = (
        Window.partitionBy("nation")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    run = daily.withColumn("active", F.sum("delta").over(w_run)).withColumn(
        "ma", F.max("active").over(Window.partitionBy("nation"))
    )
    return run.groupBy("nation").agg(
        F.max("active").cast("bigint").alias("peak_active"),
        F.min(F.when(F.col("active") == F.col("ma"), F.col("d"))).alias(
            "peak_date"
        ),
    )


# --- r11 warehouse analytics (VERDICT r10 #8): order-to-cash cycle, ------
# --- supplier scorecard, OTIF fill rate — integer-exact end-to-end -------


@register(
    "x122_order_to_cash_cycle",
    oracle="""
        WITH cyc AS (
            SELECT o.o_orderkey,
                   CAST(year(o.o_orderdate) AS INT) AS yr,
                   CAST(month(o.o_orderdate) AS INT) AS mo,
                   CAST(date_diff('day', CAST(o.o_orderdate AS DATE),
                                  MAX(CAST(l.l_shipdate AS DATE)))
                        AS BIGINT) AS cycle_days,
                   CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT)
                     AS cents
            FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
            GROUP BY o.o_orderkey, yr, mo,
                     CAST(o.o_orderdate AS DATE), o.o_totalprice
        )
        SELECT yr, mo,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(cents) AS BIGINT) AS total_cents,
               CAST(100 * SUM(cycle_days) // COUNT(*) AS BIGINT)
                 AS avg_cycle_days_x100,
               CAST(100 * SUM(cycle_days * cents) // SUM(cents) AS BIGINT)
                 AS cash_cycle_days_x100,
               CAST(MAX(cycle_days) AS BIGINT) AS max_cycle_days
        FROM cyc GROUP BY yr, mo
    """,
    tags=("extension", "warehouse", "interval", "agg"),
    doc="Order-to-cash cycle time per order month: plain and cash-weighted average days from order to final shipment.",
)
def x122_order_to_cash_cycle(spark: SparkSession, sf: str) -> DataFrame:
    """ORDER-TO-CASH CYCLE TIME — per order month, how many days from
    order placement to the LAST line shipping (the order is not cash
    until it ships complete), both as a plain average and weighted by
    order value: the cash-weighted form answers the CFO question
    'where is the money stuck', which a line-grain lag report (x105)
    cannot — one late cheap line and one late expensive line look
    identical there. Everything is integer-exact (the x111/x121
    fixed-point rule): cycle days are date arithmetic, money is
    cents, both averages are emitted x100 through one integer
    division. The fixture ships some lines BEFORE the order date, so
    the day sums can be negative — Spark DIV and DuckDB BIGINT //
    both truncate toward zero (the e09 MEASURED rule, pinned by its
    refund-stream test), so the engines agree for any sign and no
    ROUND(double) edge exists to disagree on.
    Σ(cycle·cents) stays ~1e13 at sf0.1; at 100 TB widen the summand
    to DECIMAL(38,0) (the x121 note).

    Scale: ONE fact-keyed shuffle collapses lineitem to a span per
    order (map-side MAX partials); the month rollup is months-sized.
    The o⋈li join is HINTED to sort-merge: both sides are facts, and
    the SMJ's orderkey Exchange is REUSED by the per-order groupBy —
    whereas letting the 64 MB auto-broadcast threshold grab a
    mid-size orders side costs a million-row hash build AND a second
    full fact shuffle for the aggregate (measured at a 10x-replica
    sf0.1 corpus: 9.2 s broadcast vs 3.0 s SMJ; sf0.001/sf0.1
    unchanged-or-better). The same hazard is why the quiet 20x point
    initially beat 10x: the bigger corpus crossed the threshold into
    the better plan by accident. Pin the good plan; don't rely on
    the flip."""
    o = load(spark, sf, "orders").select(
        "o_orderkey", "o_orderdate", "o_totalprice"
    )
    li = load(spark, sf, "lineitem").select("l_orderkey", "l_shipdate")
    cyc = (
        o.hint("merge")
        .join(li, o.o_orderkey == li.l_orderkey)
        .groupBy(
            "o_orderkey",
            F.year("o_orderdate").cast("int").alias("yr"),
            F.month("o_orderdate").cast("int").alias("mo"),
            F.to_date("o_orderdate").alias("d0"),
            F.expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").alias(
                "cents"
            ),
        )
        .agg(F.max(F.to_date("l_shipdate")).alias("d1"))
        .select(
            "yr",
            "mo",
            "cents",
            F.datediff("d1", "d0").cast("bigint").alias("cycle_days"),
        )
    )
    return cyc.groupBy("yr", "mo").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("cents").alias("total_cents"),
        F.expr("100 * SUM(cycle_days) DIV COUNT(*)").alias(
            "avg_cycle_days_x100"
        ),
        F.expr("100 * SUM(cycle_days * cents) DIV SUM(cents)").alias(
            "cash_cycle_days_x100"
        ),
        F.max("cycle_days").alias("max_cycle_days"),
    )


X123_SLA_DAYS = 75  # scorecard on-time threshold: ship within 75 days


@register(
    "x123_supplier_scorecard",
    oracle=f"""
        WITH sline AS (
            SELECT l.l_suppkey,
                   CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100
                              + 0.5) AS BIGINT) AS rev_cents,
                   CASE WHEN date_diff('day', CAST(o.o_orderdate AS DATE),
                                       CAST(l.l_shipdate AS DATE))
                             <= {X123_SLA_DAYS}
                        THEN 1 ELSE 0 END AS on_time,
                   o.o_custkey
            FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
        ),
        agg AS (
            SELECT l_suppkey,
                   CAST(COUNT(*) AS BIGINT) AS n_lines,
                   CAST(SUM(rev_cents) AS BIGINT) AS revenue_cents,
                   CAST(1000000 * SUM(on_time) // COUNT(*) AS BIGINT)
                     AS on_time_ppm,
                   CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers
            FROM sline GROUP BY l_suppkey
        )
        SELECT n.n_name AS nation, s.s_name, a.n_lines, a.revenue_cents,
               a.on_time_ppm, a.n_customers,
               CAST(row_number() OVER (
                    PARTITION BY n.n_name
                    ORDER BY a.revenue_cents DESC, s.s_suppkey)
                    AS BIGINT) AS nation_rank
        FROM agg a
        JOIN supplier s ON s.s_suppkey = a.l_suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
    """,
    tags=("extension", "warehouse", "window", "agg"),
    doc="Supplier scorecard: revenue, on-time ship rate, customer reach, revenue rank within nation.",
)
def x123_supplier_scorecard(spark: SparkSession, sf: str) -> DataFrame:
    """SUPPLIER SCORECARD — the procurement league table joining
    x97's aging discipline to x105's SLA lens, one row per supplier:
    line volume, exact revenue cents, on-time-ship rate (shipped
    within {X123_SLA_DAYS} days of the order date — the fixture's
    commitdate stand-in, see the module docstring), distinct
    customers reached, and the supplier's revenue rank WITHIN its
    nation (row_number, ties to the lower suppkey, so both engines
    enumerate one permutation). Rates ride the integer-ppm idiom
    (x121): non-negative operands, Spark DIV == DuckDB //.

    Scale: one fact-keyed shuffle to the per-supplier aggregate
    (COUNT DISTINCT custkey expands to the standard two-phase
    partial); supplier/nation dims broadcast AFTER the aggregate so
    the join input is suppliers-sized; the rank window partitions by
    nation over suppliers — dim-sized state. No fact re-scan. The
    o⋈li join is hinted to sort-merge (the x122 rationale: both
    sides are facts — measured 8.9 s broadcast vs 4.1 s SMJ at the
    10x-replica corpus, and SMJ wins at sf0.1 too; shuffle-hash was
    marginally faster still but SMJ is the spill-safe choice for a
    build side that cannot be assumed to fit)."""
    li = load(spark, sf, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount",
        "l_shipdate",
    )
    o = load(spark, sf, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    s = load(spark, sf, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey"
    )
    n = load(spark, sf, "nation").select(
        "n_nationkey", F.col("n_name").alias("nation")
    )
    sline = li.join(o.hint("merge"), li.l_orderkey == o.o_orderkey).select(
        "l_suppkey",
        "o_custkey",
        F.expr(
            "CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)"
            " AS BIGINT)"
        ).alias("rev_cents"),
        F.when(
            F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate"))
            <= X123_SLA_DAYS,
            1,
        )
        .otherwise(0)
        .alias("on_time"),
    )
    agg = sline.groupBy("l_suppkey").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum("rev_cents").alias("revenue_cents"),
        F.expr(
            "CAST(CAST(1000000 AS DECIMAL(38,0)) * SUM(on_time)"
            " DIV COUNT(*) AS BIGINT)"
        ).alias("on_time_ppm"),
        F.countDistinct("o_custkey").alias("n_customers"),
    )
    ranked = (
        agg.join(F.broadcast(s), agg.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .withColumn(
            "nation_rank",
            F.row_number()
            .over(
                Window.partitionBy("nation").orderBy(
                    F.col("revenue_cents").desc(), "s_suppkey"
                )
            )
            .cast("bigint"),
        )
    )
    return ranked.select(
        "nation", "s_name", "n_lines", "revenue_cents", "on_time_ppm",
        "n_customers", "nation_rank",
    )


X124_SLA_DAYS = 90  # OTIF: every line of the order ships within 90 days


@register(
    "x124_otif_fill_rate",
    oracle=f"""
        WITH per_order AS (
            SELECT o.o_orderkey,
                   CAST(year(o.o_orderdate) AS INT) AS yr,
                   CAST(month(o.o_orderdate) AS INT) AS mo,
                   bool_and(date_diff('day', CAST(o.o_orderdate AS DATE),
                                      CAST(l.l_shipdate AS DATE))
                            <= {X124_SLA_DAYS}) AS otif
            FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
            GROUP BY o.o_orderkey, yr, mo
        )
        SELECT yr, mo,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CASE WHEN otif THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_otif,
               CAST(1000000 * SUM(CASE WHEN otif THEN 1 ELSE 0 END)
                    // COUNT(*) AS BIGINT) AS otif_ppm
        FROM per_order GROUP BY yr, mo
    """,
    tags=("extension", "warehouse", "agg"),
    doc="OTIF fill rate per order month: share of orders whose EVERY line shipped within the SLA.",
)
def x124_otif_fill_rate(spark: SparkSession, sf: str) -> DataFrame:
    """OTIF (on-time-in-full) FILL RATE — the supply-chain KPI that
    punishes partial lateness: an order counts ONLY if every line
    shipped within {X124_SLA_DAYS} days of the order date, so one
    straggler line fails the whole order (contrast x123's per-line
    on-time rate, which a big order can carry). The ALL-lines gate is
    A7's bool_and dependency-gate aggregate re-aimed at fulfillment;
    the monthly rate is the x121 integer-ppm idiom — integers
    end-to-end, nothing to round.

    Scale: ONE fact-keyed shuffle to the per-order bool_and
    (map-side partial AND); the month rollup is months-sized. The
    same two-level shape as x122 — a shared span/gate CTE on a real
    deployment serves x118/x122/x124 from one pass. The o⋈li join is
    hinted to sort-merge so the join Exchange is reused by the
    per-order aggregate (the x122 measurement)."""
    o = load(spark, sf, "orders").select("o_orderkey", "o_orderdate")
    li = load(spark, sf, "lineitem").select("l_orderkey", "l_shipdate")
    per_order = (
        o.hint("merge")
        .join(li, o.o_orderkey == li.l_orderkey)
        .groupBy(
            "o_orderkey",
            F.year("o_orderdate").cast("int").alias("yr"),
            F.month("o_orderdate").cast("int").alias("mo"),
        )
        .agg(
            F.bool_and(
                F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate"))
                <= X124_SLA_DAYS
            ).alias("otif")
        )
    )
    return per_order.groupBy("yr", "mo").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.when(F.col("otif"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_otif"),
        F.expr(
            "CAST(CAST(1000000 AS DECIMAL(38,0))"
            " * SUM(CASE WHEN otif THEN 1 ELSE 0 END)"
            " DIV COUNT(*) AS BIGINT)"
        ).alias("otif_ppm"),
    )


@register(
    "x125_priority_mix_shift",
    oracle="""
        WITH m AS (
            SELECT CAST(year(o_orderdate) AS INT) AS yr,
                   CAST(month(o_orderdate) AS INT) AS mo,
                   o_orderpriority,
                   CAST(COUNT(*) AS BIGINT) AS n_orders
            FROM orders GROUP BY 1, 2, 3
        ),
        shares AS (
            SELECT yr, mo, o_orderpriority, n_orders,
                   CAST(1000000 * n_orders
                        // SUM(n_orders) OVER (PARTITION BY yr, mo)
                        AS BIGINT) AS share_ppm
            FROM m
        )
        SELECT yr, mo, o_orderpriority, n_orders, share_ppm,
               share_ppm - LAG(share_ppm) OVER (
                   PARTITION BY o_orderpriority ORDER BY yr, mo)
                 AS delta_ppm
        FROM shares
    """,
    tags=("extension", "warehouse", "window"),
    doc="Month-over-month order-priority mix: share of each priority per month and its ppm shift vs the prior month.",
)
def x125_priority_mix_shift(spark: SparkSession, sf: str) -> DataFrame:
    """ORDER-PRIORITY MIX SHIFT — per month, each priority's share of
    order volume (ppm) and its month-over-month delta: the
    composition-drift monitor ('are URGENT orders crowding out the
    rest?') that catches a mix change a plain volume chart hides. Two
    window passes over the MONTHS x PRIORITIES aggregate (a share
    window per month, a LAG per priority across months) — windows on
    aggregates, never on facts; share_ppm is the x121 integer idiom
    and the delta is plain integer subtraction (may be negative —
    no division touches it, so no DIV/floor divergence surface
    exists; NULL for each priority's first month in both engines).

    Scale: the fact reduces to a months x priorities cell table in
    one map-side-combined aggregate; both windows and the LAG run
    over that calendar-sized table. One fact Exchange total."""
    m = (
        load(spark, sf, "orders")
        .groupBy(
            F.year("o_orderdate").cast("int").alias("yr"),
            F.month("o_orderdate").cast("int").alias("mo"),
            "o_orderpriority",
        )
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    shares = m.withColumn(
        "share_ppm",
        F.expr(
            "CAST(CAST(1000000 AS DECIMAL(38,0)) * n_orders"
            " DIV SUM(n_orders)"
            " OVER (PARTITION BY yr, mo) AS BIGINT)"
        ),
    )
    return shares.withColumn(
        "delta_ppm",
        F.col("share_ppm")
        - F.lag("share_ppm").over(
            Window.partitionBy("o_orderpriority").orderBy("yr", "mo")
        ),
    )


@register(
    "x126_sla_histogram_percentiles",
    oracle="""
        WITH lag AS (
            SELECT CAST(year(o.o_orderdate) AS INT) AS yr,
                   CAST(month(o.o_orderdate) AS INT) AS mo,
                   CAST(date_diff('day', CAST(o.o_orderdate AS DATE),
                                  CAST(l.l_shipdate AS DATE)) AS BIGINT)
                     AS lag_days
            FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
        ),
        hist AS (
            SELECT yr, mo, lag_days,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM lag GROUP BY yr, mo, lag_days
        ),
        cum AS (
            SELECT yr, mo, lag_days, n,
                   SUM(n) OVER (PARTITION BY yr, mo ORDER BY lag_days) AS cw,
                   SUM(n) OVER (PARTITION BY yr, mo) AS total
            FROM hist
        )
        SELECT yr, mo,
               CAST(MAX(total) AS BIGINT) AS n_lines,
               CAST(MIN(CASE WHEN 100 * cw >= 50 * total
                             THEN lag_days END) AS BIGINT) AS p50_days,
               CAST(MIN(CASE WHEN 100 * cw >= 90 * total
                             THEN lag_days END) AS BIGINT) AS p90_days,
               CAST(MIN(CASE WHEN 100 * cw >= 95 * total
                             THEN lag_days END) AS BIGINT) AS p95_days,
               CAST(MAX(lag_days) AS BIGINT) AS max_days
        FROM cum GROUP BY yr, mo
    """,
    tags=("extension", "sla", "window", "scale"),
    doc="Exact inverted-CDF SLA percentiles per month from the bounded-domain lag-day histogram — the 100 TB percentile path.",
)
def x126_sla_histogram_percentiles(spark: SparkSession, sf: str) -> DataFrame:
    """x105's SCALE PATH made real — exact p50/p90/p95 ship-lag days
    per order month computed from the (month, lag_day) HISTOGRAM
    instead of buffering per-group value lists: lag days are a
    BOUNDED integer domain (a few hundred distinct values no matter
    how many trillion lines), so the histogram is calendar x domain
    sized, the cumulative window runs over THAT, and the percentile
    is 'smallest day whose cumulative count reaches p% of the total'
    (the inverted-CDF / type-1 definition, x120's integer predicate
    100*cw >= p*total — NO interpolation, NO float, NOTHING to
    round). Where x105's exact interpolated percentile must hold
    each group's values (its docstring defers to approx_percentile
    at 100 TB), this form never degrades: same one fact-keyed
    aggregate, then windows over histogram rows. Inverted-CDF
    returns the actual smallest OBSERVED day at or past the cut — it
    can land on either side of x105's interpolated value (the two
    definitions index the same mass differently); equality with the
    naive type-1 definition on raw lag days is asserted in
    tests/test_r11_warehouse.py.

    Scale: ONE fact Exchange to (yr, mo, lag_day) cells with
    map-side combine; both windows and the final min-where aggregate
    are histogram-sized. The same pattern serves any bounded-domain
    metric (latency buckets, retry counts, quantized scores)."""
    li = load(spark, sf, "lineitem").select("l_orderkey", "l_shipdate")
    o = load(spark, sf, "orders").select("o_orderkey", "o_orderdate")
    hist = (
        li.join(o.hint("merge"), li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.year("o_orderdate").cast("int").alias("yr"),
            F.month("o_orderdate").cast("int").alias("mo"),
            F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate"))
            .cast("bigint")
            .alias("lag_days"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w_cum = (
        Window.partitionBy("yr", "mo")
        .orderBy("lag_days")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = hist.withColumn("cw", F.sum("n").over(w_cum)).withColumn(
        "total", F.sum("n").over(Window.partitionBy("yr", "mo"))
    )

    def pick(pct: int):
        return F.min(
            F.when(100 * F.col("cw") >= pct * F.col("total"), F.col("lag_days"))
        ).cast("bigint")

    return cum.groupBy("yr", "mo").agg(
        F.max("total").cast("bigint").alias("n_lines"),
        pick(50).alias("p50_days"),
        pick(90).alias("p90_days"),
        pick(95).alias("p95_days"),
        F.max("lag_days").cast("bigint").alias("max_days"),
    )


X127_BUCKETS = ((90, "active"), (180, "cooling"))  # else "churned"


@register(
    "x127_customer_churn_buckets",
    # f-string so the bucket thresholds/labels interpolate from
    # X127_BUCKETS — editing the constant cannot desync the oracle
    # from the Spark side (the x123/x124 SLA-constant pattern;
    # ADVICE r11)
    oracle=f"""
        WITH anchor AS (
            SELECT MAX(CAST(o_orderdate AS DATE)) AS maxd FROM orders
        ),
        cust AS (
            SELECT o_custkey,
                   MAX(CAST(o_orderdate AS DATE)) AS last_order,
                   CAST(COUNT(*) AS BIGINT) AS n_orders,
                   SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                     AS lifetime_cents
            FROM orders GROUP BY o_custkey
        ),
        bucketed AS (
            SELECT c.c_mktsegment,
                   CASE WHEN date_diff('day', u.last_order, a.maxd)
                             <= {X127_BUCKETS[0][0]}
                        THEN '{X127_BUCKETS[0][1]}'
                        WHEN date_diff('day', u.last_order, a.maxd)
                             <= {X127_BUCKETS[1][0]}
                        THEN '{X127_BUCKETS[1][1]}'
                        ELSE 'churned' END AS bucket,
                   u.n_orders, u.lifetime_cents
            FROM cust u
            JOIN customer c ON c.c_custkey = u.o_custkey
            CROSS JOIN anchor a
        )
        SELECT c_mktsegment, bucket,
               CAST(COUNT(*) AS BIGINT) AS n_customers,
               CAST(SUM(n_orders) AS BIGINT) AS n_orders,
               CAST(SUM(lifetime_cents) AS BIGINT) AS lifetime_cents
        FROM bucketed GROUP BY c_mktsegment, bucket
    """,
    tags=("extension", "warehouse", "agg"),
    doc="Customer dormancy buckets per market segment: active/cooling/churned by days since last order, with lifetime value at risk.",
)
def x127_customer_churn_buckets(spark: SparkSession, sf: str) -> DataFrame:
    """CUSTOMER CHURN/DORMANCY report — every customer bucketed by
    days since their LAST order relative to the corpus anchor (the
    x97 slow-mover pattern aimed at customers instead of parts):
    active (<=90 d), cooling (<=180 d), churned (beyond), per market
    segment with order count and lifetime revenue — the 'value at
    risk' table a retention team budgets against, complementing
    x96's cohort LTV (acquisition view) and x102's new-vs-returning
    (flow view) with the stock view. Integer-exact throughout: day
    arithmetic, cents, counts — nothing to round.

    Scale: ONE fact-keyed shuffle to the per-customer rollup
    (map-side MAX/SUM partials); the anchor is a 1-row broadcast
    crossJoin (the x111 totals pattern); the customer dim broadcasts;
    the final aggregate is segments x 3 rows."""
    o = load(spark, sf, "orders").select(
        "o_custkey", "o_orderdate", "o_totalprice"
    )
    c = load(spark, sf, "customer").select("c_custkey", "c_mktsegment")
    anchor = o.agg(F.max(F.to_date("o_orderdate")).alias("maxd"))
    cust = o.groupBy("o_custkey").agg(
        F.max(F.to_date("o_orderdate")).alias("last_order"),
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(
            F.expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)")
        ).alias("lifetime_cents"),
    )
    age = F.datediff(F.col("maxd"), F.col("last_order"))
    bucket = F.when(age <= X127_BUCKETS[0][0], X127_BUCKETS[0][1]).when(
        age <= X127_BUCKETS[1][0], X127_BUCKETS[1][1]
    ).otherwise("churned")
    return (
        cust.crossJoin(F.broadcast(anchor))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_mktsegment", bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("n_orders").cast("bigint").alias("n_orders"),
            F.sum("lifetime_cents").alias("lifetime_cents"),
        )
    )


# --- r12 warehouse analytics (VERDICT r11 #8): churn transitions, -------
# --- supplier OTIF trend — integer-exact, no bare integer SUM in --------
# --- any oracle output (the r12 type-parity rule) -----------------------


X129_LOOKBACK_DAYS = 180  # transition window: compare vs 180 days earlier


@register(
    "x129_churn_transition_matrix",
    # f-string: thresholds/labels interpolate from X127_BUCKETS and
    # X129_LOOKBACK_DAYS so the oracle can never desync (ADVICE r11)
    oracle=f"""
        WITH anchor AS (
            SELECT MAX(CAST(o_orderdate AS DATE)) AS maxd,
                   MAX(CAST(o_orderdate AS DATE))
                     - {X129_LOOKBACK_DAYS} AS prevd
            FROM orders
        ),
        cust AS (
            SELECT o.o_custkey,
                   MAX(CAST(o.o_orderdate AS DATE)) AS last_all,
                   MAX(CASE WHEN CAST(o.o_orderdate AS DATE) <= a.prevd
                            THEN CAST(o.o_orderdate AS DATE) END)
                     AS last_prev,
                   CAST(COUNT(*) AS BIGINT) AS n_orders,
                   SUM(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT))
                     AS cents
            FROM orders o CROSS JOIN anchor a
            GROUP BY o.o_custkey
        ),
        bucketed AS (
            SELECT CASE WHEN u.last_prev IS NULL THEN 'new'
                        WHEN date_diff('day', u.last_prev, a.prevd)
                             <= {X127_BUCKETS[0][0]}
                        THEN '{X127_BUCKETS[0][1]}'
                        WHEN date_diff('day', u.last_prev, a.prevd)
                             <= {X127_BUCKETS[1][0]}
                        THEN '{X127_BUCKETS[1][1]}'
                        ELSE 'churned' END AS bucket_prev,
                   CASE WHEN date_diff('day', u.last_all, a.maxd)
                             <= {X127_BUCKETS[0][0]}
                        THEN '{X127_BUCKETS[0][1]}'
                        WHEN date_diff('day', u.last_all, a.maxd)
                             <= {X127_BUCKETS[1][0]}
                        THEN '{X127_BUCKETS[1][1]}'
                        ELSE 'churned' END AS bucket_now,
                   u.n_orders, u.cents
            FROM cust u CROSS JOIN anchor a
        )
        SELECT bucket_prev, bucket_now,
               CAST(COUNT(*) AS BIGINT) AS n_customers,
               CAST(SUM(n_orders) AS BIGINT) AS n_orders,
               CAST(SUM(cents) AS BIGINT) AS lifetime_cents
        FROM bucketed GROUP BY bucket_prev, bucket_now
    """,
    tags=("extension", "warehouse", "agg"),
    doc="Churn-bucket transition matrix: customers cross-tabbed by dormancy bucket 180 days ago vs now, with value at stake.",
)
def x129_churn_transition_matrix(spark: SparkSession, sf: str) -> DataFrame:
    """CHURN TRANSITION MATRIX — x127's dormancy buckets made a FLOW:
    every customer is bucketed TWICE, once against an anchor
    {X129_LOOKBACK_DAYS} days before the corpus max date (customers
    with no orders by then are 'new') and once against the max date
    itself, and the matrix counts each (was, is) cell with the order
    volume and lifetime cents sitting in it. This is the retention
    team's actual steering table — x127 says how many customers are
    cooling, THIS says whether they arrived from active (a leak) or
    were always dormant (old news), i.e. the x96 cohort view crossed
    with the x127 stock view. Integer-exact end-to-end: day
    arithmetic, cents, counts; every oracle output aggregate is CAST
    to BIGINT (the r12 type-parity rule — DuckDB would otherwise
    type the sums HUGEINT).

    Scale: ONE fact-keyed shuffle builds the per-customer rollup —
    the two bucket dates ride the SAME aggregate as a plain MAX and a
    conditional MAX (no second scan, no self-join); the anchors are a
    1-row broadcast crossJoin (the x111/x127 pattern) attached before
    the aggregate so the conditional sees prevd; the matrix aggregate
    is at most 4x3 rows. The bucket CASEs evaluate on the
    customers-sized rollup, never on facts."""
    o = load(spark, sf, "orders").select(
        "o_custkey", "o_orderdate", "o_totalprice"
    )
    anchor = o.agg(
        F.max(F.to_date("o_orderdate")).alias("maxd"),
        F.date_sub(
            F.max(F.to_date("o_orderdate")), X129_LOOKBACK_DAYS
        ).alias("prevd"),
    )
    cust = (
        o.crossJoin(F.broadcast(anchor))
        .groupBy("o_custkey")
        .agg(
            F.max(F.to_date("o_orderdate")).alias("last_all"),
            F.max(
                F.when(
                    F.to_date("o_orderdate") <= F.col("prevd"),
                    F.to_date("o_orderdate"),
                )
            ).alias("last_prev"),
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(
                F.expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)")
            ).alias("cents"),
            F.first("maxd").alias("maxd"),
            F.first("prevd").alias("prevd"),
        )
    )

    def _bucket(age):
        return (
            F.when(age <= X127_BUCKETS[0][0], X127_BUCKETS[0][1])
            .when(age <= X127_BUCKETS[1][0], X127_BUCKETS[1][1])
            .otherwise("churned")
        )

    bucket_prev = F.when(F.col("last_prev").isNull(), "new").otherwise(
        _bucket(F.datediff(F.col("prevd"), F.col("last_prev")))
    )
    bucket_now = _bucket(F.datediff(F.col("maxd"), F.col("last_all")))
    return cust.groupBy(
        bucket_prev.alias("bucket_prev"), bucket_now.alias("bucket_now")
    ).agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum("n_orders").cast("bigint").alias("n_orders"),
        F.sum("cents").cast("bigint").alias("lifetime_cents"),
    )


@register(
    "x130_supplier_otif_trend",
    oracle=f"""
        WITH per AS (
            SELECT l.l_suppkey, o.o_orderkey,
                   CAST(year(o.o_orderdate) AS INT) AS yr,
                   CAST(month(o.o_orderdate) AS INT) AS mo,
                   bool_and(date_diff('day', CAST(o.o_orderdate AS DATE),
                                      CAST(l.l_shipdate AS DATE))
                            <= {X124_SLA_DAYS}) AS otif
            FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
            GROUP BY l.l_suppkey, o.o_orderkey, yr, mo
        ),
        monthly AS (
            SELECT l_suppkey, yr, mo,
                   CAST(COUNT(*) AS BIGINT) AS n_orders,
                   CAST(SUM(CASE WHEN otif THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_otif,
                   CAST(1000000 * SUM(CASE WHEN otif THEN 1 ELSE 0 END)
                        // COUNT(*) AS BIGINT) AS otif_ppm
            FROM per GROUP BY l_suppkey, yr, mo
        )
        SELECT s.s_name, m.yr, m.mo, m.n_orders, m.n_otif, m.otif_ppm,
               m.otif_ppm - LAG(m.otif_ppm) OVER (
                   PARTITION BY m.l_suppkey ORDER BY m.yr, m.mo)
                 AS delta_ppm
        FROM monthly m JOIN supplier s ON s.s_suppkey = m.l_suppkey
    """,
    tags=("extension", "warehouse", "window", "agg"),
    doc="Per-supplier monthly OTIF rate with its month-over-month ppm shift.",
)
def x130_supplier_otif_trend(spark: SparkSession, sf: str) -> DataFrame:
    """SUPPLIER OTIF TREND — x124's all-lines-on-time gate applied at
    the (supplier, order) grain (did THIS supplier ship every one of
    its lines for that order within {X124_SLA_DAYS} days), rolled to
    supplier-months, with the month-over-month ppm delta (x125's LAG
    idiom, partitioned by supplier): the scorecard x123 ranks
    suppliers at a point in time, THIS answers 'is supplier X
    getting better or worse' — the procurement review chart. Rates
    are the x121 integer-ppm idiom; the delta is plain integer
    subtraction (may be negative, no division touches it; NULL for
    each supplier's first month in both engines). Every oracle
    output aggregate is CAST to BIGINT (the r12 type-parity rule).

    Scale: the l⋈o join is fact-fact — HINTED to sort-merge on
    orderkey (the x122/x124 measurement: auto-broadcast grabbed a
    mid-scale fact side) — and its Exchange feeds the
    (suppkey, orderkey) bool_and directly; the monthly rollup and
    the LAG window run over supplier-months (suppliers x months
    rows, never facts); the supplier dim broadcasts AFTER the
    aggregate for the display name."""
    li = load(spark, sf, "lineitem").select(
        "l_suppkey", "l_orderkey", "l_shipdate"
    )
    o = load(spark, sf, "orders").select("o_orderkey", "o_orderdate")
    s = load(spark, sf, "supplier").select("s_suppkey", "s_name")
    per = (
        o.hint("merge")
        .join(li, o.o_orderkey == li.l_orderkey)
        .groupBy(
            "l_suppkey",
            "o_orderkey",
            F.year("o_orderdate").cast("int").alias("yr"),
            F.month("o_orderdate").cast("int").alias("mo"),
        )
        .agg(
            F.bool_and(
                F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate"))
                <= X124_SLA_DAYS
            ).alias("otif")
        )
    )
    # repartition on the supplier key BEFORE the monthly rollup: hash
    # partitioning on l_suppkey satisfies both the (suppkey, yr, mo)
    # group-by's clustering AND the LAG window's partition-by, so the
    # rollup and the window share ONE Exchange instead of shuffling
    # twice (measured: 4 -> 3 exchanges at sf0.01)
    monthly = (
        per.repartition("l_suppkey")
        .groupBy("l_suppkey", "yr", "mo")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.when(F.col("otif"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_otif"),
            F.expr(
                "CAST(CAST(1000000 AS DECIMAL(38,0))"
                " * SUM(CASE WHEN otif THEN 1 ELSE 0 END)"
                " DIV COUNT(*) AS BIGINT)"
            ).alias("otif_ppm"),
        )
    )
    w = Window.partitionBy("l_suppkey").orderBy("yr", "mo")
    return (
        monthly.withColumn(
            "delta_ppm", F.col("otif_ppm") - F.lag("otif_ppm").over(w)
        )
        .join(F.broadcast(s), monthly.l_suppkey == s.s_suppkey)
        .select(
            "s_name", "yr", "mo", "n_orders", "n_otif", "otif_ppm",
            "delta_ppm",
        )
    )


@register(
    "x131_revenue_bridge",
    oracle="""
        WITH per AS (
            SELECT o_custkey,
                   CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1
                        AS BIGINT) AS mi,
                   CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                        AS BIGINT) AS cents
            FROM orders GROUP BY 1, 2
        ),
        anchor AS (SELECT MAX(mi) AS max_mi FROM per),
        ev AS (
            SELECT o_custkey, mi, cents AS a_cents,
                   CAST(0 AS BIGINT) AS b_cents, 1 AS an, 0 AS bn
            FROM per
            UNION ALL
            SELECT o_custkey, mi + 1, CAST(0 AS BIGINT), cents, 0, 1
            FROM per
        ),
        cell AS (
            SELECT o_custkey, mi,
                   SUM(a_cents) AS a, SUM(b_cents) AS b,
                   SUM(an) AS an, SUM(bn) AS bn
            FROM ev GROUP BY o_custkey, mi
        )
        SELECT CAST(mi // 12 AS INT) AS yr,
               CAST(mi % 12 + 1 AS INT) AS mo,
               CAST(SUM(CASE WHEN an > 0 AND bn = 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_new,
               CAST(SUM(CASE WHEN an > 0 AND bn = 0 THEN a ELSE 0 END)
                    AS BIGINT) AS new_cents,
               CAST(SUM(CASE WHEN an = 0 AND bn > 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_churned,
               CAST(SUM(CASE WHEN an = 0 AND bn > 0 THEN b ELSE 0 END)
                    AS BIGINT) AS churned_cents,
               CAST(SUM(CASE WHEN an > 0 AND bn > 0 AND a > b
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_expanded,
               CAST(SUM(CASE WHEN an > 0 AND bn > 0 AND a > b
                             THEN a - b ELSE 0 END) AS BIGINT)
                 AS expansion_cents,
               CAST(SUM(CASE WHEN an > 0 AND bn > 0 AND b > a
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_contracted,
               CAST(SUM(CASE WHEN an > 0 AND bn > 0 AND b > a
                             THEN b - a ELSE 0 END) AS BIGINT)
                 AS contraction_cents,
               CAST(SUM(a) - SUM(b) AS BIGINT) AS net_delta_cents
        FROM cell CROSS JOIN anchor
        WHERE mi <= max_mi
        GROUP BY 1, 2
    """,
    tags=("extension", "warehouse", "agg"),
    doc="Month-over-month revenue bridge: delta decomposed into new/churned/expansion/contraction customer cents, exactly additive.",
)
def x131_revenue_bridge(spark: SparkSession, sf: str) -> DataFrame:
    """REVENUE BRIDGE (waterfall) — every month's revenue delta
    decomposed EXACTLY into the four stories a finance review wants:
    customers present now but not last month (new cents), present
    last month but not now (churned cents), present both and up
    (expansion) or down (contraction), with the identity
    new − churned + expansion − contraction = revenue(m) −
    revenue(m−1) holding to the cent (asserted per month in
    tests/test_r12_warehouse.py). 'New'/'churned' are ADJACENT-MONTH
    presence (the MoM bridge convention) — lifetime first-order
    acquisition is x102's view. Integer-exact: cents, counts, plain
    subtraction; every oracle output aggregate is CAST to BIGINT
    (the r12 type-parity rule).

    Scale: the alignment of month m with m−1 is NOT a self-join of
    the aggregate (which would scan or shuffle the rollup twice) —
    each order EXPLODES into two events, (mi, cents, side=now) and
    (mi+1, cents, side=prev), and ONE (custkey, mi) aggregate builds
    the comparison cell; generation is scan-local (explode of a
    2-element struct array, no Python), so the whole bridge is one
    fact-keyed Exchange + a months-sized final rollup. The month
    cap (bridge rows past the corpus max are meaningless) is a 1-row
    broadcast anchor, the x111/x129 pattern."""
    o = load(spark, sf, "orders").select(
        "o_custkey",
        (F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1)
        .cast("bigint")
        .alias("mi"),
        F.expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").alias(
            "cents"
        ),
    )
    zero = F.lit(0).cast("bigint")
    one = F.lit(1).cast("bigint")
    ev = o.select(
        "o_custkey",
        F.explode(
            F.array(
                F.struct(
                    F.col("mi").alias("mi"),
                    F.col("cents").alias("a_cents"),
                    zero.alias("b_cents"),
                    one.alias("an"),
                    zero.alias("bn"),
                ),
                F.struct(
                    (F.col("mi") + 1).alias("mi"),
                    zero.alias("a_cents"),
                    F.col("cents").alias("b_cents"),
                    zero.alias("an"),
                    one.alias("bn"),
                ),
            )
        ).alias("e"),
    ).select("o_custkey", "e.*")
    cell = ev.groupBy("o_custkey", "mi").agg(
        F.sum("a_cents").alias("a"),
        F.sum("b_cents").alias("b"),
        F.sum("an").alias("an"),
        F.sum("bn").alias("bn"),
    )
    anchor = o.agg(F.max("mi").alias("max_mi"))
    now, prev = F.col("an") > 0, F.col("bn") > 0
    return (
        cell.crossJoin(F.broadcast(anchor))
        .filter(F.col("mi") <= F.col("max_mi"))
        .groupBy(
            F.expr("CAST(mi DIV 12 AS INT)").alias("yr"),
            F.expr("CAST(mi % 12 + 1 AS INT)").alias("mo"),
        )
        .agg(
            F.sum(F.when(now & ~prev, 1).otherwise(0))
            .cast("bigint")
            .alias("n_new"),
            F.sum(F.when(now & ~prev, F.col("a")).otherwise(0))
            .cast("bigint")
            .alias("new_cents"),
            F.sum(F.when(~now & prev, 1).otherwise(0))
            .cast("bigint")
            .alias("n_churned"),
            F.sum(F.when(~now & prev, F.col("b")).otherwise(0))
            .cast("bigint")
            .alias("churned_cents"),
            F.sum(
                F.when(now & prev & (F.col("a") > F.col("b")), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_expanded"),
            F.sum(
                F.when(
                    now & prev & (F.col("a") > F.col("b")),
                    F.col("a") - F.col("b"),
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("expansion_cents"),
            F.sum(
                F.when(now & prev & (F.col("b") > F.col("a")), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_contracted"),
            F.sum(
                F.when(
                    now & prev & (F.col("b") > F.col("a")),
                    F.col("b") - F.col("a"),
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("contraction_cents"),
            (F.sum("a") - F.sum("b")).cast("bigint").alias("net_delta_cents"),
        )
    )


@register(
    "x133_abc_migration",
    oracle="""
        WITH pr AS (
            SELECT CAST(year(l_shipdate) AS INT) AS yr, l_partkey AS part,
                   SUM(CAST(floor(l_extendedprice * (1 - l_discount) * 100
                                  + 0.5) AS BIGINT)) AS cents
            FROM lineitem GROUP BY 1, 2
        ),
        classed AS (
            SELECT yr, part, cents,
                   CASE WHEN SUM(cents) OVER (
                                 PARTITION BY yr
                                 ORDER BY cents DESC, part) * 100
                             <= SUM(cents) OVER (PARTITION BY yr) * 80
                          THEN 'A'
                        WHEN SUM(cents) OVER (
                                 PARTITION BY yr
                                 ORDER BY cents DESC, part) * 100
                             <= SUM(cents) OVER (PARTITION BY yr) * 95
                          THEN 'B'
                        ELSE 'C' END AS cls
            FROM pr
        )
        SELECT b.yr, COALESCE(a.cls, 'new') AS class_from, b.cls AS class_to,
               CAST(COUNT(*) AS BIGINT) AS n_parts,
               CAST(SUM(b.cents) AS BIGINT) AS cents_now
        FROM classed b
        LEFT JOIN classed a ON a.part = b.part AND a.yr = b.yr - 1
        GROUP BY 1, 2, 3
    """,
    tags=("extension", "warehouse", "window"),
    doc="Year-over-year ABC class migration matrix for parts: where last year's A/B/C revenue classes moved, with the revenue now sitting in each cell.",
)
def x133_abc_migration(spark: SparkSession, sf: str) -> DataFrame:
    """ABC MIGRATION — x98's Pareto classification made a FLOW (the
    x129 transition-matrix pattern applied to the part dimension):
    every part is classed A/B/C per YEAR by cumulative revenue share
    (A while <= 80%, B to 95%), then consecutive-year classes are
    cross-tabbed — (class_from, class_to) with part counts and the
    revenue now at stake. 'new' = no revenue the prior year. This is
    the assortment review's steering table: A->C rows are collapsing
    stars, new->A rows are breakouts.

    Integer-exact end-to-end: revenue is floor-cents, the class
    boundary compares cum*100 <= tot*80 in INTEGER space (no share
    division at all — the divide-free form of x98's cut), counts and
    cents CAST to BIGINT (the r12 type-parity rule).

    Scale: one fact pass to a (yr, part)-keyed aggregate; the
    cumulative window runs per year over the PART dimension (the x98
    note — dimension-sized, one ordered partition per year); the
    migration join is dimension×2 self-join on (part, yr), never
    fact-sized."""
    li = load(spark, sf, "lineitem")
    pr = li.groupBy(
        F.year("l_shipdate").cast("int").alias("yr"),
        F.col("l_partkey").alias("part"),
    ).agg(
        F.sum(
            F.expr(
                "CAST(floor(l_extendedprice * (1 - l_discount) * 100"
                " + 0.5) AS BIGINT)"
            )
        ).alias("cents")
    )
    cw = Window.partitionBy("yr").orderBy(
        F.desc("cents"), F.asc("part")
    ).rowsBetween(Window.unboundedPreceding, 0)
    tw = Window.partitionBy("yr")
    cum = F.sum("cents").over(cw)
    tot = F.sum("cents").over(tw)
    classed = pr.select(
        "yr",
        "part",
        "cents",
        F.when(cum * 100 <= tot * 80, "A")
        .when(cum * 100 <= tot * 95, "B")
        .otherwise("C")
        .alias("cls"),
    )
    b = classed.alias("b")
    a = classed.alias("a")
    return (
        b.join(
            a,
            (F.col("a.part") == F.col("b.part"))
            & (F.col("a.yr") == F.col("b.yr") - 1),
            "left",
        )
        .groupBy(
            F.col("b.yr").alias("yr"),
            F.coalesce(F.col("a.cls"), F.lit("new")).alias("class_from"),
            F.col("b.cls").alias("class_to"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.sum(F.col("b.cents")).cast("bigint").alias("cents_now"),
        )
    )


@register(
    "x134_discount_leakage",
    oracle="""
        SELECT CAST(year(l_shipdate) AS INT) AS yr,
               CAST(month(l_shipdate) AS INT) AS mo,
               p.p_brand,
               CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS gross_cents,
               CAST(SUM(CAST(floor(l_extendedprice * l_discount * 100 + 0.5)
                             AS BIGINT)) AS BIGINT) AS discount_cents,
               CAST(1000000
                    * SUM(CAST(floor(l_extendedprice * l_discount * 100 + 0.5)
                               AS BIGINT))
                    // SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS leak_ppm
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        GROUP BY 1, 2, 3
    """,
    tags=("extension", "warehouse", "agg"),
    doc="Monthly discount leakage per brand: gross vs discount cents and the leaked share in ppm — the pricing team's margin-erosion report.",
)
def x134_discount_leakage(spark: SparkSession, sf: str) -> DataFrame:
    """DISCOUNT LEAKAGE — per (month, brand), how many cents of gross
    price walked out the door as discount, and the leaked share in
    ppm (the x124/x125 integer-ppm idiom). This is the pricing
    governance report: a brand-month whose leak_ppm trends up is a
    discounting-discipline problem no average-discount column shows
    (it weights by price, not by line count).

    Integer-exact: gross and discount are floor-cents of the SAME
    double expressions both engines evaluate left-associatively
    (F.expr carries the identical text), the ppm is integer division.
    The ppm numerator multiplies in DECIMAL(38,0) (ADVICE r13: the
    DuckDB oracle's SUM runs in HUGEINT, so a bare int64 multiply
    would diverge — wrap with ANSI off, error with ANSI on — past
    ~9.2e12 cents; decimal matches HUGEINT at any real scale and DIV
    still returns BIGINT so the declared schema is unchanged).

    Scale: one fact scan joined to the part DIM (broadcast at any
    realistic part-table size; bucketed join beyond), one
    (yr, mo, brand)-keyed shuffle with map-side partials. Scan prunes
    to 4 lineitem + 2 part columns."""
    li = load(spark, sf, "lineitem").select(
        "l_partkey", "l_shipdate", "l_extendedprice", "l_discount"
    )
    p = load(spark, sf, "part").select("p_partkey", "p_brand")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy(
            F.year("l_shipdate").cast("int").alias("yr"),
            F.month("l_shipdate").cast("int").alias("mo"),
            "p_brand",
        )
        .agg(
            F.sum(
                F.expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)")
            )
            .cast("bigint")
            .alias("gross_cents"),
            F.sum(
                F.expr(
                    "CAST(floor(l_extendedprice * l_discount * 100 + 0.5)"
                    " AS BIGINT)"
                )
            )
            .cast("bigint")
            .alias("discount_cents"),
            F.expr(
                "CAST(CAST(1000000 AS DECIMAL(38,0))"
                " * SUM(CAST(floor(l_extendedprice * l_discount * 100 + 0.5)"
                " AS BIGINT))"
                " DIV SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))"
                " AS BIGINT)"
            ).alias("leak_ppm"),
        )
    )


@register(
    "x135_seasonality_shift",
    oracle="""
        WITH m AS (
            SELECT CAST(year(o_orderdate) AS INT) AS yr,
                   CAST(month(o_orderdate) AS INT) AS mo,
                   SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                     AS mo_cents,
                   CAST(COUNT(*) AS BIGINT) AS n_orders
            FROM orders GROUP BY 1, 2
        ),
        shares AS (
            SELECT yr, mo, n_orders,
                   CAST(mo_cents AS BIGINT) AS month_cents,
                   CAST(SUM(mo_cents) OVER (PARTITION BY yr) AS BIGINT)
                     AS year_cents,
                   CAST(1000000 * mo_cents
                        // SUM(mo_cents) OVER (PARTITION BY yr)
                        AS BIGINT) AS share_ppm
            FROM m
        )
        SELECT yr, mo, n_orders, month_cents, year_cents, share_ppm,
               share_ppm - LAG(share_ppm) OVER (
                   PARTITION BY mo ORDER BY yr) AS yoy_delta_ppm
        FROM shares
    """,
    tags=("extension", "warehouse", "window"),
    doc="Seasonality shift: each month's share of its year's revenue (ppm) and the year-over-year drift of that share per calendar month.",
)
def x135_seasonality_shift(spark: SparkSession, sf: str) -> DataFrame:
    """SEASONALITY SHIFT — each calendar month's share of its year's
    revenue (ppm), plus the year-over-year drift of that share (is
    the Q4 peak growing?). x125's mix-shift pattern re-aimed from the
    priority dimension at the TIME dimension: demand planners read
    yoy_delta_ppm to separate real seasonality drift from absolute
    growth (which cancels out of a share).

    Integer-exact: floor-cents, integer-ppm shares (both engines'
    floor division agrees on the all-positive inputs), BIGINT lag
    deltas; first year per month is NULL (no prior year). The ppm
    numerator multiplies in DECIMAL(38,0) so Spark tracks the
    oracle's HUGEINT past ~9e12 cents/month instead of wrapping
    (ADVICE r13; DIV back to BIGINT keeps the declared schema).

    Scale: one fact pass to a months-sized aggregate; both windows
    (year share, month lag) run over that ~#months-row table —
    driver-trivial no matter the fact volume."""
    o = load(spark, sf, "orders")
    m = o.groupBy(
        F.year("o_orderdate").cast("int").alias("yr"),
        F.month("o_orderdate").cast("int").alias("mo"),
    ).agg(
        F.sum(
            F.expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)")
        ).alias("mo_cents"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    wyr = Window.partitionBy("yr")
    shares = m.select(
        "yr",
        "mo",
        "n_orders",
        F.col("mo_cents").cast("bigint").alias("month_cents"),
        F.sum("mo_cents").over(wyr).cast("bigint").alias("year_cents"),
        F.expr("CAST(1000000 AS DECIMAL(38,0)) * mo_cents").alias("scaled"),
        F.sum("mo_cents").over(wyr).alias("yr_sum"),
    ).select(
        "yr",
        "mo",
        "n_orders",
        "month_cents",
        "year_cents",
        F.expr("CAST(scaled DIV yr_sum AS BIGINT)").alias("share_ppm"),
    )
    lagw = Window.partitionBy("mo").orderBy("yr")
    return shares.withColumn(
        "yoy_delta_ppm",
        F.col("share_ppm") - F.lag("share_ppm").over(lagw),
    )


@register(
    "x138_supplier_hhi",
    oracle="""
        WITH sup_rev AS (
            SELECT s.s_nationkey, l.l_suppkey,
                   SUM(CAST(floor(l.l_extendedprice * (1 - l.l_discount)
                                  * 100 + 0.5) AS BIGINT)) AS cents
            FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
            GROUP BY 1, 2
        ),
        shares AS (
            SELECT s_nationkey,
                   CAST(1000000 * cents
                        // SUM(cents) OVER (PARTITION BY s_nationkey)
                        AS BIGINT) AS share_ppm
            FROM sup_rev
        )
        SELECT n.n_name,
               CAST(COUNT(*) AS BIGINT) AS n_suppliers,
               CAST(MAX(share_ppm) AS BIGINT) AS top_share_ppm,
               CAST(SUM(share_ppm * share_ppm) // 1000000 AS BIGINT)
                 AS hhi_ppm
        FROM shares JOIN nation n ON n.n_nationkey = shares.s_nationkey
        GROUP BY n.n_name
    """,
    tags=("extension", "warehouse", "window", "agg"),
    doc="Supplier revenue concentration per nation: Herfindahl-Hirschman index from integer-ppm shares, with supplier count and top share.",
)
def x138_supplier_hhi(spark: SparkSession, sf: str) -> DataFrame:
    """SUPPLIER CONCENTRATION (HHI) — the market-structure companion
    to x121's Gini: per nation, the Herfindahl-Hirschman index of
    supplier revenue shares (sum of squared shares — monopoly = 1e6
    on this ppm scale, perfectly split n ways = 1e6/n), plus the
    supplier count and the single largest share. Sourcing teams read
    this as supply-chain risk: a nation whose HHI trends up is
    concentrating into fewer suppliers regardless of total volume.
    Integer-exact: floor-cents, integer-ppm shares (the x125 window
    idiom; the share numerator multiplies in DECIMAL(38,0) so the
    cents-scaled product tracks the oracle's HUGEINT instead of
    wrapping past ~9.2e12 nation-cents — ADVICE r13), squared-share
    sums stay far inside int64 (share <= 1e6, square <= 1e12,
    thousands of suppliers per nation), final floor-divide back to
    the ppm scale.

    Scale: one fact pass to a (nation, supplier)-keyed aggregate
    (the supplier dim broadcasts pre-aggregate so the shuffle key is
    already the rollup key); the share window and HHI aggregate run
    over the SUPPLIER DIMENSION (x98's convention — never
    fact-sized); nation broadcasts onto the final ~25-row result."""
    li = load(spark, sf, "lineitem").select(
        "l_suppkey", "l_extendedprice", "l_discount"
    )
    sup = load(spark, sf, "supplier").select("s_suppkey", "s_nationkey")
    nat = load(spark, sf, "nation").select("n_nationkey", "n_name")
    sup_rev = (
        li.join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .groupBy("s_nationkey", "l_suppkey")
        .agg(
            F.sum(
                F.expr(
                    "CAST(floor(l_extendedprice * (1 - l_discount) * 100"
                    " + 0.5) AS BIGINT)"
                )
            ).alias("cents")
        )
    )
    nw = Window.partitionBy("s_nationkey")
    shares = sup_rev.select(
        "s_nationkey",
        F.sum("cents").over(nw).alias("nsum"),
        "cents",
    ).select(
        "s_nationkey",
        F.expr(
            "CAST(CAST(1000000 AS DECIMAL(38,0)) * cents DIV nsum"
            " AS BIGINT)"
        ).alias("share_ppm"),
    )
    return (
        shares.join(
            F.broadcast(nat), shares.s_nationkey == nat.n_nationkey
        )
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            F.max("share_ppm").cast("bigint").alias("top_share_ppm"),
            F.expr(
                "CAST(SUM(share_ppm * share_ppm) DIV 1000000 AS BIGINT)"
            ).alias("hhi_ppm"),
        )
    )


@register(
    "x140_margin_waterfall",
    oracle="""
        WITH m AS (
            SELECT CAST(year(l_shipdate) AS INT) AS yr,
                   CAST(month(l_shipdate) AS INT) AS mo,
                   SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
                     AS gross_cents,
                   SUM(CAST(floor(l_extendedprice * l_discount * 100 + 0.5)
                            AS BIGINT)) AS discount_cents,
                   SUM(CAST(floor(l_extendedprice * (1 - l_discount) * l_tax
                                  * 100 + 0.5) AS BIGINT)) AS tax_cents,
                   SUM(CAST(floor(l_extendedprice * (1 - l_discount)
                                  * (1 + l_tax) * 100 + 0.5) AS BIGINT))
                     AS charge_cents
            FROM lineitem GROUP BY 1, 2
        )
        SELECT yr, mo,
               CAST(gross_cents AS BIGINT) AS gross_cents,
               CAST(discount_cents AS BIGINT) AS discount_cents,
               CAST(tax_cents AS BIGINT) AS tax_cents,
               CAST(charge_cents AS BIGINT) AS charge_cents,
               CAST(1000000 * discount_cents // gross_cents AS BIGINT)
                 AS discount_ppm,
               CAST(1000000 * tax_cents // gross_cents AS BIGINT)
                 AS tax_ppm
        FROM m
    """,
    tags=("extension", "warehouse", "agg"),
    doc="Monthly margin waterfall: gross, discount, tax and final charge cents per ship month, with discount/tax shares of gross in ppm.",
)
def x140_margin_waterfall(spark: SparkSession, sf: str) -> DataFrame:
    """MARGIN WATERFALL — the finance bridge x134 (discount leakage)
    feeds into: per ship month, the four tiers every revenue
    walk-through reads (gross list price, minus discount, plus tax,
    equals final charge — the TPC-H charge decomposition), plus the
    discount and tax shares of gross in ppm. A month whose
    discount_ppm widens while charge grows is buying revenue with
    margin; the waterfall shows it in one row where separate
    revenue/discount reports hide it.

    Integer-exact: all four tiers are floor-cents of expressions both
    engines evaluate in the identical left-associative order (F.expr
    carries the same text); the ppm shares multiply in DECIMAL(38,0)
    (the ADVICE-r13 idiom — tracks the oracle's HUGEINT past ~9.2e12
    month-cents instead of wrapping; DIV returns BIGINT so the
    declared schema is unchanged). The tiers do NOT telescope exactly
    (each is independently floor-rounded — deliberately, so each tier
    is itself a sum of exact per-line cents, the auditor's
    convention).

    Scale: one lineitem scan pruned to 4 columns, one (yr, mo)-keyed
    shuffle with map-side partials onto ~#months rows — no join, no
    window, nothing fact-sized past the scan."""
    li = load(spark, sf, "lineitem").select(
        "l_shipdate", "l_extendedprice", "l_discount", "l_tax"
    )
    return (
        li.groupBy(
            F.year("l_shipdate").cast("int").alias("yr"),
            F.month("l_shipdate").cast("int").alias("mo"),
        )
        .agg(
            F.sum(
                F.expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)")
            ).alias("gross_cents"),
            F.sum(
                F.expr(
                    "CAST(floor(l_extendedprice * l_discount * 100 + 0.5)"
                    " AS BIGINT)"
                )
            ).alias("discount_cents"),
            F.sum(
                F.expr(
                    "CAST(floor(l_extendedprice * (1 - l_discount) * l_tax"
                    " * 100 + 0.5) AS BIGINT)"
                )
            ).alias("tax_cents"),
            F.sum(
                F.expr(
                    "CAST(floor(l_extendedprice * (1 - l_discount)"
                    " * (1 + l_tax) * 100 + 0.5) AS BIGINT)"
                )
            ).alias("charge_cents"),
        )
        .select(
            "yr",
            "mo",
            F.col("gross_cents").cast("bigint").alias("gross_cents"),
            F.col("discount_cents").cast("bigint").alias("discount_cents"),
            F.col("tax_cents").cast("bigint").alias("tax_cents"),
            F.col("charge_cents").cast("bigint").alias("charge_cents"),
            F.expr(
                "CAST(CAST(1000000 AS DECIMAL(38,0)) * discount_cents"
                " DIV gross_cents AS BIGINT)"
            ).alias("discount_ppm"),
            F.expr(
                "CAST(CAST(1000000 AS DECIMAL(38,0)) * tax_cents"
                " DIV gross_cents AS BIGINT)"
            ).alias("tax_ppm"),
        )
    )


@register(
    "x142_inventory_turns",
    oracle="""
        WITH rev AS (
            SELECT p.p_brand AS brand,
                   CAST(year(l.l_shipdate) AS INT) AS yr,
                   SUM(CAST(floor(l.l_extendedprice * (1 - l.l_discount)
                                  * 100 + 0.5) AS BIGINT)) AS revenue_cents
            FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
            GROUP BY 1, 2
        ),
        inv AS (
            SELECT p_brand AS brand,
                   SUM(CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT))
                     AS inventory_cents,
                   CAST(COUNT(*) AS BIGINT) AS n_parts
            FROM part GROUP BY 1
        )
        SELECT r.brand, r.yr,
               CAST(r.revenue_cents AS BIGINT) AS revenue_cents,
               CAST(i.inventory_cents AS BIGINT) AS inventory_cents,
               i.n_parts,
               CAST(1000000 * r.revenue_cents // i.inventory_cents AS BIGINT)
                 AS turns_ppm
        FROM rev r JOIN inv i ON i.brand = r.brand
    """,
    tags=("extension", "warehouse", "agg"),
    doc="Inventory turns proxy per (brand, year): discounted revenue cents over the brand's catalog retail value, in ppm.",
)
def x142_inventory_turns(spark: SparkSession, sf: str) -> DataFrame:
    """INVENTORY TURNS (VERDICT r14 #8's cadence) — per (p_brand,
    ship year): discounted revenue over the brand's catalog retail
    value, in ppm. The classic COGS/avg-inventory ratio with the
    retail catalog standing in for the stock ledger (the fixture has
    no partsupp/stock table); a brand whose turns_ppm sinks while its
    catalog value holds is dead stock the revenue report alone never
    shows.

    Integer-exact: per-line revenue and per-part retail value are
    independently floor-rounded cents (the x140 auditor convention);
    the ratio multiplies in DECIMAL(38,0) (ADVICE-r13 idiom) and DIV
    returns BIGINT.

    Scale: one lineitem scan pruned to 4 columns joined BROADCAST to
    the part dim (parts are bounded; the fact side never shuffles for
    the join), one (brand, yr) shuffle onto ~brands x years rows; the
    inventory side is a part-only aggregate joined broadcast onto
    that 100-row result."""
    li = load(spark, sf, "lineitem").select(
        "l_partkey", "l_shipdate", "l_extendedprice", "l_discount"
    )
    part = load(spark, sf, "part")
    rev = (
        li.join(F.broadcast(part.select("p_partkey", "p_brand")),
                li.l_partkey == F.col("p_partkey"))
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.year("l_shipdate").cast("int").alias("yr"),
        )
        .agg(
            F.sum(
                F.expr(
                    "CAST(floor(l_extendedprice * (1 - l_discount)"
                    " * 100 + 0.5) AS BIGINT)"
                )
            ).alias("revenue_cents")
        )
    )
    inv = part.groupBy(F.col("p_brand").alias("brand")).agg(
        F.sum(
            F.expr("CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT)")
        ).alias("inventory_cents"),
        F.count(F.lit(1)).cast("bigint").alias("n_parts"),
    )
    return (
        rev.join(F.broadcast(inv), "brand")
        .select(
            "brand",
            "yr",
            F.col("revenue_cents").cast("bigint").alias("revenue_cents"),
            F.col("inventory_cents").cast("bigint").alias("inventory_cents"),
            "n_parts",
            F.expr(
                "CAST(CAST(1000000 AS DECIMAL(38,0)) * revenue_cents"
                " DIV inventory_cents AS BIGINT)"
            ).alias("turns_ppm"),
        )
    )


@register(
    "x143_backlog_aging",
    oracle="""
        WITH anchor AS (SELECT MAX(o_orderdate) AS d FROM orders),
        open_orders AS (
            SELECT o.o_orderpriority AS priority,
                   CAST(date_diff('day', CAST(o.o_orderdate AS DATE),
                                  CAST(anchor.d AS DATE)) // 30 AS BIGINT)
                     AS age_bucket_30d,
                   o.o_totalprice
            FROM orders o, anchor
            WHERE o.o_orderstatus IN ('O', 'P')
        )
        SELECT priority, age_bucket_30d,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS backlog_cents
        FROM open_orders
        GROUP BY priority, age_bucket_30d
    """,
    tags=("extension", "warehouse", "agg"),
    doc="Backlog aging: non-finalized orders bucketed into 30-day age bands against the corpus as-of date, per priority.",
)
def x143_backlog_aging(spark: SparkSession, sf: str) -> DataFrame:
    """BACKLOG AGING (VERDICT r14 #8's cadence) — every order not yet
    finalized (status O/P), aged from its order date to the corpus
    as-of date (MAX(o_orderdate) — the reproducible stand-in for
    'today') and bucketed into 30-day bands per priority, with count
    and floor-cents order value. The ops review that catches aging
    high-priority backlog a status count hides.

    Determinism: the as-of date comes from the data, so the result
    is scale-stable and both engines age against the same anchor;
    integer day diffs DIV 30 bucket identically (nonnegative by
    construction).

    Scale: one orders scan with the status filter pushed to parquet,
    the 1-row as-of aggregate broadcast onto it (the crossJoin is a
    broadcast-of-one-row anchor, the x94 pattern), then one
    (priority, bucket)-keyed shuffle onto ~priorities x buckets
    rows."""
    o = load(spark, sf, "orders").select(
        "o_orderpriority", "o_orderstatus", "o_orderdate", "o_totalprice"
    )
    asof = o.agg(F.max("o_orderdate").alias("asof_d"))
    return (
        o.filter(F.col("o_orderstatus").isin("O", "P"))
        .crossJoin(F.broadcast(asof))
        .groupBy(
            F.col("o_orderpriority").alias("priority"),
            F.expr(
                "CAST(datediff(to_date(asof_d), to_date(o_orderdate))"
                " DIV 30 AS BIGINT)"
            ).alias("age_bucket_30d"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum(
                F.expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)")
            )
            .cast("bigint")
            .alias("backlog_cents"),
        )
    )


@register(
    "x144_supplier_leadtime",
    oracle="""
        WITH lag AS (
            SELECT l.l_suppkey AS suppkey,
                   CAST(date_diff('day', CAST(o.o_orderdate AS DATE),
                                  CAST(l.l_shipdate AS DATE)) AS BIGINT)
                     AS lead_days
            FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
        ),
        hist AS (
            SELECT suppkey, lead_days, CAST(COUNT(*) AS BIGINT) AS n
            FROM lag GROUP BY suppkey, lead_days
        ),
        cum AS (
            SELECT suppkey, lead_days, n,
                   SUM(n) OVER (PARTITION BY suppkey ORDER BY lead_days) AS cw,
                   SUM(n) OVER (PARTITION BY suppkey) AS total
            FROM hist
        ),
        pct AS (
            SELECT suppkey,
                   CAST(MAX(total) AS BIGINT) AS n_lines,
                   CAST(MIN(CASE WHEN 100 * cw >= 50 * total
                                 THEN lead_days END) AS BIGINT) AS p50_days,
                   CAST(MIN(CASE WHEN 100 * cw >= 90 * total
                                 THEN lead_days END) AS BIGINT) AS p90_days,
                   CAST(MAX(lead_days) AS BIGINT) AS max_days
            FROM cum GROUP BY suppkey
        )
        SELECT s.s_name, p.n_lines, p.p50_days, p.p90_days, p.max_days
        FROM pct p JOIN supplier s ON s.s_suppkey = p.suppkey
    """,
    tags=("extension", "warehouse", "sla", "scale"),
    doc="Per-supplier order-to-ship lead-time percentiles (exact inverted-CDF over the bounded day-histogram) — x126 keyed by supplier.",
)
def x144_supplier_leadtime(spark: SparkSession, sf: str) -> DataFrame:
    """SUPPLIER LEAD-TIME PERCENTILES (VERDICT r14 #8's cadence) —
    x126's inverted-CDF histogram percentile (exact, interpolation-
    free, bounded-domain) keyed by SUPPLIER instead of calendar
    month: per supplier, p50/p90 order-to-ship days, volume, and the
    worst case — the procurement scorecard row that decides who gets
    the next contract.

    Scale: the lead-day domain is bounded (a few hundred values), so
    the histogram is suppliers x domain sized no matter how many
    trillion lines; ONE fact-keyed shuffle builds it with map-side
    combine, the windows run over histogram rows, and the supplier
    dim joins BROADCAST onto the ~supplier-count result."""
    from pyspark.sql import Window

    li = load(spark, sf, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    o = load(spark, sf, "orders").select("o_orderkey", "o_orderdate")
    s = load(spark, sf, "supplier").select("s_suppkey", "s_name")
    hist = (
        li.join(o.hint("merge"), li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("l_suppkey").alias("suppkey"),
            F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate"))
            .cast("bigint")
            .alias("lead_days"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    w_cum = Window.partitionBy("suppkey").orderBy("lead_days")
    w_all = Window.partitionBy("suppkey")
    cum = hist.select(
        "suppkey",
        "lead_days",
        F.sum("n").over(w_cum).alias("cw"),
        F.sum("n").over(w_all).alias("total"),
    )
    pct = cum.groupBy("suppkey").agg(
        F.max("total").cast("bigint").alias("n_lines"),
        F.min(
            F.when(100 * F.col("cw") >= 50 * F.col("total"), F.col("lead_days"))
        )
        .cast("bigint")
        .alias("p50_days"),
        F.min(
            F.when(100 * F.col("cw") >= 90 * F.col("total"), F.col("lead_days"))
        )
        .cast("bigint")
        .alias("p90_days"),
        F.max("lead_days").cast("bigint").alias("max_days"),
    )
    return pct.join(
        F.broadcast(s), pct.suppkey == F.col("s_suppkey")
    ).select("s_name", "n_lines", "p50_days", "p90_days", "max_days")

"""Relational operator inventory — filters, projections, joins,
aggregations, windows, sorts, set ops (SURVEY.md §2.2–§2.7).

Each query re-expresses a reference query *shape* (cited per function)
on the driver's TPC-H-ish fixtures, Spark-first:

- predicates/projections stay in native Column expressions so Catalyst
  pushes them into the parquet scan;
- the reference's correlated-MAX-subquery / N+1-loop idioms
  (web_scheduler.py:4628-4632, :4669-4688) become window functions and
  single broadcast joins;
- money aggregates go through DECIMAL(18,2) and back to DOUBLE so the
  result is order-insensitive bit-exact (Spark and the DuckDB oracle
  agree regardless of partitioning / summation order — this is what
  makes the value-hash comparison stable at any parallelism).

Scale notes are inline per operator: what broadcasts, what shuffles,
and why the plan survives 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_spark.registry import register
from etl_spark.tables import load

# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------


def _dec_sum(col: str, scale: int = 2):
    """Order-insensitive exact sum of a 2-dp money column: sum in
    DECIMAL, surface as DOUBLE. Exact => identical across Spark
    partitionings and vs. the oracle."""
    return F.sum(F.col(col).cast(f"decimal(18,{scale})")).cast("double")


def _dec_expr_sum(expr, scale: int = 4):
    return F.sum(expr.cast(f"decimal(22,{scale})")).cast("double")


# ---------------------------------------------------------------------------
# P — predicates / projections (SURVEY §2.2)
# ---------------------------------------------------------------------------


@register(
    "p01_eq_filter",
    oracle="""
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders WHERE o_orderstatus = 'F'
    """,
    tags=("predicate",),
)
def p01_eq_filter(spark: SparkSession, sf: str) -> DataFrame:
    """P3 equality predicate (reference `WHERE id = ?`,
    web_scheduler.py:1154/:3804). Pushed to the parquet scan."""
    return (
        load(spark, sf, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


@register(
    "p02_like_contains",
    oracle="""
        SELECT p_partkey, p_name, p_type
        FROM part WHERE p_type LIKE '%ROM%'
    """,
    tags=("predicate",),
)
def p02_like_contains(spark: SparkSession, sf: str) -> DataFrame:
    """P4 `LIKE '%x%'` substring filter (task-name filter,
    web_scheduler.py:4604-4605). 'ROM' is a genuine infix of the
    fixture's 'PROMO' type (non-empty at every SF — the r1-r4 'BRASS'
    literal matched nothing in the synthetic vocabulary, making the
    green vacuous; VERDICT r4 §What's wrong #1)."""
    return (
        load(spark, sf, "part")
        .filter(F.col("p_type").contains("ROM"))
        .select("p_partkey", "p_name", "p_type")
    )


@register(
    "p03_isin",
    oracle="""
        SELECT n_nationkey, n_name, n_regionkey
        FROM nation WHERE n_regionkey IN (0, 2, 4)
    """,
    tags=("predicate",),
)
def p03_isin(spark: SparkSession, sf: str) -> DataFrame:
    """P5 `IN (...)` list predicate (dependency status check,
    web_scheduler.py:1256-1271)."""
    return (
        load(spark, sf, "nation")
        .filter(F.col("n_regionkey").isin(0, 2, 4))
        .select("n_nationkey", "n_name", "n_regionkey")
    )


@register(
    "p04_range_time",
    oracle="""
        SELECT event_id, ts, user_id, event_type
        FROM events
        WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
          AND ts <  TIMESTAMP '2024-01-20 00:00:00'
    """,
    tags=("predicate",),
)
def p04_range_time(spark: SparkSession, sf: str) -> DataFrame:
    """P9 range/time predicate (`expires_at > now`, retry-delay
    elapsed — web_scheduler.py:1721/:1366). At 100 TB this is the
    partition-pruning predicate on a time-partitioned table."""
    ev = load(spark, sf, "events")
    return ev.filter(
        (F.col("ts") >= F.lit("2024-01-10 00:00:00").cast("timestamp_ntz"))
        & (F.col("ts") < F.lit("2024-01-20 00:00:00").cast("timestamp_ntz"))
    ).select("event_id", "ts", "user_id", "event_type")


@register(
    "p05_compound_where",
    oracle="""
        SELECT l_orderkey, l_linenumber, l_quantity, l_discount
        FROM lineitem
        WHERE l_quantity > 30 AND l_discount BETWEEN 0.02 AND 0.08
          AND l_returnflag = 'N'
    """,
    tags=("predicate",),
)
def p05_compound_where(spark: SparkSession, sf: str) -> DataFrame:
    """P7 conjunctive dynamic WHERE builder (where_conditions assembly,
    web_scheduler.py:4599-4644) — conditional .filter chaining; all
    conjuncts reach PushedFilters."""
    df = load(spark, sf, "lineitem")
    # the reference builds this list dynamically from request params;
    # chained .filter() calls compose to one conjunction in the plan
    for cond in (
        F.col("l_quantity") > 30,
        F.col("l_discount").between(0.02, 0.08),
        F.col("l_returnflag") == "N",
    ):
        df = df.filter(cond)
    return df.select("l_orderkey", "l_linenumber", "l_quantity", "l_discount")


@register(
    "p06_not_empty_string",
    oracle="""
        SELECT doc_id, lang, n_chars
        FROM documents
        WHERE text IS NOT NULL AND text <> ''
    """,
    tags=("predicate",),
)
def p06_not_empty_string(spark: SparkSession, sf: str) -> DataFrame:
    """P10 non-empty-string predicate (details IS NOT NULL AND != '',
    web_scheduler.py:5204)."""
    return (
        load(spark, sf, "documents")
        .filter(F.col("text").isNotNull() & (F.col("text") != ""))
        .select("doc_id", "lang", "n_chars")
    )


@register(
    "p07_bool_projection",
    oracle="""
        SELECT o_orderkey,
               (o_totalprice > 200000.0) AS is_big,
               NOT (o_orderstatus = 'F') AS is_open
        FROM orders
    """,
    tags=("predicate",),
)
def p07_bool_projection(spark: SparkSession, sf: str) -> DataFrame:
    """P8/F13 boolean predicate & NOT (is_active = 1 /
    `SET is_active = NOT is_active`, web_scheduler.py:1302/:4954)."""
    return load(spark, sf, "orders").select(
        "o_orderkey",
        (F.col("o_totalprice") > 200000.0).alias("is_big"),
        (~(F.col("o_orderstatus") == "F")).alias("is_open"),
    )


@register(
    "prj01_alias_unicode",
    oracle="""
        SELECT o_orderkey AS "订单号",
               o_orderpriority AS "优先级",
               o_totalprice AS "总价格",
               o_orderdate AS "创建日期"
        FROM orders WHERE o_totalprice > 150000.0
    """,
    tags=("projection",),
)
def prj01_alias_unicode(spark: SparkSession, sf: str) -> DataFrame:
    """P1 aliased projection with non-ASCII aliases — the reference's
    stored monitoring script 33 (`Select order_number as 订单号, …`,
    scheduler.db sql_scripts row 33)."""
    return (
        load(spark, sf, "orders")
        .filter(F.col("o_totalprice") > 150000.0)
        .select(
            F.col("o_orderkey").alias("订单号"),
            F.col("o_orderpriority").alias("优先级"),
            F.col("o_totalprice").alias("总价格"),
            F.col("o_orderdate").alias("创建日期"),
        )
    )


@register(
    "prj02_star",
    oracle="SELECT * FROM region",
    tags=("projection",),
)
def prj02_star(spark: SparkSession, sf: str) -> DataFrame:
    """P2 `SELECT *` passthrough (stored script 30; `SELECT t.* FROM
    tasks t`, web_scheduler.py:4618)."""
    return load(spark, sf, "region").select("*")


# ---------------------------------------------------------------------------
# J — joins (SURVEY §2.3)
# ---------------------------------------------------------------------------


@register(
    "j01_inner_2way",
    oracle="""
        SELECT o.o_orderkey, o.o_totalprice, c.c_name, c.c_mktsegment
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        WHERE o.o_orderstatus = 'O'
    """,
    tags=("join",),
)
def j01_inner_2way(spark: SparkSession, sf: str) -> DataFrame:
    """J1 inner equi-join (sql_scripts ⋈ db_configs,
    web_scheduler.py:1050-1055). customer is the small side →
    broadcast-hash join, no shuffle of the fact table."""
    orders = load(spark, sf, "orders").filter(F.col("o_orderstatus") == "O")
    customer = load(spark, sf, "customer")
    return orders.join(
        F.broadcast(customer), orders.o_custkey == customer.c_custkey, "inner"
    ).select("o_orderkey", "o_totalprice", "c_name", "c_mktsegment")


@register(
    "j02_star_3way",
    oracle="""
        SELECT c.c_mktsegment,
               CAST(COUNT(*) AS BIGINT) AS n_lines,
               CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        FROM lineitem l
        JOIN orders o   ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY c.c_mktsegment
    """,
    tags=("join", "agg"),
)
def j02_star_3way(spark: SparkSession, sf: str) -> DataFrame:
    """J2 3-way star lookup join (alerts ⋈ scripts ⋈ email_configs,
    web_scheduler.py:3129-3140). Fact (lineitem) joins two lookups;
    customer broadcasts so only the lineitem⋈orders shuffle remains —
    at 100 TB co-partition lineitem/orders by orderkey (bucketing) to
    remove that one too."""
    li = load(spark, sf, "lineitem")
    orders = load(spark, sf, "orders")
    cust = load(spark, sf, "customer")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            _dec_sum("l_extendedprice").alias("sum_price"),
        )
    )


@register(
    "j03_left_outer",
    oracle="""
        SELECT c.c_custkey, c.c_name,
               CAST(COUNT(o.o_orderkey) AS BIGINT) AS n_orders
        FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        GROUP BY c.c_custkey, c.c_name
    """,
    tags=("join", "agg"),
)
def j03_left_outer(spark: SparkSession, sf: str) -> DataFrame:
    """J3 left outer join (notification_logs ⟕ email_configs,
    web_scheduler.py:5376-5385); COUNT(col) counts only matched rows,
    preserving customers with zero orders."""
    cust = load(spark, sf, "customer")
    orders = load(spark, sf, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@register(
    "j04_latest_per_key_join",
    oracle="""
        SELECT c.c_custkey, c.c_name, lo.last_orderdate
        FROM customer c
        LEFT JOIN (
            SELECT o_custkey, MAX(o_orderdate) AS last_orderdate
            FROM orders GROUP BY o_custkey
        ) lo ON c.c_custkey = lo.o_custkey
    """,
    tags=("join", "agg"),
)
def j04_latest_per_key_join(spark: SparkSession, sf: str) -> DataFrame:
    """J4 join against a latest-per-key derived table (tasks ⟕ latest
    task_log, web_scheduler.py:4623-4634). The reference's correlated
    subquery becomes an aggregate + join; replaces the N+1 per-row
    lookup loop (J6, :4669-4688) with ONE broadcast join."""
    cust = load(spark, sf, "customer")
    latest = (
        load(spark, sf, "orders")
        .groupBy("o_custkey")
        .agg(F.max("o_orderdate").alias("last_orderdate"))
    )
    return cust.join(latest, cust.c_custkey == latest.o_custkey, "left").select(
        "c_custkey", "c_name", "last_orderdate"
    )


@register(
    "j05_correlated_max",
    oracle="""
        SELECT o1.o_custkey, o1.o_orderkey, o1.o_orderdate
        FROM orders o1
        WHERE o1.o_orderdate = (
            SELECT MAX(o2.o_orderdate) FROM orders o2
            WHERE o2.o_custkey = o1.o_custkey
        )
    """,
    tags=("join", "window"),
)
def j05_correlated_max(spark: SparkSession, sf: str) -> DataFrame:
    """J5/W1 correlated scalar MAX subquery (argmax per group,
    web_scheduler.py:4628-4632/:1264-1268), rewritten as rank() over a
    window. rank (not row_number) keeps ALL rows tied at the max —
    exact tie parity with the correlated-MAX oracle (SURVEY §2.3 note).
    One shuffle on the partition key; no self-join of the big table."""
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_orderdate"))
    return (
        load(spark, sf, "orders")
        .withColumn("rnk", F.rank().over(w))
        .filter(F.col("rnk") == 1)
        .select("o_custkey", "o_orderkey", "o_orderdate")
    )


@register(
    "j06_semi",
    oracle="""
        SELECT c_custkey, c_name FROM customer c
        WHERE EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F'
        )
    """,
    tags=("join",),
)
def j06_semi(spark: SparkSession, sf: str) -> DataFrame:
    """J7 existence guard (`COUNT(*) > 0` check,
    web_scheduler.py:3927-3932) as a proper left-semi join — no count
    materialization, short-circuits per key."""
    cust = load(spark, sf, "customer")
    f_orders = load(spark, sf, "orders").filter(F.col("o_orderstatus") == "F")
    return cust.join(
        f_orders, cust.c_custkey == f_orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


@register(
    "j07_anti",
    oracle="""
        SELECT c_custkey, c_name FROM customer c
        WHERE NOT EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F'
        )
    """,
    tags=("join",),
)
def j07_anti(spark: SparkSession, sf: str) -> DataFrame:
    """P6/J-anti: never-ran predicate (`tl.task_id IS NULL` after a
    left join, web_scheduler.py:4639-4640) expressed directly as a
    left-anti join. The right side is filtered (status 'F') so the
    kept set is non-empty — the fixtures are referentially complete,
    making an unfiltered anti-join empty by construction (the r1-r4
    vacuous green; VERDICT r4 §What's wrong #1)."""
    cust = load(spark, sf, "customer")
    f_orders = load(spark, sf, "orders").filter(F.col("o_orderstatus") == "F")
    return cust.join(
        f_orders, cust.c_custkey == f_orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


# ---------------------------------------------------------------------------
# A — aggregations (SURVEY §2.4)
# ---------------------------------------------------------------------------


@register(
    "a01_count_total",
    oracle="SELECT CAST(COUNT(*) AS BIGINT) AS n_rows FROM lineitem",
    tags=("agg",),
)
def a01_count_total(spark: SparkSession, sf: str) -> DataFrame:
    """A1 COUNT(*) total (pagination totals, web_scheduler.py:5365-5370).
    Map-side partial count + single-row exchange."""
    return load(spark, sf, "lineitem").agg(F.count(F.lit(1)).alias("n_rows"))


@register(
    "a02_count_threshold",
    oracle="""
        SELECT CAST(COUNT(*) AS BIGINT) AS n
        FROM lineitem WHERE l_discount > 0.09
        HAVING COUNT(*) > 10
    """,
    tags=("agg", "alerting"),
)
def a02_count_threshold(spark: SparkSession, sf: str) -> DataFrame:
    """A6 row-count threshold condition (`rows_gt` alert eval,
    web_scheduler.py:3354-3366) as a declarative agg+filter — unlike
    the reference, the full result set is never materialized just to
    take its len()."""
    return (
        load(spark, sf, "lineitem")
        .filter(F.col("l_discount") > 0.09)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 10)
    )


@register(
    "a03_max_per_group",
    oracle="""
        SELECT user_id, MAX(ts) AS last_seen,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM events GROUP BY user_id
    """,
    tags=("agg",),
)
def a03_max_per_group(spark: SparkSession, sf: str) -> DataFrame:
    """A3 MAX per group (latest execution_time per task,
    web_scheduler.py:1264-1268). Partial max map-side, one shuffle."""
    return (
        load(spark, sf, "events")
        .groupBy("user_id")
        .agg(F.max("ts").alias("last_seen"), F.count(F.lit(1)).alias("n_events"))
    )


@register(
    "a04_distinct",
    oracle="SELECT DISTINCT o_custkey, o_orderstatus FROM orders",
    tags=("agg",),
)
def a04_distinct(spark: SparkSession, sf: str) -> DataFrame:
    """A5 DISTINCT projection (`SELECT DISTINCT task_id, status`,
    web_scheduler.py:4626); A4's GROUP-BY-for-dedup collapses to the
    same plan."""
    return load(spark, sf, "orders").select("o_custkey", "o_orderstatus").distinct()


@register(
    "a05_bool_and_gate",
    oracle="""
        SELECT user_id,
               BOOL_AND(event_type <> 'error') AS all_ok
        FROM events GROUP BY user_id
    """,
    tags=("agg", "orchestrator"),
)
def a05_bool_and_gate(spark: SparkSession, sf: str) -> DataFrame:
    """A7 all-predecessors-success gate (dependency check loop,
    web_scheduler.py:1276-1286) as a bool_and aggregate — the
    orchestrator's dependency gate is this exact query over task_logs."""
    return (
        load(spark, sf, "events")
        .groupBy("user_id")
        .agg(F.every(F.col("event_type") != "error").alias("all_ok"))
    )


@register(
    "a06_lastn_conditional",
    oracle="""
        SELECT user_id,
               CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT)
                 AS errors_in_last5
        FROM (
            SELECT user_id, event_type,
                   ROW_NUMBER() OVER (
                       PARTITION BY user_id
                       ORDER BY ts DESC, event_id DESC) AS rn
            FROM events
        ) t WHERE rn <= 5
        GROUP BY user_id
    """,
    tags=("agg", "window", "orchestrator"),
)
def a06_lastn_conditional(spark: SparkSession, sf: str) -> DataFrame:
    """A2/W2 consecutive-failure counter: count 'failed' among the
    last N runs per key (web_scheduler.py:1350-1362). event_id breaks
    ts ties so both engines pick identical rows. One window shuffle —
    vs the reference's per-task LIMIT-N query loop."""
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        load(spark, sf, "events")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .groupBy("user_id")
        .agg(
            F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
            .cast("bigint")
            .alias("errors_in_last5")
        )
    )


# ---------------------------------------------------------------------------
# W — windows (SURVEY §2.5)
# ---------------------------------------------------------------------------


@register(
    "w01_topk_per_group",
    oracle="""
        SELECT n_nationkey, c_custkey, c_acctbal
        FROM (
            SELECT n.n_nationkey, c.c_custkey, c.c_acctbal,
                   ROW_NUMBER() OVER (
                       PARTITION BY n.n_nationkey
                       ORDER BY c.c_acctbal DESC, c.c_custkey ASC) AS rn
            FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        ) t WHERE rn <= 3
    """,
    tags=("window", "join"),
)
def w01_topk_per_group(spark: SparkSession, sf: str) -> DataFrame:
    """W1 latest/top-row-per-key (correlated MAX rewrite,
    web_scheduler.py:4628-4632) generalized to top-3 per group;
    c_custkey tiebreak keeps it deterministic."""
    cust = load(spark, sf, "customer")
    nation = load(spark, sf, "nation")
    w = Window.partitionBy("n_nationkey").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    )
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("n_nationkey", "c_custkey", "c_acctbal")
    )


@register(
    "w02_running_sum",
    oracle="""
        SELECT o_custkey, o_orderkey, o_orderdate,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_orderdate ASC, o_orderkey ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS DOUBLE) AS running_spend
        FROM orders
    """,
    tags=("window",),
)
def w02_running_sum(spark: SparkSession, sf: str) -> DataFrame:
    """Running total per key — the idiomatic upgrade of the
    reference's recency-ordered log scans (web_scheduler.py:1339).
    DECIMAL accumulation keeps the prefix sums bit-stable."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return load(spark, sf, "orders").select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .over(w)
        .cast("double")
        .alias("running_spend"),
    )


# ---------------------------------------------------------------------------
# O — sorts / limits / pagination (SURVEY §2.6)
# ---------------------------------------------------------------------------


@register(
    "o01_top10_orders",
    oracle="""
        SELECT o_orderkey, o_totalprice, o_orderdate
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey ASC
        LIMIT 10
    """,
    tags=("sort",),
)
def o01_top10_orders(spark: SparkSession, sf: str) -> DataFrame:
    """O1/O3 single-key DESC sort + LIMIT (`ORDER BY execution_time
    DESC LIMIT 1`, web_scheduler.py:1335-1341). Spark runs this as
    TakeOrderedAndProject — per-partition top-K then a K-row merge,
    never a full sort. o_orderkey tiebreak => deterministic."""
    return (
        load(spark, sf, "orders")
        .select("o_orderkey", "o_totalprice", "o_orderdate")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
    )


@register(
    "o02_multikey_page",
    oracle="""
        SELECT o_orderkey, o_orderpriority, o_orderdate
        FROM orders
        ORDER BY o_orderpriority DESC, o_orderdate ASC, o_orderkey ASC
        LIMIT 20 OFFSET 40
    """,
    tags=("sort",),
)
def o02_multikey_page(spark: SparkSession, sf: str) -> DataFrame:
    """O2/O4 multi-key mixed-direction sort + LIMIT/OFFSET pagination
    (`ORDER BY is_default DESC, created_at ASC` :1818; `LIMIT ? OFFSET
    ?` :5261-5267). Unique final key makes pages stable under shuffle."""
    return (
        load(spark, sf, "orders")
        .select("o_orderkey", "o_orderpriority", "o_orderdate")
        .orderBy(F.desc("o_orderpriority"), F.asc("o_orderdate"), F.asc("o_orderkey"))
        .offset(40)
        .limit(20)
    )


@register(
    "o03_latest_row",
    oracle="""
        SELECT event_id, ts, user_id, event_type
        FROM events
        ORDER BY ts DESC, event_id DESC
        LIMIT 1
    """,
    tags=("sort",),
)
def o03_latest_row(spark: SparkSession, sf: str) -> DataFrame:
    """O3 top-1 latest row (web_scheduler.py:5103-5109)."""
    return (
        load(spark, sf, "events")
        .select("event_id", "ts", "user_id", "event_type")
        .orderBy(F.desc("ts"), F.desc("event_id"))
        .limit(1)
    )


# ---------------------------------------------------------------------------
# set ops (SURVEY §2.7)
# ---------------------------------------------------------------------------


@register(
    "set01_union",
    oracle="""
        SELECT c_nationkey AS nationkey FROM customer
        UNION
        SELECT s_nationkey AS nationkey FROM supplier
    """,
    tags=("setop",),
)
def set01_union(spark: SparkSession, sf: str) -> DataFrame:
    """§2.7 UNION (the tasks-table migration INSERT..SELECT shape,
    web_scheduler.py:379-383). unionByName + distinct."""
    c = load(spark, sf, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load(spark, sf, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.unionByName(s).distinct()


@register(
    "set02_except",
    oracle="""
        SELECT DISTINCT o_custkey AS custkey FROM orders
        WHERE o_orderpriority = '1-URGENT'
        EXCEPT
        SELECT DISTINCT o_custkey AS custkey FROM orders
        WHERE o_orderstatus = 'F'
    """,
    tags=("setop",),
)
def set02_except(spark: SparkSession, sf: str) -> DataFrame:
    """EXCEPT — customers with an urgent order but no finished order.
    subtract == EXCEPT DISTINCT. The two sides overlap without either
    containing the other, so the difference is non-empty at every SF —
    the r1-r4 form subtracted a superset (supplier nations cover all
    customer nations by construction), a vacuous green (VERDICT r4
    §What's wrong #1)."""
    o = load(spark, sf, "orders")
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("custkey")
    )
    finished = o.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("custkey")
    )
    return urgent.distinct().subtract(finished.distinct())


@register(
    "set03_intersect",
    oracle="""
        SELECT DISTINCT c_nationkey AS nationkey FROM customer
        INTERSECT
        SELECT DISTINCT s_nationkey AS nationkey FROM supplier
    """,
    tags=("setop",),
)
def set03_intersect(spark: SparkSession, sf: str) -> DataFrame:
    """INTERSECT — nations with BOTH customers and suppliers,
    completing the set-op family (union/except/intersect).
    intersect == INTERSECT DISTINCT; Spark plans it as a left-semi
    join over the deduplicated sides, so the shuffle is keyed on the
    value and NULL keys match NULL (set semantics, not join
    semantics)."""
    c = load(spark, sf, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load(spark, sf, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)

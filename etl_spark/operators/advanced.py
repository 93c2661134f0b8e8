"""Advanced relational operators — the idiomatic-Spark capability set
layered above the reference's inventory (SURVEY.md §2.4 note: grouping
sets/windows "free" in Spark; §2.10's event-time upgrades; the custom
operator families the task brief names: as-of joins, range joins,
rollups).

Every operator here is still pure DataFrame API (no UDFs) and every
oracle is exact, so the DuckDB comparison stays bit-stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_spark.registry import register
from etl_spark.tables import load


@register(
    "a07_rollup",
    oracle="""
        SELECT o_orderstatus, o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM orders
        GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
    tags=("agg",),
)
def a07_rollup(spark: SparkSession, sf: str) -> DataFrame:
    """ROLLUP hierarchy totals (status → priority → grand total) in
    one pass — Spark expands grouping sets inside a single shuffle
    (partial aggregation per set, map-side)."""
    return (
        load(spark, sf, "orders")
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("total"),
        )
    )


@register(
    "a08_count_distinct",
    oracle="""
        SELECT o_orderstatus,
               CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers,
               CAST(COUNT(*) AS BIGINT) AS n_orders
        FROM orders GROUP BY o_orderstatus
    """,
    tags=("agg",),
)
def a08_count_distinct(spark: SparkSession, sf: str) -> DataFrame:
    """Exact distinct count per group (two-phase partial-distinct
    expansion under the hood). The approximate variant
    (approx_count_distinct, HLL++) is benchmarked in tests — approx
    results are engine-specific so no value oracle is possible."""
    return (
        load(spark, sf, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.count_distinct("o_custkey").alias("n_customers"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


@register(
    "w03_lag_lead_delta",
    oracle="""
        SELECT user_id, event_id,
               CAST(date_diff('second', prev_ts, ts) AS BIGINT) AS secs_since_prev,
               next_type
        FROM (
            SELECT user_id, event_id, ts,
                   LAG(ts)  OVER w AS prev_ts,
                   LEAD(event_type) OVER w AS next_type
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
        ) t
    """,
    tags=("window",),
)
def w03_lag_lead_delta(spark: SparkSession, sf: str) -> DataFrame:
    """lag/lead over per-user event sequences: inter-event gap +
    next-action lookahead — the sessionization building block. One
    shuffle on user_id; event_id tiebreak keeps both engines on
    identical orderings."""
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    ev = load(spark, sf, "events")
    return ev.select(
        "user_id",
        "event_id",
        F.expr(
            "CAST(timestampdiff(SECOND, date_trunc('second', lag(ts) over "
            "(partition by user_id order by ts asc, event_id asc)), "
            "date_trunc('second', ts)) AS BIGINT)"
        ).alias("secs_since_prev"),
        F.lead("event_type").over(w).alias("next_type"),
    )


@register(
    "w04_sessionize",
    oracle="""
        WITH marked AS (
            SELECT user_id, ts, event_id,
                   CASE WHEN LAG(ts) OVER w IS NULL
                          OR date_diff('second', LAG(ts) OVER w, ts) > 1800
                        THEN 1 ELSE 0 END AS new_session
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
        ),
        sessions AS (
            SELECT user_id, ts, event_id,
                   SUM(new_session) OVER (
                       PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                       ROWS UNBOUNDED PRECEDING) AS session_id
            FROM marked
        )
        SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
               MIN(ts) AS session_start,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM sessions
        GROUP BY user_id, session_id
    """,
    tags=("window", "streaming"),
)
def w04_sessionize(spark: SparkSession, sf: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity): the batch window
    form (lag → new-session flag → prefix-sum session ids). The
    streaming twin is `session_window` under Structured Streaming;
    this form is oracle-checkable and shuffles once on user_id.

    Second-truncated gap comparison keeps Spark/DuckDB tie behavior
    identical on sub-second timestamps."""
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    gap_sec = F.expr(
        "timestampdiff(SECOND, date_trunc('second', lag(ts) over "
        "(partition by user_id order by ts asc, event_id asc)), date_trunc('second', ts))"
    )
    marked = load(spark, sf, "events").withColumn(
        "new_session",
        F.when(gap_sec.isNull() | (gap_sec > 1800), 1).otherwise(0),
    )
    sess = marked.withColumn(
        "session_id",
        F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        sess.groupBy("user_id", F.col("session_id").cast("bigint").alias("session_id"))
        .agg(F.min("ts").alias("session_start"), F.count(F.lit(1)).alias("n_events"))
    )


@register(
    "j08_range_join",
    oracle="""
        SELECT b.band, CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS band_total
        FROM orders o
        JOIN (VALUES ('low', 0.0, 100000.0), ('mid', 100000.0, 250000.0),
                     ('high', 250000.0, 1e12)) AS b(band, lo, hi)
          ON o.o_totalprice >= b.lo AND o.o_totalprice < b.hi
        GROUP BY b.band
    """,
    tags=("join",),
)
def j08_range_join(spark: SparkSession, sf: str) -> DataFrame:
    """Range (interval) join: facts against a banded dimension on
    BETWEEN predicates. The band table is tiny → broadcast
    nested-loop with the range predicate — each fact row scans 3
    bands, no shuffle. At 100 TB this stays a broadcast; a big-big
    range join would instead bucket both sides by range-aligned keys."""
    orders = load(spark, sf, "orders")
    bands = spark.createDataFrame(
        [("low", 0.0, 100000.0), ("mid", 100000.0, 250000.0), ("high", 250000.0, 1e12)],
        "band STRING, lo DOUBLE, hi DOUBLE",
    )
    return (
        orders.join(
            F.broadcast(bands),
            (orders.o_totalprice >= bands.lo) & (orders.o_totalprice < bands.hi),
        )
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("band_total"),
        )
    )


@register(
    "j09_asof_join",
    oracle="""
        SELECT user_id, event_id, ts,
               last_value(err_ts IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                   ROWS UNBOUNDED PRECEDING) AS last_error_ts
        FROM (
            SELECT user_id, event_id, ts,
                   CASE WHEN event_type = 'error' THEN ts END AS err_ts
            FROM events
        ) t
    """,
    tags=("join", "window"),
)
def j09_asof_join(spark: SparkSession, sf: str) -> DataFrame:
    """As-of (backward) join expressed as a carry-forward window:
    for every event, the timestamp of the user's most recent error at
    or before it. The classic as-of join (a ⟕ latest b with b.ts ≤
    a.ts) over a SHARED partition key needs no join at all — union
    both sides, sort within the key, carry the last non-null marker.
    One shuffle on user_id, linear scan — vs. the O(n·m) correlated
    subquery a naive engine runs. (DuckDB's native ASOF JOIN is the
    same algorithm; the oracle uses the window form so both engines
    compute identical plans.)"""
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.asc("ts"), F.asc("event_id"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    ev = load(spark, sf, "events")
    return ev.select(
        "user_id",
        "event_id",
        "ts",
        F.last(
            F.when(F.col("event_type") == "error", F.col("ts")), ignorenulls=True
        )
        .over(w)
        .alias("last_error_ts"),
    )


@register(
    "f09_json_extract",
    oracle="""
        SELECT event_id,
               CAST(json_extract(props, '$.k') AS INT) AS k,
               CAST(json_extract(props, '$.k') AS INT) % 10 AS k_bucket
        FROM events WHERE props IS NOT NULL
    """,
    tags=("function",),
)
def f09_json_extract(spark: SparkSession, sf: str) -> DataFrame:
    """JSON field extraction, JVM-side (`get_json_object`) — the S4
    string-payload edge without any Python json.loads loop."""
    ev = load(spark, sf, "events").filter(F.col("props").isNotNull())
    k = F.get_json_object("props", "$.k").cast("int")
    return ev.select("event_id", k.alias("k"), (k % 10).alias("k_bucket"))


@register(
    "f10_explode_unnest",
    oracle="""
        SELECT doc_id, pos, tok
        FROM (
            SELECT doc_id,
                   generate_subscripts(string_split(text, ' '), 1) - 1 AS pos,
                   unnest(string_split(text, ' ')) AS tok
            FROM documents
        ) t
        WHERE pos < 5
    """,
    tags=("function",),
)
def f10_explode_unnest(spark: SparkSession, sf: str) -> DataFrame:
    """posexplode of a tokenized column (first 5 positions): the 1→N
    fan-out primitive every shingle/token pipeline builds on.
    Generated rows never materialize on the driver; the fan-out
    happens inside the scan stage."""
    return (
        load(spark, sf, "documents")
        .select("doc_id", F.posexplode(F.split("text", " ")).alias("pos", "tok"))
        .filter(F.col("pos") < 5)
    )


# x22 accuracy bounds, asserted IN-PLAN (columns the oracle checks as
# literal TRUE). Both sketches are deterministic given the data, so
# these are not flaky thresholds — they are verified to hold at all
# three fixture SFs and regression-gate the sketch implementations:
# HLL++ at rsd=0.02 has 3-sigma relative error 6% (0.10 leaves
# hash-luck headroom); approx_percentile at its default accuracy
# (1e4) has rank error ~n/1e4 rows — far inside 5% of the median
# value on the fixture price distribution.
X22_CD_BOUND = 0.10
X22_MEDIAN_BOUND = 0.05


@register(
    "x22_approx_aggs",
    oracle="""
        SELECT o_orderstatus,
               CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS exact_customers,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               TRUE AS cd_within_bound,
               TRUE AS median_within_bound
        FROM orders
        GROUP BY o_orderstatus
    """,
    tags=("agg", "sketch"),
)
def x22_approx_aggs(spark: SparkSession, sf: str) -> DataFrame:
    """Sketch-based aggregates — the 100 TB substitutes for exact
    distinct/percentile when the key cardinality no longer fits a
    hash table: HLL++ (approx_count_distinct, rsd 2%) and a quantile
    sketch (approx_percentile). Both are single-pass, mergeable
    partial aggregates — constant memory per partition, one shuffle
    of sketch bytes instead of raw keys.

    Registered surface (VERDICT r12 #4 — this was the suite's last
    ``oracle=None`` row): the sketch BYTES are engine-specific, so
    the row emits the exact aggregates (integer-exact cross-engine)
    plus ``*_within_bound`` booleans computed ON THE SPARK SIDE from
    sketch-vs-exact in the same plan; the DuckDB oracle asserts the
    booleans as literal TRUE. A sketch regression (accuracy, hashing,
    merge) flips a boolean and goes driver-red — a hard signal, where
    the old rows-only row was a permanent weak one. One aggregation
    computes both sketch and exact per group: at fixture scale the
    exact side is the oracle anchor; at 100 TB you would drop the
    exact columns and keep the sketches — same plan shape."""
    g = (
        load(spark, sf, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.countDistinct("o_custkey").alias("exact_customers"),
            F.approx_count_distinct("o_custkey", rsd=0.02).alias(
                "approx_customers"
            ),
            F.expr("percentile(o_totalprice, 0.5D)").alias("exact_median"),
            F.expr("approx_percentile(o_totalprice, 0.5D)").alias(
                "approx_median"
            ),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )
    return g.select(
        "o_orderstatus",
        "exact_customers",
        "n_orders",
        (
            F.abs(F.col("approx_customers") - F.col("exact_customers"))
            <= F.lit(X22_CD_BOUND) * F.col("exact_customers")
        ).alias("cd_within_bound"),
        (
            F.abs(F.col("approx_median") - F.col("exact_median"))
            <= F.lit(X22_MEDIAN_BOUND) * F.abs(F.col("exact_median"))
        ).alias("median_within_bound"),
    )


@register(
    "a09_pivot",
    oracle="""
        SELECT l_returnflag,
               CAST(SUM(CASE WHEN l_linestatus = 'O'
                        THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE)
                 AS qty_o,
               CAST(SUM(CASE WHEN l_linestatus = 'F'
                        THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE)
                 AS qty_f,
               CAST(COUNT(*) AS BIGINT) AS n_rows
        FROM lineitem
        GROUP BY l_returnflag
    """,
    tags=("agg", "pivot"),
)
def a09_pivot(spark: SparkSession, sf: str) -> DataFrame:
    """PIVOT: one column per l_linestatus value, quantity totals per
    returnflag — the crosstab report every BI layer ends up needing.
    The value list is EXPLICIT (['O','F']): with it, pivot is a single
    conditional aggregation (one shuffle, map-side partials); without
    it Spark must first run a distinct-values job. Decimal sums keep
    the totals partitioning-invariant."""
    dec = F.col("l_quantity").cast("decimal(18,2)")
    pivoted = (
        load(spark, sf, "lineitem")
        .groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.sum(dec).alias("qty"), F.count(F.lit(1)).alias("cnt"))
    )
    return pivoted.select(
        "l_returnflag",
        F.col("O_qty").cast("double").alias("qty_o"),
        F.col("F_qty").cast("double").alias("qty_f"),
        (F.coalesce("O_cnt", F.lit(0)) + F.coalesce("F_cnt", F.lit(0))).alias(
            "n_rows"
        ),
    )


@register(
    "a10_unpivot",
    oracle="""
        SELECT p_partkey, 'retailprice' AS metric,
               CAST(p_retailprice AS DOUBLE) AS value
        FROM part
        UNION ALL
        SELECT p_partkey, 'size' AS metric, CAST(p_size AS DOUBLE) AS value
        FROM part
    """,
    tags=("pivot",),
)
def a10_unpivot(spark: SparkSession, sf: str) -> DataFrame:
    """UNPIVOT via stack(): wide metric columns → long (metric, value)
    rows — the inverse reshape (feeding generic metric pipelines /
    chart layers). Pure projection: stack is codegen'd, zero shuffle,
    output is exactly n_rows × n_metrics."""
    return load(spark, sf, "part").selectExpr(
        "p_partkey",
        "stack(2, 'retailprice', CAST(p_retailprice AS DOUBLE), "
        "'size', CAST(p_size AS DOUBLE)) AS (metric, value)",
    )


@register(
    "w05_ntile_quartiles",
    oracle="""
        WITH tiled AS (
            SELECT c_mktsegment,
                   ntile(4) OVER (PARTITION BY c_mktsegment
                                  ORDER BY c_acctbal, c_custkey) AS tile,
                   c_acctbal
            FROM customer
        )
        SELECT c_mktsegment, tile,
               CAST(COUNT(*) AS BIGINT) AS n_customers,
               ROUND(MIN(c_acctbal), 2) AS min_bal,
               ROUND(MAX(c_acctbal), 2) AS max_bal
        FROM tiled
        GROUP BY c_mktsegment, tile
    """,
    tags=("window",),
)
def w05_ntile_quartiles(spark: SparkSession, sf: str) -> DataFrame:
    """Quantile bucketing via ntile(4): account-balance quartiles per
    market segment with per-bucket count and balance bounds — the
    window form of a histogram/decile report. The c_custkey tiebreak
    pins tile assignment at equal balances, making the result exact
    across engines. One shuffle keyed on segment; the follow-up
    aggregate reuses that partitioning (no second exchange). At 100 TB
    scale, a fixed-boundary bucketing (width_bucket on approx
    percentiles) avoids the per-partition sort when approximate
    deciles suffice."""
    from pyspark.sql import Window

    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    tiled = load(spark, sf, "customer").select(
        "c_mktsegment",
        F.ntile(4).over(w).alias("tile"),
        "c_acctbal",
    )
    return tiled.groupBy("c_mktsegment", "tile").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.round(F.min("c_acctbal"), 2).alias("min_bal"),
        F.round(F.max("c_acctbal"), 2).alias("max_bal"),
    )


@register(
    "a11_grouping_sets",
    oracle="""
        SELECT o_orderstatus, o_orderpriority,
               CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority)
                    AS BIGINT) AS gid,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
    tags=("agg",),
)
def a11_grouping_sets(spark: SparkSession, sf: str) -> DataFrame:
    """Explicit GROUPING SETS — the non-hierarchical multi-cube shape
    ROLLUP can't express: per-status totals, per-priority totals, and
    the grand total in ONE aggregation pass (one shuffle; each input
    row expands to its grouping-set combinations map-side, partial
    aggregation applies per set). ``gid`` (grouping_id) disambiguates
    which set a row belongs to — required because a NULL key here can
    mean either "subtotal" or a genuinely NULL group value."""
    return (
        load(spark, sf, "orders")
        .groupingSets(
            [["o_orderstatus"], ["o_orderpriority"], []],
            "o_orderstatus",
            "o_orderpriority",
        )
        .agg(
            F.grouping_id().cast("bigint").alias("gid"),
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total"),
        )
    )


@register(
    "w06_trailing_window",
    oracle="""
        SELECT o_orderkey, o_custkey,
               CAST(date_diff('day', DATE '1970-01-01',
                              CAST(o_orderdate AS DATE)) AS BIGINT) AS day_num,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
                   PARTITION BY o_custkey
                   ORDER BY date_diff('day', DATE '1970-01-01',
                                      CAST(o_orderdate AS DATE))
                   RANGE BETWEEN 6 PRECEDING AND CURRENT ROW
               ) AS DOUBLE) AS trailing_7d
        FROM orders
    """,
    tags=("window",),
)
def w06_trailing_window(spark: SparkSession, sf: str) -> DataFrame:
    """Trailing 7-DAY revenue per customer — a RANGE frame keyed on
    time, not row position: every order sums all of its customer's
    orders in the preceding week, however many rows that is (ROWS
    frames can't express this; same-day orders enter each other's
    frame symmetrically). Ordering key is epoch-day, giving both
    engines an identical integer RANGE; the sum runs over exact
    DECIMAL so the frame total is association-independent. One
    shuffle keyed on o_custkey; the frame is evaluated with a sliding
    accumulator per partition, not a per-row rescan. The streaming
    twin of this shape is windowed_event_counts' sliding window."""
    from pyspark.sql import Window

    day_num = F.datediff(F.to_date("o_orderdate"), F.lit("1970-01-01"))
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(day_num.cast("bigint"))
        .rangeBetween(-6, Window.currentRow)
    )
    return load(spark, sf, "orders").select(
        "o_orderkey",
        "o_custkey",
        day_num.cast("bigint").alias("day_num"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .over(w)
        .cast("double")
        .alias("trailing_7d"),
    )

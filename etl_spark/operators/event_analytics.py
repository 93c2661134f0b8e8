"""Event/behavioral analytics over the ``events`` stream table —
the batch twins of the reference's monitoring dashboard
(web_scheduler.py:4582-4733 renders per-task status funnels, failure
streaks and activity summaries as N+1 Python loops; here each is ONE
declarative plan).

Scale notes (100 TB): every operator below shuffles the fact table at
most once on ``user_id`` (funnel, transitions) or on a low-cardinality
derived key (day / cohort-week), then aggregates map-side. The
window-based funnel reuses a single Exchange for all three step
computations because every window shares the same partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_spark.registry import register
from etl_spark.tables import load


@register(
    "e01_funnel_steps",
    oracle="""
        WITH funnel_events AS (
            SELECT * FROM events
            WHERE event_type IN ('signup', 'click', 'purchase')
        ),
        per_user AS (
            SELECT user_id,
                   MIN(CASE WHEN event_type = 'signup' THEN ts END)
                     OVER (PARTITION BY user_id) AS t_signup
            FROM funnel_events
        ),
        u1 AS (SELECT DISTINCT user_id, t_signup FROM per_user),
        clicks AS (
            SELECT e.user_id, MIN(e.ts) AS t_click
            FROM events e JOIN u1 ON e.user_id = u1.user_id
            WHERE e.event_type = 'click' AND e.ts > u1.t_signup
            GROUP BY e.user_id
        ),
        buys AS (
            SELECT e.user_id, MIN(e.ts) AS t_purchase
            FROM events e JOIN clicks c ON e.user_id = c.user_id
            WHERE e.event_type = 'purchase' AND e.ts > c.t_click
            GROUP BY e.user_id
        )
        SELECT '1_signup' AS step,
               CAST(COUNT(t_signup) AS BIGINT) AS n_users
        FROM u1 WHERE t_signup IS NOT NULL
        UNION ALL
        SELECT '2_click_after_signup', CAST(COUNT(*) AS BIGINT) FROM clicks
        UNION ALL
        SELECT '3_purchase_after_click', CAST(COUNT(*) AS BIGINT) FROM buys
    """,
    tags=("events", "window", "agg"),
)
def e01_funnel_steps(spark: SparkSession, sf: str) -> DataFrame:
    """Strictly-ordered conversion funnel signup → click → purchase:
    a user counts for step N only if the step-N event happened AFTER
    their step-(N-1) event. Three windowed conditional MINs over ONE
    ``user_id`` partitioning — Spark plans a single Exchange and
    reuses its sort for all three windows, so at 100 TB this is one
    fact shuffle regardless of funnel depth (vs. the self-join-per-
    step SQL formulation, which shuffles once per step). Only the
    three funnel event types enter the window — the IN filter pushes
    into the parquet scan, so non-funnel traffic (views, errors: most
    of a real event stream) never reaches the shuffle; users with no
    funnel events drop out of per_user, which the counts ignore
    anyway (COUNT over NULL), so the result is identical."""
    ev = load(spark, sf, "events").filter(
        F.col("event_type").isin("signup", "click", "purchase")
    )
    w = Window.partitionBy("user_id")
    t1 = F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).over(w)
    staged = ev.withColumn("t_signup", t1)
    t2 = F.min(
        F.when(
            (F.col("event_type") == "click") & (F.col("ts") > F.col("t_signup")),
            F.col("ts"),
        )
    ).over(w)
    staged = staged.withColumn("t_click", t2)
    t3 = F.min(
        F.when(
            (F.col("event_type") == "purchase") & (F.col("ts") > F.col("t_click")),
            F.col("ts"),
        )
    ).over(w)
    per_user = (
        staged.withColumn("t_purchase", t3)
        .select("user_id", "t_signup", "t_click", "t_purchase")
        .distinct()
    )
    counts = per_user.agg(
        F.count("t_signup").alias("c1"),
        F.count("t_click").alias("c2"),
        F.count("t_purchase").alias("c3"),
    )
    return counts.select(
        F.expr(
            "stack(3, '1_signup', c1, '2_click_after_signup', c2, "
            "'3_purchase_after_click', c3) AS (step, n_users)"
        )
    )


@register(
    "e02_retention_cohorts",
    oracle="""
        WITH first_seen AS (
            SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_week
            FROM events GROUP BY user_id
        ),
        activity AS (
            SELECT DISTINCT user_id, date_trunc('week', ts) AS active_week
            FROM events
        )
        SELECT CAST(f.cohort_week AS DATE) AS cohort_week,
               CAST(date_diff('day', f.cohort_week, a.active_week) // 7
                    AS INT) AS week_offset,
               CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS n_active
        FROM activity a JOIN first_seen f ON a.user_id = f.user_id
        GROUP BY 1, 2
    """,
    tags=("events", "agg", "join"),
)
def e02_retention_cohorts(spark: SparkSession, sf: str) -> DataFrame:
    """Weekly retention triangle: users cohorted by ISO week of first
    event; each cell counts distinct cohort members active N weeks
    later. The fact shuffles twice (distinct user-weeks; first-seen
    per user); the per-user cohort table then broadcast-joins onto
    the activity rows (at cluster scale AQE swaps this to a shuffled
    join keyed on ``user_id`` — still fact-proportional, never a
    cartesian), and the final COUNT DISTINCT expands partial-distinct
    map-side before the tiny cohort-cell Exchange."""
    ev = load(spark, sf, "events")
    first_seen = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    activity = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("active_week")
    ).distinct()
    return (
        activity.join(first_seen, "user_id")
        .groupBy(
            F.col("cohort_week").cast("date").alias("cohort_week"),
            (
                F.datediff(F.col("active_week"), F.col("cohort_week"))
                .cast("int")
                / F.lit(7)
            )
            .cast("int")
            .alias("week_offset"),
        )
        .agg(F.count_distinct("user_id").alias("n_active"))
    )


@register(
    "e03_event_transitions",
    oracle="""
        WITH seq AS (
            SELECT user_id, event_type,
                   LAG(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS prev_type
            FROM events
        ),
        pairs AS (
            SELECT prev_type, event_type, CAST(COUNT(*) AS BIGINT) AS n
            FROM seq WHERE prev_type IS NOT NULL
            GROUP BY prev_type, event_type
        )
        SELECT prev_type, event_type, n,
               CAST(CAST(n AS DOUBLE)
                    / SUM(CAST(n AS DOUBLE)) OVER (PARTITION BY prev_type)
                    AS DOUBLE) AS share
        FROM pairs
    """,
    tags=("events", "window", "agg"),
)
def e03_event_transitions(spark: SparkSession, sf: str) -> DataFrame:
    """First-order Markov transition matrix of user behavior:
    LAG(event_type) per user in (ts, event_id) order, then pair
    counts and the per-source share. One fact Exchange on
    ``user_id`` for the lag, one tiny Exchange on the 5×5 pair
    grid; the share window runs over the aggregate (25 rows at any
    scale), so this is scale-invariant after the first shuffle.
    The share divides BIGINT-exact counts, so it is bit-stable."""
    ev = load(spark, sf, "events")
    seq = ev.withColumn(
        "prev_type",
        F.lag("event_type").over(
            Window.partitionBy("user_id").orderBy("ts", "event_id")
        ),
    ).filter(F.col("prev_type").isNotNull())
    pairs = seq.groupBy("prev_type", "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    share_w = Window.partitionBy("prev_type")
    return pairs.withColumn(
        "share",
        (F.col("n").cast("double") / F.sum(F.col("n").cast("double")).over(share_w)),
    )


@register(
    "e04_value_heavy_hitters",
    oracle="""
        WITH per_user AS (
            SELECT user_id,
                   SUM(CAST(value AS DECIMAL(18,2))) AS total_value
            FROM events WHERE event_type = 'purchase'
            GROUP BY user_id
        )
        SELECT user_id,
               CAST(total_value AS DOUBLE) AS total_value,
               CAST(total_value AS DOUBLE)
                 / CAST(SUM(total_value) OVER () AS DOUBLE) AS pct_of_total
        FROM per_user
        ORDER BY total_value DESC, user_id
        LIMIT 5
    """,
    tags=("events", "agg", "window", "limit"),
)
def e04_value_heavy_hitters(spark: SparkSession, sf: str) -> DataFrame:
    """Top-5 purchasers by exact DECIMAL spend with share-of-total.
    The heavy-hitter scan is one keyed aggregation; the global total
    is an unpartitioned window over the (per-user) aggregate — at
    100 TB that window input is |users|, not |events|, and the final
    top-5 is TakeOrderedAndProject (no full sort). Shares divide
    DOUBLE casts of the exact decimal sums — dividing the DECIMALs
    directly truncates Spark's quotient to a fixed scale while DuckDB
    keeps more digits, which broke 9-sig-fig parity at sf0.1 (the
    decimal-division parity rule — cast to DOUBLE before dividing)."""
    per_user = (
        load(spark, sf, "events")
        .filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.sum(F.col("value").cast("decimal(18,2)")).alias("tv"))
    )
    total_w = Window.partitionBy()
    return (
        per_user.withColumn(
            "pct_of_total",
            F.col("tv").cast("double")
            / F.sum("tv").over(total_w).cast("double"),
        )
        .select(
            "user_id",
            F.col("tv").cast("double").alias("total_value"),
            "pct_of_total",
        )
        .orderBy(F.col("tv").desc(), "user_id")
        .limit(5)
    )


@register(
    "e05_error_spike_zscore",
    oracle="""
        WITH daily AS (
            SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
                   CAST(COUNT(*) AS BIGINT) AS n_errors
            FROM events WHERE event_type = 'error'
            GROUP BY 1
        ),
        stats AS (
            SELECT day, n_errors,
                   CAST(SUM(n_errors) OVER () AS BIGINT) AS s1,
                   CAST(SUM(n_errors * n_errors) OVER () AS BIGINT) AS s2,
                   CAST(COUNT(*) OVER () AS BIGINT) AS cnt
            FROM daily
        )
        SELECT day, n_errors,
               CAST((CAST(n_errors AS DOUBLE) - CAST(s1 AS DOUBLE) / cnt)
                    / sqrt((CAST(s2 AS DOUBLE)
                            - CAST(s1 AS DOUBLE) * s1 / cnt)
                           / (cnt - 1))
                    AS DOUBLE) AS zscore
        FROM stats
        WHERE cnt > 1
    """,
    tags=("events", "agg", "window"),
)
def e05_error_spike_zscore(spark: SparkSession, sf: str) -> DataFrame:
    """Daily error-count anomaly score — the alerting primitive
    behind the reference's failure-monitoring dashboard
    (web_scheduler.py:4582-4733), as one plan: one keyed agg to
    daily counts, then mean/stddev via BIGINT-exact moment sums in
    an unpartitioned window over the (tiny) daily table. The z-score
    is derived from exact integer sums in one double expression, so
    both engines compute the identical float. No stddev_samp() —
    its incremental float accumulation is aggregation-order-
    dependent and breaks cross-engine parity."""
    daily = (
        load(spark, sf, "events")
        .filter(F.col("event_type") == "error")
        .groupBy(F.date_trunc("day", F.col("ts")).cast("date").alias("day"))
        .agg(F.count(F.lit(1)).alias("n_errors"))
    )
    w = Window.partitionBy()
    stats = (
        daily.withColumn("s1", F.sum("n_errors").over(w))
        .withColumn("s2", F.sum(F.col("n_errors") * F.col("n_errors")).over(w))
        .withColumn("cnt", F.count(F.lit(1)).over(w))
        .filter(F.col("cnt") > 1)
    )
    mean = F.col("s1").cast("double") / F.col("cnt")
    var = (
        F.col("s2").cast("double") - F.col("s1").cast("double") * F.col("s1") / F.col("cnt")
    ) / (F.col("cnt") - 1)
    return stats.select(
        "day",
        "n_errors",
        ((F.col("n_errors").cast("double") - mean) / F.sqrt(var)).cast("double").alias("zscore"),
    )


@register(
    "e07_funnel_latency",
    oracle="""
        WITH su AS (
            SELECT user_id, MIN(ts) AS t_signup
            FROM events WHERE event_type = 'signup' GROUP BY user_id
        ),
        conv AS (
            SELECT su.user_id, su.t_signup, MIN(e.ts) AS t_purchase
            FROM events e JOIN su ON e.user_id = su.user_id
            WHERE e.event_type = 'purchase' AND e.ts > su.t_signup
            GROUP BY su.user_id, su.t_signup
        ),
        lat AS (
            SELECT CAST(date_trunc('day', t_signup) AS DATE) AS cohort_day,
                   date_diff('second', t_signup, t_purchase) AS secs
            FROM conv
        )
        SELECT cohort_day,
               CAST(COUNT(*) AS BIGINT) AS n_converted,
               ROUND(quantile_cont(secs, 0.5), 3) AS p50_secs,
               ROUND(quantile_cont(secs, 0.9), 3) AS p90_secs
        FROM lat
        GROUP BY cohort_day
    """,
    tags=("events", "agg"),
)
def e07_funnel_latency(spark: SparkSession, sf: str) -> DataFrame:
    """Time-to-convert: per signup-day cohort, the median and p90
    latency from a user's first signup to their first subsequent
    purchase — the funnel-health metric behind e01's step counts
    (reference renders per-task latency badges from N+1 loops,
    web_scheduler.py:4582-4733).

    Scale: both the signup MIN and the purchase-after-signup MIN
    shuffle on ``user_id`` — the join between them is co-partitioned,
    so Spark reuses one Exchange per side; the final cohort-day agg is
    tiny. Exact percentiles over per-cohort latency lists are fine at
    daily-cohort cardinality; at 100 TB with million-row cohorts swap
    approx_percentile.

    DuckDB's ``date_diff('second', ...)`` counts second-boundary
    crossings, so the Spark side truncates both endpoints to the
    second before diffing — identical integer seconds."""
    ev = load(spark, sf, "events")
    su = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_signup"))
    )
    conv = (
        ev.filter(F.col("event_type") == "purchase")
        .join(su, "user_id")
        .filter(F.col("ts") > F.col("t_signup"))
        .groupBy("user_id", "t_signup")
        .agg(F.min("ts").alias("t_purchase"))
    )
    lat = conv.select(
        F.date_trunc("day", "t_signup").cast("date").alias("cohort_day"),
        F.expr(
            "timestampdiff(SECOND, date_trunc('second', t_signup), "
            "date_trunc('second', t_purchase))"
        ).alias("secs"),
    )
    return lat.groupBy("cohort_day").agg(
        F.count(F.lit(1)).alias("n_converted"),
        F.round(F.expr("percentile(secs, 0.5)"), 3).alias("p50_secs"),
        F.round(F.expr("percentile(secs, 0.9)"), 3).alias("p90_secs"),
    )


@register(
    "e08_dau_stickiness",
    oracle="""
        WITH daily AS (
            SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
                   CAST(COUNT(DISTINCT user_id) AS BIGINT) AS dau
            FROM events GROUP BY 1
        ),
        weekly AS (
            SELECT CAST(date_trunc('week', ts) AS DATE) AS week,
                   CAST(COUNT(DISTINCT user_id) AS BIGINT) AS wau
            FROM events GROUP BY 1
        )
        SELECT d.day, d.dau, w.wau,
               ROUND(d.dau * 1.0 / w.wau, 6) AS stickiness
        FROM daily d
        JOIN weekly w ON CAST(date_trunc('week', d.day) AS DATE) = w.week
    """,
    tags=("events", "agg"),
)
def e08_dau_stickiness(spark: SparkSession, sf: str) -> DataFrame:
    """Engagement stickiness: daily active users joined to the active
    users of their ISO week, ratio DAU/WAU — the standard
    product-health metric the reference's activity page approximates
    with repeated full-table scans (web_scheduler.py:1289-1582).

    Scale: each COUNT DISTINCT shuffles once on (period, user_id)
    partial-aggregated map-side; the day→week join is a broadcast of
    the (tiny) weekly aggregate. At 100 TB replace exact distinct with
    HLL sketches (x22) merged across days to get WAU from daily state
    without a second scan."""
    ev = load(spark, sf, "events")
    daily = ev.groupBy(
        F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(F.count_distinct("user_id").alias("dau"))
    weekly = ev.groupBy(
        F.date_trunc("week", "ts").cast("date").alias("week")
    ).agg(F.count_distinct("user_id").alias("wau"))
    return (
        daily.join(
            F.broadcast(weekly),
            F.date_trunc("week", F.col("day")).cast("date") == F.col("week"),
        )
        .select(
            "day",
            "dau",
            "wau",
            F.round(F.col("dau") / F.col("wau"), 6).alias("stickiness"),
        )
    )


EWMA_N = 8  # trailing window width; weights 2^0 (oldest) .. 2^(n-1) (newest)


@register(
    "e09_ewma_spike",
    oracle=f"""
        WITH e AS (
            SELECT event_id, user_id,
                   CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS rn
            FROM events WHERE event_type = 'purchase'
        ),
        agg AS (
            SELECT a.event_id, a.user_id, a.cents,
                   SUM(b.cents * (CAST(1 AS BIGINT)
                       << CAST(LEAST(a.rn, {EWMA_N}) - 1
                               - (a.rn - b.rn) AS INT))) AS wsum,
                   (CAST(1 AS BIGINT)
                       << CAST(LEAST(a.rn, {EWMA_N}) AS INT)) - 1 AS wnorm
            FROM e a JOIN e b
              ON a.user_id = b.user_id
             AND b.rn BETWEEN a.rn - {EWMA_N - 1} AND a.rn
            GROUP BY a.event_id, a.user_id, a.cents, a.rn
        )
        SELECT event_id, user_id, cents,
               CAST(wsum // wnorm AS BIGINT) AS ewma_cents,
               2 * cents > 3 * (wsum // wnorm) AS spike
        FROM agg
    """,
    tags=("events", "window", "anomaly", "scale"),
    doc="Fixed-point EWMA spike detection over per-user purchase streams.",
)
def e09_ewma_spike(spark: SparkSession, sf: str) -> DataFrame:
    """Per-user exponentially-weighted moving average of purchase
    value with a 1.5x spike flag (2*cents > 3*ewma — integer-exact) — the anomaly primitive behind fraud
    and error-burst monitors, in EXACT fixed-point arithmetic (the
    x85 rule applied to smoothing): values become cents, the trailing
    {N}-row window weights 2^0 (oldest) .. 2^(n-1) (newest) as
    BIGINTs, and the average is one integer division — so Spark's
    window-frame evaluation and the oracle's self-join formulation
    agree bit-for-bit, where a float alpha-recursion would drift by
    evaluation order. Spark side: ONE window pass per user (ordered
    collect over a ROWS frame + a zip_with/aggregate fold in
    codegen); the oracle's O(N x window) self-join is the semantic
    spec, not the plan. At 100 TB: one shuffle on user_id, state
    bounded by the frame width."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    frame = w.rowsBetween(-(EWMA_N - 1), 0)
    e = (
        load(spark, sf, "events")
        .filter(F.col("event_type") == "purchase")
        .select(
            "event_id",
            "user_id",
            "ts",
            F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").alias("cents"),
        )
    )
    arr = F.collect_list("cents").over(frame)
    out = (
        e.withColumn("arr", arr)
        .withColumn(
            "ws",
            F.expr(
                "aggregate(zip_with(arr, sequence(0, size(arr) - 1), "
                "(x, i) -> x * shiftleft(CAST(1 AS BIGINT), i)), "
                "CAST(0 AS BIGINT), (acc, v) -> acc + v)"
            ),
        )
        .withColumn(
            "wn", F.expr("shiftleft(CAST(1 AS BIGINT), size(arr)) - 1")
        )
        .select(
            "event_id",
            "user_id",
            "cents",
            # Negative-sum semantics (ADVICE r9 claimed Spark DIV
            # truncates while DuckDB // floors, diverging by 1 on
            # refund-heavy streams): MEASURED FALSE — DuckDB's BIGINT
            # // also truncates toward zero (-8800 // 7 = -1257), so
            # plain DIV is engine-identical for any sign. Pinned by
            # tests/test_event_analytics.py, which runs both engines
            # on a refund-heavy stream with negative weighted sums.
            F.expr("CAST(ws DIV wn AS BIGINT)").alias("ewma_cents"),
        )
    )
    return out.withColumn("spike", 2 * F.col("cents") > 3 * F.col("ewma_cents"))


@register(
    "e10_weekly_retention",
    oracle="""
        WITH e AS (
            SELECT user_id,
                   CAST((CAST(ts AS DATE) - DATE '1970-01-05') // 7
                        AS BIGINT) AS wk
            FROM events
        ),
        u AS (
            SELECT user_id, wk,
                   MIN(wk) OVER (PARTITION BY user_id) AS cohort_wk
            FROM e
        ),
        cell AS (
            SELECT cohort_wk, wk - cohort_wk AS age_weeks,
                   CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_active
            FROM u GROUP BY cohort_wk, wk - cohort_wk
        ),
        size0 AS (
            SELECT cohort_wk, n_active AS cohort_size
            FROM cell WHERE age_weeks = 0
        )
        SELECT c.cohort_wk, c.age_weeks, c.n_active, s.cohort_size,
               ROUND(CAST(c.n_active AS DOUBLE)
                     / CAST(s.cohort_size AS DOUBLE), 6) AS retention
        FROM cell c JOIN size0 s USING (cohort_wk)
    """,
    tags=("events", "cohort", "window"),
    doc="Weekly retention triangle: first-seen-week cohorts x weeks-since, active users and retention rate.",
)
def e10_weekly_retention(spark: SparkSession, sf: str) -> DataFrame:
    """The NORMALIZED retention triangle (x96's engagement twin;
    e02 is the counts-only precursor): users cohorted by FIRST-seen
    week, each (cohort, age) cell counting distinct active users,
    retention = cell actives / cohort size — the rate a dashboard
    actually plots, which e02's raw counts can't give without the
    size-at-age-0 self-join this query adds. Weeks here are
    Monday-anchored epoch-day indexes ((date - 1970-01-05) div 7) —
    pure integer arithmetic on non-negative days, so both engines
    bucket identically with no date_trunc('week') locale/DST
    semantics in the parity path.

    Scale: one shuffle of events on user_id carries the window min
    (first week); the cell aggregate's count-distinct re-shuffles on
    (cohort, age) — weeks^2/2 groups; the size-at-0 join broadcasts a
    weeks-sized frame. One fact pass total."""
    wk = F.expr(
        "CAST(datediff(CAST(ts AS DATE), DATE '1970-01-05') DIV 7 AS BIGINT)"
    )
    u = load(spark, sf, "events").select("user_id", wk.alias("wk"))
    u = u.withColumn(
        "cohort_wk", F.min("wk").over(Window.partitionBy("user_id"))
    )
    cell = (
        u.groupBy("cohort_wk", (F.col("wk") - F.col("cohort_wk")).alias("age_weeks"))
        .agg(F.count_distinct("user_id").alias("n_active"))
        .persist()  # retention needs the age-0 row per cohort (x92 CSE lesson)
    )
    size0 = cell.filter(F.col("age_weeks") == 0).select(
        "cohort_wk", F.col("n_active").alias("cohort_size")
    )
    return cell.join(F.broadcast(size0), "cohort_wk").select(
        "cohort_wk",
        "age_weeks",
        "n_active",
        "cohort_size",
        F.round(
            F.col("n_active").cast("double") / F.col("cohort_size").cast("double"),
            6,
        ).alias("retention"),
    )


E11_WINDOW_S = 7 * 86400  # conversion window: 7 days in seconds


@register(
    "e11_windowed_conversion",
    oracle=f"""
        WITH e AS (
            SELECT user_id, event_type,
                   CAST(ts AS DATE) AS d,
                   CAST(floor(epoch(ts)) AS BIGINT) AS sec,
                   MIN(CASE WHEN event_type = 'purchase'
                            THEN CAST(floor(epoch(ts)) AS BIGINT) END)
                       OVER (PARTITION BY user_id
                             ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
                             RANGE BETWEEN 1 FOLLOWING
                                       AND {E11_WINDOW_S} FOLLOWING)
                     AS next_buy_sec
            FROM events
            WHERE event_type IN ('click', 'purchase')
        )
        SELECT d AS click_day,
               CAST(COUNT(*) AS BIGINT) AS n_clicks,
               CAST(SUM(CASE WHEN next_buy_sec IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_converted,
               ROUND(CAST(SUM(CASE WHEN next_buy_sec IS NOT NULL
                              THEN 1 ELSE 0 END) AS DOUBLE)
                     / COUNT(*), 6) AS conversion_rate
        FROM e WHERE event_type = 'click'
        GROUP BY d
    """,
    tags=("events", "window", "funnel"),
    doc="Windowed conversion: clicks converting to a purchase within 7 days, per click day.",
)
def e11_windowed_conversion(spark: SparkSession, sf: str) -> DataFrame:
    """The CONVERSION-WINDOW funnel — e01 orders steps, this bounds
    them in TIME: a click 'converts' iff the same user purchases
    within 7 days strictly after it. The windowed semantics is the
    hard part of real funnel queries, and it needs no join at all:
    one RANGE frame over epoch seconds per user ([+1 s, +7 d]
    FOLLOWING) carries the next purchase time onto every click — the
    forward as-of bound, j09's backward carry mirrored. Strictly-
    after (1 FOLLOWING) keeps same-instant click/purchase pairs out
    identically in both engines; both sides work at integer-second
    resolution (Spark unix_timestamp truncates, the oracle floors
    epoch()) so sub-second timestamp fractions can't shift window
    membership between engines. Daily report: clicks, conversions,
    rate (exact counts, one division).

    Scale: the event-type IN filter pushes into the scan (most
    traffic never reaches the shuffle); ONE exchange on user_id for
    the frame; the daily aggregate is days-sized."""
    ev = load(spark, sf, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    sec = F.unix_timestamp("ts")
    w = (
        Window.partitionBy("user_id")
        .orderBy(sec)
        .rangeBetween(1, E11_WINDOW_S)
    )
    staged = ev.select(
        "user_id",
        "event_type",
        F.to_date("ts").alias("click_day"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.unix_timestamp("ts"))
        )
        .over(w)
        .alias("next_buy_sec"),
    )
    clicks = staged.filter(F.col("event_type") == "click")
    conv = F.sum(
        F.when(F.col("next_buy_sec").isNotNull(), 1).otherwise(0)
    )
    return clicks.groupBy("click_day").agg(
        F.count(F.lit(1)).alias("n_clicks"),
        conv.cast("bigint").alias("n_converted"),
        F.round(
            conv.cast("double") / F.count(F.lit(1)), 6
        ).alias("conversion_rate"),
    )


@register(
    "e12_time_to_convert",
    oracle=f"""
        WITH e AS (
            SELECT user_id, event_type,
                   CAST(floor(epoch(ts)) AS BIGINT) AS sec,
                   isodow(ts) AS dow,
                   MIN(CASE WHEN event_type = 'purchase'
                            THEN CAST(floor(epoch(ts)) AS BIGINT) END)
                       OVER (PARTITION BY user_id
                             ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
                             RANGE BETWEEN 1 FOLLOWING
                                       AND {E11_WINDOW_S} FOLLOWING)
                     AS next_buy_sec
            FROM events
            WHERE event_type IN ('click', 'purchase')
        ),
        conv AS (
            SELECT dow, next_buy_sec - sec AS delay_sec
            FROM e
            WHERE event_type = 'click' AND next_buy_sec IS NOT NULL
        )
        SELECT CAST(dow AS INT) AS click_dow,
               CAST(COUNT(*) AS BIGINT) AS n_conversions,
               ROUND(quantile_cont(delay_sec, 0.5) / 60.0, 4) AS p50_min,
               ROUND(quantile_cont(delay_sec, 0.9) / 60.0, 4) AS p90_min,
               CAST(MAX(delay_sec) AS BIGINT) AS max_sec
        FROM conv GROUP BY dow
    """,
    tags=("events", "window", "funnel", "statistics"),
    doc="Click-to-purchase conversion latency percentiles per ISO weekday of the click.",
)
def e12_time_to_convert(spark: SparkSession, sf: str) -> DataFrame:
    """HOW LONG does conversion take — e11 counts clicks that convert
    within 7 days; this measures the latency distribution of those
    that do, the number that prices a retargeting window. The same
    forward RANGE frame carries each click's next purchase epoch (one
    user-keyed Exchange, strictly-after semantics identical in both
    engines); converted clicks reduce to exact interpolated p50/p90
    delay minutes per ISO weekday of the click (Spark ``weekday()+1``
    == DuckDB ``isodow`` — the engine-portable day numbering; delays
    are integer seconds so the percentile is bit-equal, the
    a13/x105 pattern).

    Scale: the event-type filter pushes into the scan; one Exchange
    for the per-user frame; the weekday aggregate holds 7 groups of
    integer delays — exact percentiles are per-group sorts over
    conversions only (clicks that never convert are filtered before
    the aggregate)."""
    ev = load(spark, sf, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    sec = F.unix_timestamp("ts")
    w = (
        Window.partitionBy("user_id")
        .orderBy(sec)
        .rangeBetween(1, E11_WINDOW_S)
    )
    staged = ev.select(
        "event_type",
        (F.expr("weekday(ts)") + 1).cast("int").alias("click_dow"),
        sec.alias("sec"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.unix_timestamp("ts"))
        )
        .over(w)
        .alias("next_buy_sec"),
    )
    conv = staged.filter(
        (F.col("event_type") == "click") & F.col("next_buy_sec").isNotNull()
    ).select("click_dow", (F.col("next_buy_sec") - F.col("sec")).alias("delay_sec"))
    return conv.groupBy("click_dow").agg(
        F.count(F.lit(1)).alias("n_conversions"),
        F.round(F.expr("percentile(delay_sec, 0.5)") / 60.0, 4).alias("p50_min"),
        F.round(F.expr("percentile(delay_sec, 0.9)") / 60.0, 4).alias("p90_min"),
        F.max("delay_sec").cast("bigint").alias("max_sec"),
    )


E13_LOOKBACK_S = 86400  # attribution lookback: 1 day in seconds


@register(
    "e13_last_touch_attribution",
    oracle=f"""
        WITH e AS (
            SELECT user_id, event_type,
                   CAST(floor(epoch(ts)) AS BIGINT) AS sec,
                   CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
                   CASE WHEN event_type <> 'purchase'
                        THEN lpad(CAST(CAST(floor(epoch(ts)) AS BIGINT)
                                       AS VARCHAR), 12, '0')
                             || ':' || event_type
                   END AS tagged
            FROM events
        ),
        touched AS (
            SELECT user_id, event_type, sec, cents,
                   MAX(tagged) OVER (PARTITION BY user_id ORDER BY sec
                                     RANGE BETWEEN {E13_LOOKBACK_S} PRECEDING
                                               AND 1 PRECEDING) AS lt
            FROM e
        )
        SELECT COALESCE(substr(lt, 14), 'direct') AS channel,
               CAST(COUNT(*) AS BIGINT) AS n_purchases,
               CAST(SUM(cents) AS BIGINT) AS revenue_cents
        FROM touched
        WHERE event_type = 'purchase'
        GROUP BY COALESCE(substr(lt, 14), 'direct')
    """,
    tags=("events", "window", "attribution"),
    doc="Last-touch revenue attribution: purchases credit the user's most recent prior event type within 1 day.",
)
def e13_last_touch_attribution(spark: SparkSession, sf: str) -> DataFrame:
    """LAST-TOUCH ATTRIBUTION — every purchase credits its revenue to
    the channel (event type) of the user's most recent NON-purchase
    event in the preceding day; purchases with no prior touch are
    'direct'. The marketing-mix report behind budget decisions, and
    a third distinct use of the bounded RANGE frame (e11 looks
    forward for existence, e12 for latency, this looks BACKWARD for
    an argmax). The argmax-over-frame rides one MAX of a sortable
    tag — epoch seconds zero-padded to fixed width + ':' + type — so
    'latest touch' is plain string order, identical bytes in both
    engines (ASCII compare; integer-second epochs per the e11/e12
    hardening); the channel is a substr off the winning tag, never a
    join back. Revenue stays integer cents.

    Scale: ONE user-keyed Exchange for the frame; the channel
    rollup is channels-sized. No self-join, no fact re-scan — the
    oracle runs the identical window because the frame itself IS the
    semantic spec."""
    ev = load(spark, sf, "events")
    sec = F.unix_timestamp("ts")
    tagged = F.when(
        F.col("event_type") != "purchase",
        F.concat(
            F.lpad(sec.cast("string"), 12, "0"),
            F.lit(":"),
            F.col("event_type"),
        ),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(sec)
        .rangeBetween(-E13_LOOKBACK_S, -1)
    )
    touched = ev.select(
        "event_type",
        F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").alias("cents"),
        F.max(tagged).over(w).alias("lt"),
    )
    return (
        touched.filter(F.col("event_type") == "purchase")
        .groupBy(
            F.coalesce(F.substring("lt", 14, 1 << 20), F.lit("direct")).alias(
                "channel"
            )
        )
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.sum("cents").alias("revenue_cents"),
        )
    )


def _e14_oracle() -> str:
    from etl_spark.extensions.sketches import BMP_BITS

    return f"""
        WITH chunks AS (
            SELECT CAST(ts AS DATE) AS day,
                   date_diff('day', DATE '1992-01-01', CAST(ts AS DATE))
                     AS dn,
                   user_id // {BMP_BITS} AS chunk,
                   bit_or(CAST(1 AS BIGINT)
                          << CAST(user_id % {BMP_BITS} AS INT)) AS bits
            FROM events
            GROUP BY 1, 2, 3
        ),
        dau AS (
            SELECT day, CAST(SUM(bit_count(bits)) AS BIGINT) AS dau
            FROM chunks GROUP BY day
        ),
        days AS (SELECT DISTINCT day, dn FROM chunks),
        ids AS (SELECT DISTINCT chunk FROM chunks),
        spine AS (
            SELECT d.day, d.dn, i.chunk, COALESCE(c.bits, 0) AS bits
            FROM days d CROSS JOIN ids i
            LEFT JOIN chunks c ON c.dn = d.dn AND c.chunk = i.chunk
        ),
        wau AS (
            SELECT day,
                   CAST(SUM(bit_count(wbits)) AS BIGINT) AS wau
            FROM (
                SELECT day, bit_or(bits)
                           OVER (PARTITION BY chunk ORDER BY dn
                                 RANGE BETWEEN 6 PRECEDING
                                           AND CURRENT ROW) AS wbits
                FROM spine
            ) GROUP BY day
        )
        SELECT d.day, d.dau, w.wau,
               ROUND(CAST(d.dau AS DOUBLE) / w.wau, 6) AS stickiness
        FROM dau d JOIN wau w ON w.day = d.day
    """


@register(
    "e14_dau_wau_stickiness",
    oracle=_e14_oracle(),
    tags=("events", "sketch", "window", "scale"),
    doc="DAU/WAU stickiness per day: exact bitmap distinct counts at both horizons, one ratio.",
)
def e14_dau_wau_stickiness(spark: SparkSession, sf: str) -> DataFrame:
    """STICKINESS — DAU/WAU, the product-health ratio ('what fraction
    of this week's users came back today') — composed ENTIRELY from
    the mergeable bitmap kernels: one chunk aggregate off the events
    scan feeds BOTH horizons (daily popcounts directly; weekly via
    the calendar RANGE bit_or window over the day x chunk spine, the
    x116 shape), and the KPI is one exact-integer division per day.
    The naive form runs two COUNT(DISTINCT)s per day over
    overlapping 7-day slices — this touches the fact table once.

    Scale: everything after the chunk aggregate is days x
    (domain/63) bitmap rows; the join of the two horizon tables is
    days-sized. Exact at any scale — no estimator error in a KPI
    executives trend-watch."""
    from etl_spark.extensions.sketches import bitmap_chunks, bitmap_count

    ev = load(spark, sf, "events").select(
        F.to_date("ts").alias("day"),
        F.datediff(F.to_date("ts"), F.lit("1992-01-01").cast("date")).alias(
            "dn"
        ),
        "user_id",
    )
    chunks = bitmap_chunks(ev, ["day", "dn"], "user_id").persist()
    dau = bitmap_count(chunks, ["day"]).select(
        "day", F.col("n_users").alias("dau")
    )
    days = chunks.select("day", "dn").distinct()
    ids = chunks.select("chunk").distinct()
    spine = (
        days.crossJoin(F.broadcast(ids))
        .join(chunks.select("dn", "chunk", "bits"), ["dn", "chunk"], "left")
        .select(
            "day",
            "dn",
            "chunk",
            F.coalesce(F.col("bits"), F.lit(0).cast("bigint")).alias("bits"),
        )
    )
    w = Window.partitionBy("chunk").orderBy("dn").rangeBetween(-6, 0)
    wau = (
        spine.withColumn("wbits", F.expr("bit_or(bits)").over(w))
        .groupBy("day")
        .agg(F.sum(F.bit_count("wbits")).cast("bigint").alias("wau"))
    )
    return dau.join(wau, "day").select(
        "day",
        "dau",
        "wau",
        F.round(F.col("dau").cast("double") / F.col("wau"), 6).alias(
            "stickiness"
        ),
    )


@register(
    "e15_session_duration_daily",
    oracle="""
        WITH marked AS (
            SELECT user_id, ts, event_id,
                   CASE WHEN LAG(ts) OVER w IS NULL
                          OR date_diff('second', LAG(ts) OVER w, ts) > 1800
                        THEN 1 ELSE 0 END AS new_session
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
        ),
        sess AS (
            SELECT user_id, ts, event_id,
                   SUM(new_session) OVER (
                       PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                       ROWS UNBOUNDED PRECEDING) AS session_id
            FROM marked
        ),
        per_session AS (
            SELECT user_id, session_id,
                   CAST(MIN(ts) AS DATE) AS day,
                   CAST(floor(epoch(MAX(ts))) AS BIGINT)
                     - CAST(floor(epoch(MIN(ts))) AS BIGINT) AS dur_s,
                   CAST(COUNT(*) AS BIGINT) AS n_events
            FROM sess GROUP BY user_id, session_id
        )
        SELECT day,
               CAST(COUNT(*) AS BIGINT) AS n_sessions,
               CAST(SUM(dur_s) AS BIGINT) AS total_duration_s,
               CAST(100 * SUM(dur_s) // COUNT(*) AS BIGINT)
                 AS avg_duration_s_x100,
               CAST(100 * SUM(n_events) // COUNT(*) AS BIGINT)
                 AS avg_events_x100,
               CAST(1000000 * SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END)
                    // COUNT(*) AS BIGINT) AS bounce_ppm
        FROM per_session GROUP BY day
    """,
    tags=("events", "window", "session"),
    doc="Daily session-quality rollup over gap-based sessions: count, duration, depth, bounce rate.",
)
def e15_session_duration_daily(spark: SparkSession, sf: str) -> DataFrame:
    """DAILY SESSION QUALITY — w04's gap-based sessionization (30-min
    inactivity) composed into the product-health rollup: sessions per
    day (of session start), total/average duration, average depth,
    and bounce rate (single-event sessions). The engagement dashboard
    behind 'is the product getting stickier', and the proof the
    sessionize stage COMPOSES: same lag -> flag -> prefix-sum
    construction as the standalone w04, then two aggregates. All
    emissions are integer-exact (x121 ppm idiom; durations are
    second-truncated epoch differences — the w04 tie rule — so both
    engines subtract identical integers).

    Scale: ONE user-keyed Exchange does everything fact-sized — the
    session window partitions by user_id and the per-session groupBy
    (user_id, session_id) REUSES that partitioning (same leading
    key, no second fact shuffle; the x122 lesson applied to windows);
    the day rollup is days-sized. Bounded session state is the
    streaming twin's job (session_window + watermark,
    streaming/stateful.py)."""
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    gap_sec = F.expr(
        "timestampdiff(SECOND, date_trunc('second', lag(ts) over "
        "(partition by user_id order by ts asc, event_id asc)), "
        "date_trunc('second', ts))"
    )
    marked = load(spark, sf, "events").withColumn(
        "new_session",
        F.when(gap_sec.isNull() | (gap_sec > 1800), 1).otherwise(0),
    )
    sess = marked.withColumn(
        "session_id",
        F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    per_session = sess.groupBy("user_id", "session_id").agg(
        F.to_date(F.min("ts")).alias("day"),
        (
            F.expr("CAST(floor(unix_timestamp(MAX(ts))) AS BIGINT)")
            - F.expr("CAST(floor(unix_timestamp(MIN(ts))) AS BIGINT)")
        ).alias("dur_s"),
        F.count(F.lit(1)).alias("n_events"),
    )
    return per_session.groupBy("day").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum("dur_s").alias("total_duration_s"),
        F.expr("100 * SUM(dur_s) DIV COUNT(*)").alias("avg_duration_s_x100"),
        F.expr("100 * SUM(n_events) DIV COUNT(*)").alias("avg_events_x100"),
        F.expr(
            "CAST(CAST(1000000 AS DECIMAL(38,0))"
            " * SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END)"
            " DIV COUNT(*) AS BIGINT)"
        ).alias("bounce_ppm"),
    )


# e16: SRE error-budget burn. Budget sits just above the fixture's
# median daily error rate (~198k ppm, range 165k-249k), so BOTH
# branches of the breach boolean occur — a never-true flag would be a
# weak hash signal. The trailing window is 7 days (the fixture spans
# 30); the breach compare is multiplicative (1e6*errors > budget*events)
# so no division rounding can flip a boundary day between engines.
E16_BUDGET_PPM = 200_000
E16_WINDOW_DAYS = 7


@register(
    "e16_error_budget_burn",
    oracle=f"""
        WITH d AS (
            SELECT CAST(ts AS DATE) AS day,
                   date_diff('day', DATE '1992-01-01', CAST(ts AS DATE))
                     AS dn,
                   CAST(COUNT(*) AS BIGINT) AS n_events,
                   CAST(COUNT(*) FILTER (event_type = 'error') AS BIGINT)
                     AS n_errors
            FROM events GROUP BY 1, 2
        ),
        w AS (
            SELECT day, n_events, n_errors,
                   CAST(1000000 * n_errors // n_events AS BIGINT)
                     AS err_ppm,
                   SUM(n_events) OVER (
                       ORDER BY dn RANGE BETWEEN {E16_WINDOW_DAYS - 1}
                       PRECEDING AND CURRENT ROW) AS w_events,
                   SUM(n_errors) OVER (
                       ORDER BY dn RANGE BETWEEN {E16_WINDOW_DAYS - 1}
                       PRECEDING AND CURRENT ROW) AS w_errors
            FROM d
        )
        SELECT day, n_events, n_errors, err_ppm,
               CAST(1000000 * w_errors // w_events AS BIGINT)
                 AS window_ppm,
               1000000 * w_errors > {E16_BUDGET_PPM} * w_events AS breach
        FROM w
    """,
    tags=("events", "window", "agg"),
    doc="SRE error-budget burn: daily error ppm, trailing-7-day window ppm, and a breach flag against a 200k-ppm budget.",
)
def e16_error_budget_burn(spark: SparkSession, sf: str) -> DataFrame:
    """ERROR-BUDGET BURN — the SRE steering table e05's z-score spike
    detector doesn't give you: per day, the error rate (ppm), the
    TRAILING {E16_WINDOW_DAYS}-day window rate (the 'budget burn'
    SLO dashboards alert on — a single bad hour can clear a z-score
    by the next day but still eat the week's budget), and a breach
    flag against E16_BUDGET_PPM. Integer-exact end-to-end: counts,
    integer-ppm rates (x121 idiom), and a MULTIPLICATIVE breach
    compare (1e6*errors > budget*events) so the boundary day can
    never round differently across engines. The calendar RANGE frame
    over day numbers is x116's idiom — gap days (none on the fixture)
    would correctly widen the window rather than silently counting
    rows.

    Scale: one fact pass to a days-sized aggregate (map-side partial
    counts); both windows run over ~#days rows. The 1e6 multiplies
    (ppm rates AND the breach compare) run in DECIMAL(38,0) so Spark
    tracks the oracle's HUGEINT past ~9e12 window errors instead of
    wrapping (ADVICE r13); DIV returns BIGINT and decimal>decimal
    returns BOOLEAN, so the declared schema is unchanged."""
    d = (
        load(spark, sf, "events")
        .groupBy(
            F.to_date("ts").alias("day"),
            F.datediff(
                F.to_date("ts"), F.lit("1992-01-01").cast("date")
            ).alias("dn"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(
                F.when(F.col("event_type") == "error", 1).otherwise(0)
            ).cast("bigint").alias("n_errors"),
        )
    )
    win = Window.orderBy("dn").rangeBetween(-(E16_WINDOW_DAYS - 1), 0)
    w = d.select(
        "day",
        "n_events",
        "n_errors",
        F.expr(
            "CAST(CAST(1000000 AS DECIMAL(38,0)) * n_errors DIV n_events"
            " AS BIGINT)"
        ).alias("err_ppm"),
        F.sum("n_events").over(win).alias("w_events"),
        F.sum("n_errors").over(win).alias("w_errors"),
    )
    return w.select(
        "day",
        "n_events",
        "n_errors",
        "err_ppm",
        F.expr(
            "CAST(CAST(1000000 AS DECIMAL(38,0)) * w_errors DIV w_events"
            " AS BIGINT)"
        ).alias("window_ppm"),
        (
            F.lit(1000000).cast("decimal(38,0)") * F.col("w_errors")
            > F.lit(E16_BUDGET_PPM).cast("decimal(38,0)")
            * F.col("w_events")
        ).alias("breach"),
    )

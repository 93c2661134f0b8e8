"""Registered demo/verification query for the skew toolbox.

The implementation lives in `etl_spark.plans.skew` (salted_join with
full and hot-keys-only replication, plus the key_skew_profile
diagnostic); this module wires it into the oracle-checked registry so
the salted plan shape is driver-verified every round, not just
unit-tested.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_spark.plans.skew import salted_join
from etl_spark.registry import register
from etl_spark.tables import load

N_SALTS = 16


@register(
    "j10_salted_skew_join",
    oracle="""
        SELECT e.event_type,
               CASE WHEN e.event_type IN ('signup', 'purchase') THEN 3
                    WHEN e.event_type = 'click' THEN 2 ELSE 1 END
                 AS conversion_weight,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE)
                 AS sum_value
        FROM events e
        GROUP BY 1, 2
    """,
    tags=("join", "skew"),
)
def j10_salted_skew_join(spark: SparkSession, sf: str) -> DataFrame:
    """Skew-salted dimension join, end to end: events (5 event types
    — every shuffle key is hot by construction) joined to a per-type
    weight dimension through ``plans.skew.salted_join``, then
    aggregated. The result is identical to the plain join (the oracle
    inlines the dimension as a CASE); what the salt changes is the
    SHUFFLE — the join exchange hashes on (event_type, salt), so one
    event type spreads over 16 partitions instead of landing on a
    single task.

    At 100 TB this is the recipe for a hot-key join the optimizer
    can't broadcast away; here the 5-row dim would of course
    broadcast, so the demo adds a merge hint to force the shuffle
    path the salt exists to fix — the plan pin locks the salted SMJ
    shape."""
    ev = load(spark, sf, "events").select("event_type", "value")
    dim = (
        ev.select("event_type")
        .distinct()
        .withColumn(
            "conversion_weight",
            F.when(F.col("event_type").isin("signup", "purchase"), 3)
            .when(F.col("event_type") == "click", 2)
            .otherwise(1),
        )
        .hint("merge")
    )
    joined = salted_join(ev, dim, ["event_type"], n_salts=N_SALTS)
    return joined.groupBy("event_type", "conversion_weight").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_value"),
    )


@register(
    "j11_salted_hotkeys_join",
    oracle="""
        SELECT e.event_type,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE)
                 AS sum_value
        FROM events e
        GROUP BY 1
    """,
    tags=("join", "skew"),
)
def j11_salted_hotkeys_join(spark: SparkSession, sf: str) -> DataFrame:
    """The hot-keys-ONLY salted join — the form a 100 TB pipeline
    actually runs (j10 replicates the whole dimension n_salts×;
    here replication is bounded to the declared hot fraction, cold
    keys join un-replicated at salt 0). Hot keys are a literal list
    ('click', 'view' — the high-volume browse events), the way a
    production job pins them from a prior key_skew_profile run
    rather than re-profiling inline. salt_cols=['event_id'] follows
    the salting contract: event rows of one type can collide in
    every payload column, but the unique event_id guarantees the
    hash spreads (plans/skew.py contract note). Result is identical
    to the plain join, which the oracle states directly — the
    weight dim is keys-only here, so it projects away entirely."""
    ev = load(spark, sf, "events").select("event_type", "value", "event_id")
    dim = (
        ev.select("event_type").distinct().hint("merge")
    )
    hot = spark.createDataFrame(
        [("click",), ("view",)], ["event_type"]
    )
    joined = salted_join(
        ev,
        dim,
        ["event_type"],
        n_salts=N_SALTS,
        hot_keys=hot,
        salt_cols=["event_id"],
    )
    return joined.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_value"),
    )

"""Explicit skew mitigation: salted joins for hot keys.

AQE's skew-join splitting (on in session.py) repairs a skewed
SortMergeJoin AFTER the shuffle files exist by splitting oversized
partitions across tasks. Salting attacks the same problem one step
earlier — the hot key never concentrates in one shuffle partition in
the first place — and is the form that also works when the engine
can't re-plan (static plans, non-AQE sinks, streaming joins) or when
one key is so dominant that even split shuffle files leave a
many-gigabyte single-key sort.

The construction (the classic two-sided salt):

- LEFT (big, skewed) side: tag each row with a DETERMINISTIC salt in
  ``[0, salt)`` — a hash of the whole row, never ``rand()``, so task
  retries and speculative attempts reproduce the same assignment
  (a nondeterministic salt can duplicate or drop rows when a stage
  retries after partial shuffle-file loss).
- RIGHT (small) side: replicate every row ``salt`` times, once per
  salt value.
- Join on ``keys + [salt]``: each hot key's rows now spread over
  ``salt`` shuffle partitions; the result is EXACTLY the plain join
  (each left row meets each matching right row exactly once — on the
  single replica sharing its salt).

Cost model: the right side grows ``salt``× — use for big⋈small where
the small side is still too large (or the join type unsuitable) to
broadcast, with ``salt`` ≈ the partition-count headroom you want per
hot key. Broadcast remains strictly better whenever it fits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_spark.registry import register
from etl_spark.tables import load

SALT = 16


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    salt: int = SALT,
    how: str = "inner",
    force_shuffle: bool = False,
) -> DataFrame:
    """Join ``left`` (big/skewed) to ``right`` (small) on ``on`` with
    a ``salt``-way key split. Row-identical to ``left.join(right, on,
    how)``. ``force_shuffle=True`` adds a merge hint on the right so
    the salted exchange is actually exercised (used by the demo query
    and tests; without it Spark rightly broadcasts a tiny dim and the
    salt is moot)."""
    lsalt = F.pmod(
        F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(salt)
    ).cast("int")
    l_ = left.withColumn("_salt", lsalt)
    r_ = right.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    if force_shuffle:
        r_ = r_.hint("merge")
    return l_.join(r_, [*on, "_salt"], how).drop("_salt")


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
    weight dimension through ``salted_join``, then aggregated. The
    result is identical to the plain join (the oracle inlines the
    dimension as a CASE); what the salt changes is the SHUFFLE — the
    join exchange hashes on (event_type, salt), so one event type
    spreads over 16 partitions instead of landing on a single task.

    At 100 TB this is the recipe for a hot-key join the optimizer
    can't broadcast away; here the 5-row dim would of course
    broadcast, so the demo forces the shuffle path it exists to fix
    (force_shuffle) — the plan pin locks the salted SMJ shape."""
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
    )
    joined = salted_join(ev, dim, ["event_type"], force_shuffle=True)
    return joined.groupBy("event_type", "conversion_weight").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_value"),
    )

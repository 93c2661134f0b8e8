"""Skew mitigation: salted joins and key-skew profiling.

At 100 TB a single hot key (the null customer, the default shop, the
viral document) can put one shuffle partition hours behind the rest.
Spark's first line of defense is AQE skew-join splitting
(`spark.sql.adaptive.skewJoin.enabled`, on by default in
etl_spark.session); it splits oversized partitions of a sort-merge
join at runtime. Salting is the explicit fallback for the cases AQE
cannot fix — e.g. a hot key inside a broadcast-ineligible join where
one side must be replicated, or deterministic plans where runtime
re-planning is disabled.

`salted_join` implements the classic scheme: the skewed (big) side
gets a deterministic row-hash salt in [0, n_salts); the other side is
replicated once per salt value via `explode`. The join key becomes
(key, salt), so the hot key's rows spread over n_salts shuffle
partitions. Cost: the replicated side is written n_salts× into the
shuffle — use it when that side is small-ish but above the broadcast
threshold, or restrict replication to the hot keys only (pass
`hot_keys`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def key_skew_profile(df: DataFrame, keys: list[str], top_n: int = 20) -> DataFrame:
    """Per-key row counts plus their share of the table — the
    diagnostic that decides between broadcast, AQE, and salting.
    Returns the top_n heaviest keys with columns keys + (n_rows,
    share)."""
    total = df.count()
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .withColumn("share", F.round(F.col("n_rows") / F.lit(total), 6))
        .orderBy(F.desc("n_rows"))
        .limit(top_n)
    )


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: list[str],
    n_salts: int = 8,
    how: str = "inner",
    hot_keys: DataFrame | None = None,
    salt_cols: list[str] | None = None,
) -> DataFrame:
    """Join ``skewed`` (big, hot-keyed side) with ``other`` on equi
    keys ``on``, spreading each key over ``n_salts`` shuffle
    partitions. Result equals ``skewed.join(other, on, how)`` for
    ``how`` in ('inner', 'left') — the salt columns never escape.

    If ``hot_keys`` (a DataFrame with the ``on`` columns) is given,
    only rows matching those keys are salted/replicated; the rest
    join un-replicated — this bounds the replication cost to the hot
    fraction. Implementation note: both variants stay a single
    equi-join on (key, salt); the hot-key split is expressed as a
    salt of 0 for cold rows so no union/second join is needed (the
    replicated side replicates only hot rows beyond salt 0).

    CONTRACT — the salt only spreads rows that DIFFER somewhere in
    ``salt_cols`` (default: all of ``skewed``'s columns). The hash is
    deterministic, so byte-identical rows all get the same salt and
    collapse back onto one shuffle partition — exactly the workload
    (one repeated null-key/default row) salting usually targets. If
    the hot key's rows can be literally identical, pass ``salt_cols``
    naming a unique/high-cardinality column (event_id, offset, a
    pre-assigned row id); ``tests/test_scale.py`` demonstrates both
    the degeneration and the fix.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    salts = F.array([F.lit(i) for i in range(n_salts)])
    # DETERMINISTIC salt — a hash of the input row, never rand(): a
    # rand-based salt depends on row order within the partition, so a
    # stage retry that re-reads shuffled input in a different order
    # can re-salt rows and duplicate/drop matches mid-recovery.
    # (monotonically_increasing_id is out for the same reason — its
    # values shift under repartitioning/retries.)
    hash_cols = salt_cols if salt_cols is not None else skewed.columns
    missing = [c for c in hash_cols if c not in skewed.columns]
    if missing:
        raise ValueError(f"salt_cols not in skewed side: {missing}")
    row_salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in hash_cols]), F.lit(n_salts)
    ).cast("int")

    if hot_keys is None:
        big = skewed.withColumn(_SALT, row_salt)
        small = other.withColumn(_SALT, F.explode(salts))
    else:
        hk = hot_keys.select(*on).distinct().withColumn("__hot", F.lit(True))
        big = (
            skewed.join(F.broadcast(hk), on=on, how="left")
            .withColumn(
                _SALT,
                F.when(F.col("__hot").isNotNull(), row_salt).otherwise(F.lit(0)),
            )
            .drop("__hot")
        )
        small = (
            other.join(F.broadcast(hk), on=on, how="left")
            .withColumn(
                _SALT,
                F.explode(
                    F.when(F.col("__hot").isNotNull(), salts).otherwise(
                        F.array(F.lit(0))
                    )
                ),
            )
            .drop("__hot")
        )
    return big.join(small, on=[*on, _SALT], how=how).drop(_SALT)

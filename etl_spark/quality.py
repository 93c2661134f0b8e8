"""Data-quality constraints and snapshot diffing.

The reference's quality story is row-count threshold alerts
(web_scheduler.py:3354-3366 — "did the monitoring query return too
few/many rows"). A training-data pipeline needs ROW-LEVEL contracts:
null-rate, uniqueness, ranges, regex shape, referential integrity —
evaluated over the full table without N per-rule scans.

- `check_constraints`: ALL boolean rules evaluate in ONE aggregate
  pass (sum-of-violations per rule — a single scan + 1-row result,
  regardless of rule count).
- `duplicate_keys`: key tuples appearing more than once (the
  uniqueness violation detail).
- `fk_violations`: child keys absent from the parent (LEFT ANTI join;
  broadcast when the parent's key set is dimension-sized).
- `snapshot_diff`: CDC between two snapshots of a keyed table —
  added / removed / changed rows with the list of changed columns,
  from one full-outer join on the key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def check_constraints(df: DataFrame, rules: dict[str, str]) -> dict[str, int]:
    """Evaluate named boolean SQL ``rules`` (row-level contracts,
    e.g. {"qty_positive": "l_quantity > 0"}) in ONE aggregation pass.
    Returns {rule_name: violation_count}. A NULL rule result counts
    as a violation (the contract is not provably met)."""
    if not rules:
        return {}
    aggs = [
        F.sum(
            F.when(F.coalesce(F.expr(cond).cast("boolean"), F.lit(False)), 0).otherwise(1)
        ).alias(name)
        for name, cond in rules.items()
    ]
    row = df.agg(*aggs).collect()[0]
    return {name: int(row[name] or 0) for name in rules}


def duplicate_keys(df: DataFrame, keys: list[str]) -> DataFrame:
    """Key tuples with multiplicity > 1 → (keys..., n_rows). One
    shuffle on the key columns."""
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .filter(F.col("n_rows") > 1)
    )


def fk_violations(
    child: DataFrame, parent: DataFrame, on: dict[str, str]
) -> DataFrame:
    """Child rows whose foreign key has no parent — LEFT ANTI join on
    the (child_col → parent_col) mapping. Null FKs are not violations
    (SQL FK semantics). Broadcast the parent's distinct key set when
    it is dimension-sized."""
    parent_keys = parent.select(
        *[F.col(p).alias(c) for c, p in on.items()]
    ).distinct()
    non_null = child
    for c in on:
        non_null = non_null.filter(F.col(c).isNotNull())
    return non_null.join(F.broadcast(parent_keys), on=list(on), how="left_anti")


def snapshot_diff(
    old: DataFrame, new: DataFrame, keys: list[str]
) -> DataFrame:
    """CDC between two keyed snapshots: one row per differing key with
    ``change`` ∈ {'added','removed','changed'} and ``changed_cols``
    (non-key columns whose values differ, NULL-safe). ONE full-outer
    join on the keys — never a per-column pass. At 100 TB both sides
    shuffle once on the key; with both snapshots bucketed on the key
    the exchange disappears entirely."""
    value_cols = [c for c in old.columns if c not in keys]
    o = old.select(
        *[F.col(k).alias(f"__k_{k}") for k in keys],
        *[F.col(c).alias(f"__o_{c}") for c in value_cols],
        F.lit(True).alias("__in_old"),
    )
    n = new.select(
        *[F.col(k).alias(f"__k_{k}") for k in keys],
        *[F.col(c).alias(f"__n_{c}") for c in value_cols],
        F.lit(True).alias("__in_new"),
    )
    joined = o.join(n, on=[f"__k_{k}" for k in keys], how="full_outer")
    changed_cols = F.array_compact(
        F.array(
            *[
                F.when(
                    ~F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}")), F.lit(c)
                )
                for c in value_cols
            ]
        )
    )
    change = (
        F.when(F.col("__in_old").isNull(), F.lit("added"))
        .when(F.col("__in_new").isNull(), F.lit("removed"))
        .when(F.size(changed_cols) > 0, F.lit("changed"))
    )
    return (
        joined.withColumn("change", change)
        .filter(F.col("change").isNotNull())
        .select(
            *[F.col(f"__k_{k}").alias(k) for k in keys],
            "change",
            F.when(F.col("change") == "changed", changed_cols)
            .otherwise(F.array().cast("array<string>"))
            .alias("changed_cols"),
        )
    )


def split_by_rules(
    df: DataFrame, rules: dict[str, str]
) -> tuple[DataFrame, DataFrame]:
    """Row-level validation SPLIT: returns ``(valid, rejected)`` where
    a row is valid iff every rule holds (NULL = violation, matching
    ``check_constraints``); rejected rows carry a ``_violations``
    array naming every failed rule — the triage column a dead-letter
    consumer needs, computed in the same single pass as the split
    (no per-rule rescans).

    CONTRACT: rules must be TOTAL expressions. ANSI mode is on
    session-wide, so a rule that can THROW on a malformed row
    (division, strict casts, array indexing) aborts the whole batch
    instead of routing that row to the DLQ — write such rules with
    the try_* forms (``try_divide(num, den) < 10``, ``try_cast(s AS
    INT) IS NOT NULL``), which yield NULL on the bad row and therefore
    count as violations here."""
    if not rules:
        return df, df.limit(0).withColumn(
            "_violations", F.array().cast("array<string>")
        )
    viol = F.array_compact(
        F.array(
            *[
                F.when(
                    ~F.coalesce(F.expr(cond).cast("boolean"), F.lit(False)),
                    F.lit(name),
                )
                for name, cond in rules.items()
            ]
        )
    )
    tagged = df.withColumn("_violations", viol)
    valid = tagged.filter(F.size("_violations") == 0).drop("_violations")
    rejected = tagged.filter(F.size("_violations") > 0)
    return valid, rejected

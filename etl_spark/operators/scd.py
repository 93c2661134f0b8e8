"""Slowly-changing dimension (SCD Type 2) maintenance — versioned
dimension rows with validity intervals, the Kimball pattern every
warehouse ETL needs and the reference approximates by overwriting
dimension rows in place (web_scheduler.py's upload path keeps only
the latest Excel state, losing history).

A type-2 dimension carries, per business key, a CHAIN of versions:
(key, attrs..., valid_from, valid_to, is_current) where at most one
version per key is open (valid_to NULL / is_current true) and
intervals never overlap — both INVARIANTS are pinned in tests.
Facts join the version whose interval contains the fact timestamp —
the as-of/range joins (operators/advanced.py) consume this shape.

Merge semantics (``scd2_merge``): a batch is a set of (key, attrs,
ts) observations; the LATEST observation per key wins within a batch
(the Delta-MERGE SCD2 convention — intra-batch history belongs in
separate batches, which is how schedulers and foreachBatch deliver
it). Per key:

- unseen key              -> a new open version at ts;
- attrs == current attrs  -> no-op;
- exact version exists
  (key, valid_from==ts, same attrs) -> no-op (the REPLAY of an
  already-applied batch — immediate at-least-once re-delivery is
  safe; cross-batch exactly-once belongs to the commit layer, e.g.
  txlog append_once, like every other sink in this repo);
- otherwise               -> current version closes at ts, a new
                             open version starts at ts.

CONTRACT: batches arrive per-key in time order (ts >= the key's
current valid_from). Out-of-order history rewrites are a different
operation (interval splitting) — reject them upstream.

Scale shape: one shuffle of the update batch on the key; the closed
history is UNIONED through untouched (never read beyond the schema,
never rewritten) — only the current slice joins the batch. Commit
the result atomically with truncate_load or a txlog overwrite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

SCD_COLS = ("valid_from", "valid_to", "is_current")


def scd2_init(updates: DataFrame, keys: list[str], ts_col: str) -> DataFrame:
    """Open a fresh dimension from the first observation batch."""
    dim = updates.select(
        *[F.col(c) for c in updates.columns if c != ts_col],
        F.col(ts_col).alias("valid_from"),
        F.col(ts_col).alias("valid_to"),
        F.lit(True).alias("is_current"),
    ).limit(0)
    return scd2_merge(dim, updates, keys, ts_col)


def scd2_merge(
    dim: DataFrame, updates: DataFrame, keys: list[str], ts_col: str
) -> DataFrame:
    """Apply an observation batch to a type-2 dimension; returns the
    new dimension (pure). Semantics in the module docstring."""
    attrs = [c for c in updates.columns if c not in keys and c != ts_col]
    cur = dim.filter(F.col("is_current"))
    hist = dim.filter(~F.col("is_current"))

    # latest-per-key election MUST be deterministic: two observations
    # of one key at the SAME ts would otherwise elect by shuffle order,
    # and a replay could elect the other one — slipping past the
    # exact-version guard and double-versioning. The attr columns are
    # the total tiebreak (desc puts nulls LAST in Spark: any
    # fixed order works, it only has to be THE SAME order every time).
    w = Window.partitionBy(*keys).orderBy(
        F.col(ts_col).desc(), *[F.col(c).desc() for c in attrs]
    )
    u = updates.withColumn("_rn", F.row_number().over(w)).filter("_rn = 1").drop("_rn")

    cur_keyed = cur.select(
        *[F.col(k).alias(f"_k_{k}") for k in keys],
        *[F.col(c).alias(f"_c_{c}") for c in attrs],
        F.lit(True).alias("_has_cur"),
    )
    cond = None
    for k in keys:
        c = u[k] == cur_keyed[f"_k_{k}"]
        cond = c if cond is None else (cond & c)
    joined = u.join(cur_keyed, cond, "left")
    same_as_cur = F.lit(True)
    for c in attrs:
        same_as_cur = same_as_cur & F.col(f"_c_{c}").eqNullSafe(F.col(c))
    no_op = F.coalesce(F.col("_has_cur"), F.lit(False)) & same_as_cur
    effective = joined.filter(~no_op).select(*keys, *attrs, ts_col)

    # replay guard: a version identical to the incoming one (same key,
    # same valid_from, same attrs) means this observation already
    # applied — drop it before anything closes or opens
    seen = dim.select(
        *[F.col(k).alias(f"_s_{k}") for k in keys],
        *[F.col(c).alias(f"_s_{c}") for c in attrs],
        F.col("valid_from").alias("_s_from"),
    )
    scond = F.col(ts_col) == F.col("_s_from")
    for k in keys:
        scond = scond & (F.col(k) == F.col(f"_s_{k}"))
    for c in attrs:
        scond = scond & F.col(c).eqNullSafe(F.col(f"_s_{c}"))
    # NOT persisted: `effective` is referenced by both new_rows and
    # closer, but with the deterministic election above a double
    # evaluation is byte-identical, and a persist here would leak a
    # cached batch per micro-batch under run_scd2_sink (review
    # finding) — the sink persists the RESULT it writes instead
    effective = effective.join(seen, scond, "left_anti")

    new_rows = effective.select(
        *keys,
        *attrs,
        F.col(ts_col).alias("valid_from"),
        F.lit(None).cast(updates.schema[ts_col].dataType).alias("valid_to"),
        F.lit(True).alias("is_current"),
    )

    closer = effective.select(
        *[F.col(k).alias(f"_k_{k}") for k in keys], F.col(ts_col).alias("_close_ts")
    )
    ccond = None
    for k in keys:
        c = cur[k] == closer[f"_k_{k}"]
        ccond = c if ccond is None else (ccond & c)
    kept_cur = cur.join(F.broadcast(closer), ccond, "left").select(
        *[cur[c] for c in dim.columns if c not in SCD_COLS],
        "valid_from",
        F.coalesce(F.col("_close_ts"), F.col("valid_to")).alias("valid_to"),
        F.col("_close_ts").isNull().alias("is_current"),
    )
    return hist.unionByName(kept_cur).unionByName(new_rows.select(*dim.columns))


def scd2_asof(dim: DataFrame, ts) -> DataFrame:
    """The dimension as it stood at ``ts``: the version whose
    [valid_from, valid_to) interval contains it."""
    t = F.lit(ts)
    return dim.filter(
        (F.col("valid_from") <= t)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > t))
    ).drop(*SCD_COLS)


def _register_x91() -> None:
    from pyspark.sql import SparkSession

    from etl_spark.registry import register
    from etl_spark.tables import load

    @register(
        "x91_priority_history",
        oracle="""
            WITH obs AS (
                SELECT o_custkey AS cust, o_orderpriority AS prio,
                       o_orderdate AS ts, o_orderkey AS ok,
                       lag(o_orderpriority) OVER w AS prev
                FROM orders
                WINDOW w AS (PARTITION BY o_custkey
                             ORDER BY o_orderdate, o_orderkey)
            ),
            changes AS (
                SELECT cust, prio, ts,
                       lead(ts) OVER (PARTITION BY cust ORDER BY ts, ok)
                         AS valid_to
                FROM obs WHERE prev IS NULL OR prev <> prio
            )
            SELECT cust, prio, ts AS valid_from, valid_to,
                   valid_to IS NULL AS is_current
            FROM changes
        """,
        tags=("scd", "window", "history"),
        doc="Per-customer order-priority SCD2 chain derived in one window pass.",
    )
    def x91_priority_history(spark: SparkSession, sf: str) -> DataFrame:
        """Each customer's order-priority HISTORY as a type-2 chain —
        the gaps-and-islands state-change derivation: consecutive
        same-priority orders collapse, each state change opens a
        version valid until the next change (the batch-mode twin of
        ``scd2_merge``'s incremental maintenance, and the shape
        ``scd2_asof``/as-of joins consume). One window pass per rule:
        lag() finds the change points, lead() closes the intervals —
        two shuffles on the customer key and nothing else, at any
        scale. Change points are deterministic via the (date,
        orderkey) tiebreak, so both engines pick identical chains."""
        # ONE window spec for both passes — the change scan and the
        # interval close must share the (ts, ok) tiebreak, and a
        # single object cannot drift (review finding)
        w = Window.partitionBy("cust").orderBy("ts", "ok")
        obs = load(spark, sf, "orders").select(
            F.col("o_custkey").alias("cust"),
            F.col("o_orderpriority").alias("prio"),
            F.col("o_orderdate").alias("ts"),
            F.col("o_orderkey").alias("ok"),
        )
        changes = (
            obs.withColumn("prev", F.lag("prio").over(w))
            .filter(F.col("prev").isNull() | (F.col("prev") != F.col("prio")))
            .withColumn("valid_to", F.lead("ts").over(w))
        )
        return changes.select(
            "cust",
            "prio",
            F.col("ts").alias("valid_from"),
            "valid_to",
            F.col("valid_to").isNull().alias("is_current"),
        )


_register_x91()

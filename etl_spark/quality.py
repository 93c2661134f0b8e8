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


def profile(
    df: DataFrame,
    include: list[str] | None = None,
    rules: dict[str, str] | None = None,
) -> DataFrame:
    """Deequ-style column profile + constraint verdicts from ONE
    aggregation pass over ``df`` (Schelter et al., VLDB 2018 — the
    "compute all metrics in a single scan" design; the reference's
    analog is the row-count threshold check, web_scheduler.py:3354).

    Output is long-format ``(item, metric, value DOUBLE)``:

    - every column: ``completeness`` (non-null fraction, rounded 6)
      and ``distinct`` (exact count — the audit form; at 100 TB the
      streaming/approx sibling is the x76 KMV sketch);
    - numeric columns: ``min`` / ``max`` / ``mean`` — the mean sums
      DECIMAL(38,9) casts so the total is exact and engine-portable
      (float sums are addition-order-dependent; 9 fractional digits
      covers currency/measure columns), divided as DOUBLE by the
      NON-NULL count (SQL AVG semantics) at the end;
    - timestamp columns: ``min`` / ``max`` as epoch MICROSECONDS
      (integer-exact in both engines; see inline note);
    - every ``rules`` entry (name -> boolean SQL over a row):
      ``violations`` — rows where the rule is false or NULL
      (``check_constraints`` semantics), counted in the SAME pass;
    - ``__table__ / row_count``.

    One wide agg + one explode: no per-column or per-rule rescans.
    """
    numeric = {"int", "bigint", "smallint", "tinyint", "float", "double"}
    fields = [
        f for f in df.schema.fields if include is None or f.name in include
    ]
    aggs = [F.count(F.lit(1)).alias("__n")]
    for f in fields:
        c = f.name
        t = f.dataType.simpleString()
        aggs.append(F.count(c).alias(f"{c}__nn"))
        aggs.append(F.countDistinct(c).alias(f"{c}__nd"))
        if t in numeric or t.startswith("decimal"):
            aggs.append(F.min(c).cast("double").alias(f"{c}__min"))
            aggs.append(F.max(c).cast("double").alias(f"{c}__max"))
            aggs.append(F.sum(F.col(c).cast("decimal(38,9)")).alias(f"{c}__sum"))
        elif t in ("timestamp", "timestamp_ntz"):
            # epoch MICROSECONDS (bigint, exactly representable as
            # double below 2^53): DuckDB twin is epoch_us(). A
            # seconds-as-double form would divide by 1e6 with
            # engine-specific op order — micros are integer-exact.
            # NTZ casts through the session tz (pinned UTC).
            aggs.append(F.unix_micros(F.min(c).cast("timestamp")).alias(f"{c}__min"))
            aggs.append(F.unix_micros(F.max(c).cast("timestamp")).alias(f"{c}__max"))
    for name, cond in (rules or {}).items():
        aggs.append(
            F.sum(
                F.when(
                    F.coalesce(F.expr(cond).cast("boolean"), F.lit(False)), 0
                ).otherwise(1)
            ).alias(f"__rule__{name}")
        )
    row = df.agg(*aggs)

    def entry(item: str, metric: str, value) -> F.Column:
        return F.struct(
            F.lit(item).alias("item"),
            F.lit(metric).alias("metric"),
            value.cast("double").alias("value"),
        )

    entries = [entry("__table__", "row_count", F.col("__n"))]
    for f in fields:
        c = f.name
        t = f.dataType.simpleString()
        entries.append(
            entry(c, "completeness", F.round(F.col(f"{c}__nn") / F.col("__n"), 6))
        )
        entries.append(entry(c, "distinct", F.col(f"{c}__nd")))
        if t in numeric or t.startswith("decimal"):
            entries.append(entry(c, "min", F.col(f"{c}__min")))
            entries.append(entry(c, "max", F.col(f"{c}__max")))
            entries.append(
                entry(
                    c,
                    "mean",
                    F.round(
                        F.col(f"{c}__sum").cast("double") / F.col(f"{c}__nn"), 6
                    ),
                )
            )
        elif t in ("timestamp", "timestamp_ntz"):
            entries.append(entry(c, "min", F.col(f"{c}__min")))
            entries.append(entry(c, "max", F.col(f"{c}__max")))
    for name in rules or {}:
        entries.append(entry(name, "violations", F.col(f"__rule__{name}")))
    return row.select(F.explode(F.array(*entries)).alias("e")).select(
        "e.item", "e.metric", "e.value"
    )


def _branch(item: str, metric: str, sql: str) -> str:
    return f"UNION ALL SELECT '{item}', '{metric}', {sql} FROM a\n"


def _col_branches(col: str, p: str, kind: str) -> str:
    out = _branch(col, "completeness", f"ROUND(CAST({p}_nn AS DOUBLE) / CAST(n AS DOUBLE), 6)")
    out += _branch(col, "distinct", f"CAST({p}_nd AS DOUBLE)")
    if kind == "num":
        out += _branch(col, "min", f"{p}_min")
        out += _branch(col, "max", f"{p}_max")
        out += _branch(col, "mean", f"ROUND(CAST({p}_sum AS DOUBLE) / CAST({p}_nn AS DOUBLE), 6)")
    elif kind == "ts":
        out += _branch(col, "min", f"CAST({p}_min AS DOUBLE)")
        out += _branch(col, "max", f"CAST({p}_max AS DOUBLE)")
    return out


_X87_ORACLE = f"""
        WITH a AS (
            SELECT COUNT(*) AS n,
                COUNT(o_orderkey) AS ok_nn, COUNT(DISTINCT o_orderkey) AS ok_nd,
                CAST(MIN(o_orderkey) AS DOUBLE) AS ok_min,
                CAST(MAX(o_orderkey) AS DOUBLE) AS ok_max,
                SUM(CAST(o_orderkey AS DECIMAL(38,9))) AS ok_sum,
                COUNT(o_custkey) AS ck_nn, COUNT(DISTINCT o_custkey) AS ck_nd,
                CAST(MIN(o_custkey) AS DOUBLE) AS ck_min,
                CAST(MAX(o_custkey) AS DOUBLE) AS ck_max,
                SUM(CAST(o_custkey AS DECIMAL(38,9))) AS ck_sum,
                COUNT(o_orderstatus) AS st_nn, COUNT(DISTINCT o_orderstatus) AS st_nd,
                COUNT(o_totalprice) AS tp_nn, COUNT(DISTINCT o_totalprice) AS tp_nd,
                CAST(MIN(o_totalprice) AS DOUBLE) AS tp_min,
                CAST(MAX(o_totalprice) AS DOUBLE) AS tp_max,
                SUM(CAST(o_totalprice AS DECIMAL(38,9))) AS tp_sum,
                COUNT(o_orderdate) AS od_nn, COUNT(DISTINCT o_orderdate) AS od_nd,
                epoch_us(MIN(o_orderdate)) AS od_min, epoch_us(MAX(o_orderdate)) AS od_max,
                COUNT(o_orderpriority) AS op_nn, COUNT(DISTINCT o_orderpriority) AS op_nd,
                SUM(CASE WHEN COALESCE(o_orderstatus IN ('F','O','P'), FALSE)
                         THEN 0 ELSE 1 END) AS r_status,
                SUM(CASE WHEN COALESCE(o_totalprice > 0, FALSE)
                         THEN 0 ELSE 1 END) AS r_price
            FROM orders
        ), fk AS (
            SELECT COUNT(*) AS v FROM orders o
            WHERE o.o_custkey IS NOT NULL
              AND NOT EXISTS (SELECT 1 FROM customer c
                              WHERE c.c_custkey = o.o_custkey)
        )
        SELECT item, metric, CAST(value AS DOUBLE) AS value FROM (
            SELECT '__table__' AS item, 'row_count' AS metric,
                   CAST(n AS DOUBLE) AS value FROM a
            {_col_branches("o_orderkey", "ok", "num")}
            {_col_branches("o_custkey", "ck", "num")}
            {_col_branches("o_orderstatus", "st", "str")}
            {_col_branches("o_totalprice", "tp", "num")}
            {_col_branches("o_orderdate", "od", "ts")}
            {_col_branches("o_orderpriority", "op", "str")}
            UNION ALL SELECT 'status_domain', 'violations',
                   CAST(r_status AS DOUBLE) FROM a
            UNION ALL SELECT 'price_positive', 'violations',
                   CAST(r_price AS DOUBLE) FROM a
            UNION ALL SELECT 'o_custkey_in_customer', 'fk_violations',
                   CAST(v AS DOUBLE) FROM fk
        ) t
"""


def _register_x87() -> None:
    """Registered lazily so importing quality.py for its function API
    never requires the registry (and vice versa)."""
    from pyspark.sql import SparkSession

    from etl_spark.registry import register
    from etl_spark.tables import load

    @register(
        "x87_table_profile",
        oracle=_X87_ORACLE,
        tags=("extension", "quality", "profile", "scale"),
        doc="Single-scan Deequ-style profile + constraint verdicts for orders.",
    )
    def x87_table_profile(spark: SparkSession, sf: str) -> DataFrame:
        """Column profile (completeness / exact distinct / min / max /
        decimal-exact mean, timestamps as epoch-microsecond bounds) plus
        row-level constraint verdicts for the orders table — ALL from
        ONE aggregation pass (quality.profile; Schelter et al. VLDB'18),
        with the referential-integrity check (o_custkey ⊆ customer) the
        only second aggregate, its parent side broadcast. The oracle
        recomputes every metric as plain SQL branches over one CTE. At
        100 TB: one scan for N columns' stats + M rules, never N+M
        scans — the difference between a nightly audit and an
        impossible one."""
        orders = load(spark, sf, "orders")
        prof = profile(
            orders,
            rules={
                "status_domain": "o_orderstatus IN ('F','O','P')",
                "price_positive": "o_totalprice > 0",
            },
        )
        cust = load(spark, sf, "customer")
        fk_row = (
            fk_violations(orders, cust, {"o_custkey": "c_custkey"})
            .agg(F.count(F.lit(1)).alias("v"))
            .select(
                F.lit("o_custkey_in_customer").alias("item"),
                F.lit("fk_violations").alias("metric"),
                F.col("v").cast("double").alias("value"),
            )
        )
        return prof.union(fk_row)


_register_x87()


# ---------------------------------------------------------------------------
# Mergeable profile accumulators — the streaming/incremental form of
# ``profile``. Deequ's insight (Schelter et al. VLDB'18 §3.2) is that
# every metric above except exact-distinct decomposes into MERGEABLE
# state: counts and decimal sums add, mins/maxes take min/max — so a
# stored accumulator table absorbs each new batch without rescanning
# history, and the derived profile of the merged state is EXACTLY the
# profile of the union (asserted streamed == one-shot in tests).
# Exact-distinct is deliberately absent (not mergeable without keys);
# the streaming distinct path is the x76 KMV monitor
# (streaming/monitor.py::run_distinct_monitor).
#
# State rows: (item, acc, dval DOUBLE, nval DECIMAL(38,9)) — min/max
# live in dval (double min/max merge losslessly), counts/sums/
# violations in nval (decimal addition is associative, so any merge
# order gives identical bytes; float sums would drift by batch order).
# ---------------------------------------------------------------------------

_MINMAX_ACCS = ("min", "max")


def _acc_specs(
    df: DataFrame,
    include: list[str] | None,
    rules: dict[str, str] | None,
) -> list[tuple[str, str, F.Column]]:
    """(item, acc, aggregate Column) triples — one wide pass."""
    numeric = {"int", "bigint", "smallint", "tinyint", "float", "double"}
    specs: list[tuple[str, str, F.Column]] = [("__table__", "n", F.count(F.lit(1)))]
    for f in df.schema.fields:
        if include is not None and f.name not in include:
            continue
        c, t = f.name, f.dataType.simpleString()
        specs.append((c, "nn", F.count(c)))
        if t in numeric or t.startswith("decimal"):
            specs.append((c, "min", F.min(c).cast("double")))
            specs.append((c, "max", F.max(c).cast("double")))
            specs.append((c, "sum", F.sum(F.col(c).cast("decimal(38,9)"))))
        elif t in ("timestamp", "timestamp_ntz"):
            specs.append((c, "min", F.unix_micros(F.min(c).cast("timestamp")).cast("double")))
            specs.append((c, "max", F.unix_micros(F.max(c).cast("timestamp")).cast("double")))
    for name, cond in (rules or {}).items():
        specs.append(
            (
                name,
                "violations",
                F.sum(
                    F.when(
                        F.coalesce(F.expr(cond).cast("boolean"), F.lit(False)), 0
                    ).otherwise(1)
                ),
            )
        )
    return specs


def profile_accumulators(
    df: DataFrame,
    include: list[str] | None = None,
    rules: dict[str, str] | None = None,
) -> DataFrame:
    """Mergeable accumulator rows (item, acc, dval, nval) from ONE
    aggregation pass — the incremental-state form of ``profile``."""
    specs = _acc_specs(df, include, rules)
    row = df.agg(*[col.alias(f"a{i}") for i, (_, _, col) in enumerate(specs)])
    entries = []
    for i, (item, acc, _) in enumerate(specs):
        is_mm = acc in _MINMAX_ACCS
        entries.append(
            F.struct(
                F.lit(item).alias("item"),
                F.lit(acc).alias("acc"),
                (F.col(f"a{i}").cast("double") if is_mm else F.lit(None).cast("double")).alias(
                    "dval"
                ),
                (
                    F.lit(None).cast("decimal(38,9)")
                    if is_mm
                    else F.col(f"a{i}").cast("decimal(38,9)")
                ).alias("nval"),
            )
        )
    return row.select(F.explode(F.array(*entries)).alias("e")).select(
        "e.item", "e.acc", "e.dval", "e.nval"
    )


def merge_accumulators(*parts: DataFrame) -> DataFrame:
    """Merge accumulator tables: min/max by min/max of dval,
    everything else by exact decimal addition of nval. Associative
    and commutative — any merge tree yields identical bytes."""
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return (
        out.groupBy("item", "acc")
        .agg(
            F.min("dval").alias("_mn"),
            F.max("dval").alias("_mx"),
            F.sum("nval").alias("_sm"),
        )
        .select(
            "item",
            "acc",
            F.when(F.col("acc") == "min", F.col("_mn"))
            .when(F.col("acc") == "max", F.col("_mx"))
            .otherwise(F.lit(None).cast("double"))
            .alias("dval"),
            F.when(F.col("acc").isin(*_MINMAX_ACCS), F.lit(None).cast("decimal(38,9)"))
            .otherwise(F.col("_sm").cast("decimal(38,9)"))
            .alias("nval"),
        )
    )


def profile_from_accumulators(acc: DataFrame) -> DataFrame:
    """Derive the long-format (item, metric, value DOUBLE) profile
    from accumulator state — the same arithmetic ``profile`` applies
    to its own wide row, so the derived profile of merged batches
    equals the one-shot profile of the union (minus ``distinct``,
    which is not mergeable — see the section note)."""
    wide = (
        acc.groupBy("item")
        .pivot("acc", ["n", "nn", "min", "max", "sum", "violations"])
        .agg(
            F.first(
                F.when(F.col("acc").isin(*_MINMAX_ACCS), F.col("dval")).otherwise(
                    F.col("nval").cast("double")
                )
            )
        )
    )
    total = acc.filter((F.col("item") == "__table__") & (F.col("acc") == "n")).select(
        F.col("nval").cast("double").alias("__total")
    )
    wide = wide.crossJoin(F.broadcast(total))
    entries = [
        ("row_count", F.when(F.col("item") == "__table__", F.col("n"))),
        ("completeness", F.round(F.col("nn") / F.col("__total"), 6)),
        ("min", F.col("min")),
        ("max", F.col("max")),
        ("mean", F.round(F.col("sum") / F.col("nn"), 6)),
        ("violations", F.col("violations")),
    ]
    arr = F.array(
        *[
            F.struct(
                F.lit(m).alias("metric"), v.cast("double").alias("value")
            )
            for m, v in entries
        ]
    )
    return (
        wide.select("item", F.explode(arr).alias("e"))
        .select("item", "e.metric", "e.value")
        .filter(F.col("value").isNotNull())
    )


def profile_drift(
    current: DataFrame,
    baseline: DataFrame,
    abs_tol: float = 0.0,
    rel_tol: float = 0.10,
) -> DataFrame:
    """Compare two profiles (long-format ``(item, metric, value)``):
    one row per shared (item, metric) with the relative change and a
    ``breached`` flag when it exceeds ``rel_tol`` AND the absolute
    change exceeds ``abs_tol`` — the alert a nightly table audit or a
    per-batch stream monitor raises when completeness collapses or a
    mean wanders. Metrics present on only one side surface as
    ``added``/``removed`` rows (schema drift is drift too)."""
    c = current.select(
        "item", "metric", F.col("value").alias("cur")
    )
    b = baseline.select("item", "metric", F.col("value").alias("base"))
    j = c.join(b, ["item", "metric"], "full_outer")
    rel = F.when(
        F.col("base").isNotNull() & (F.abs(F.col("base")) > 0),
        F.abs(F.col("cur") - F.col("base")) / F.abs(F.col("base")),
    ).otherwise(
        F.when(F.coalesce(F.abs(F.col("cur")), F.lit(0.0)) > 0, F.lit(float("inf"))).otherwise(
            F.lit(0.0)
        )
    )
    status = (
        F.when(F.col("cur").isNull(), F.lit("removed"))
        .when(F.col("base").isNull(), F.lit("added"))
        .otherwise(F.lit("present"))
    )
    return j.select(
        "item",
        "metric",
        "base",
        "cur",
        F.round(rel, 6).alias("rel_change"),
        status.alias("status"),
        (
            (status != "present")
            | ((rel > rel_tol) & (F.abs(F.col("cur") - F.col("base")) > abs_tol))
        ).alias("breached"),
    )

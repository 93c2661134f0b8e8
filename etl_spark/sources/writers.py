"""Table writers — the reference's load patterns re-expressed as
atomic Spark writes (SURVEY.md §2.1 S5–S7 and §2.9 DML).

Reference behaviors reproduced (cited):

- **append** (S5): `executemany(INSERT INTO t ...)` per-dialect
  (web_scheduler.py:4376-4487) → `df.write.mode("append")`.
- **truncate-and-load** (S6): `DELETE FROM t` then `to_sql(...,
  if_exists='append')` (uploads/excel_to_db.py:53-77). The reference's
  two-step is non-atomic — readers see an empty table mid-load; Spark's
  `INSERT OVERWRITE` / `mode("overwrite")` commits atomically, a
  deliberate documented improvement (SURVEY.md §7.4).
- **auto-create** (S7): `to_sql` creating the table from DataFrame
  dtypes (uploads/excel_to_db.py:74) → `saveAsTable` on first write.
- **upsert** (`INSERT OR REPLACE`, web_scheduler.py:4510-4513): with no
  Delta in this environment, MERGE is a keyed anti-join +
  union-overwrite. At 100 TB you'd use Delta/Iceberg `MERGE INTO`
  (partition-pruned, file-level rewrite); the anti-join form here has
  the same one-shuffle cost profile keyed on the merge keys.

All writers target **managed tables** (the session's
`spark.sql.warehouse.dir`) so the DDL/DML surface (§2.9) operates on
the same catalog.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def ensure_table(df: DataFrame, table: str) -> bool:
    """Create ``table`` from ``df``'s schema if absent (S7 auto-create,
    uploads/excel_to_db.py:74 — "如果目标表不存在，程序会自动创建").
    Returns True if the table was created."""
    spark = df.sparkSession
    if spark.catalog.tableExists(table):
        return False
    # empty write materializes schema + table metadata without data
    df.limit(0).write.format("parquet").saveAsTable(table)
    return True


def append(df: DataFrame, table: str) -> None:
    """S5 batch-insert append. Auto-creates on first write (S7).
    Column order is aligned by name (`unionByName` semantics) — the
    reference aligns by explicit column list (web_scheduler.py:4413)."""
    created = ensure_table(df, table)
    target_cols = df.sparkSession.table(table).columns if not created else df.columns
    df.select(*target_cols).write.format("parquet").mode("append").saveAsTable(table)


def truncate_load(df: DataFrame, table: str) -> None:
    """S6 truncate-and-load full refresh, atomically: one overwrite
    commit instead of the reference's DELETE-then-append window
    (uploads/excel_to_db.py:70-74)."""
    df.write.format("parquet").mode("overwrite").saveAsTable(table)


def partitioned_save(
    df: DataFrame,
    table: str,
    partition_cols: list[str],
    mode: str = "overwrite",
) -> None:
    """Write a managed table hive-partitioned by ``partition_cols``
    (typically a date or date-derived column). Readers filtering on
    those columns prune at the DIRECTORY level — files of excluded
    partitions are never listed, let alone read (PartitionFilters in
    the scan node; asserted in tests/test_scale.py). At 100 TB this
    is the first-order IO lever: a day filter over a year of data
    reads ~0.3% of files.

    Overwrite of an EXISTING table routes through ``insertInto`` with
    dynamic partition overwrite — only the partitions present in
    ``df`` are replaced (saveAsTable(overwrite) drops the whole
    table, dynamic mode notwithstanding). insertInto is positional,
    so columns are aligned to the table schema first.

    The frame is repartitioned on the partition columns before the
    write: without it every shuffle task writes a file into every
    hive partition (tasks × partitions tiny files — the classic
    small-files explosion); with it each partition is written by one
    task. For a skewed giant partition, add a secondary salt column
    to the repartition."""
    spark = df.sparkSession
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    df = df.repartition(*partition_cols)
    if spark.catalog.tableExists(table):
        df.select(*spark.table(table).columns).write.insertInto(
            table, overwrite=(mode == "overwrite")
        )
    else:
        df.write.format("parquet").mode(mode).partitionBy(*partition_cols).saveAsTable(
            table
        )


def bucketed_save(
    df: DataFrame,
    table: str,
    bucket_keys: list[str],
    n_buckets: int = 32,
    sort_keys: list[str] | None = None,
) -> None:
    """Write a managed table bucketed (and optionally sorted) by
    ``bucket_keys``: rows are hash-distributed into ``n_buckets``
    files per partition writer, and the layout is recorded in the
    catalog. Equi-joins and aggregations on the bucket keys between
    tables sharing the same bucketing then run with ZERO shuffle —
    the co-location the reference could never express. At 100 TB this
    is the difference between an exchange of the whole fact table and
    none at all; pick n_buckets so each bucket is a few hundred MB.
    (tests/test_scale.py asserts the no-Exchange plan.)"""
    writer = df.write.format("parquet").mode("overwrite").bucketBy(
        n_buckets, *bucket_keys
    )
    if sort_keys:
        writer = writer.sortBy(*sort_keys)
    writer.saveAsTable(table)


def upsert(df: DataFrame, table: str, keys: list[str]) -> None:
    """MERGE-style upsert (`INSERT OR REPLACE INTO`,
    web_scheduler.py:4510-4513): rows in ``df`` replace target rows
    with equal ``keys``; everything else is kept.

    Parquet has no row-level MERGE, so: target ANTI-JOIN df on keys
    (keep unmatched) UNION df, then overwrite. One shuffle on the key
    columns. The write is staged through a checkpoint-free local
    collect-to-new-plan because Spark cannot overwrite a table it is
    reading from lazily."""
    spark = df.sparkSession
    if ensure_table(df, table):
        df.write.format("parquet").mode("append").saveAsTable(table)
        return
    target = spark.table(table)
    merged = target.join(df.select(*keys), on=keys, how="left_anti").unionByName(
        df.select(*target.columns)
    )
    # materialize before overwriting the table we just read
    _overwrite_self(merged, table)


def delete_where(spark: SparkSession, table: str, condition: str) -> int:
    """§2.9 keyed DELETE (`DELETE FROM t WHERE ...`,
    web_scheduler.py:4982): keep rows NOT matching, overwrite.
    Returns number of deleted rows."""
    target = spark.table(table)
    before = target.count()
    kept = target.filter(f"NOT ({condition})")
    _overwrite_self(kept, table)
    return before - spark.table(table).count()


def update_set(
    spark: SparkSession, table: str, assignments: dict[str, str], condition: str = "true"
) -> int:
    """§2.9 UPDATE ... SET (dynamic SET-list builder,
    web_scheduler.py:2624-2675; computed update `SET is_active = NOT
    is_active` :4954-4958). ``assignments`` maps column -> SQL
    expression evaluated on matching rows. Returns rows updated."""
    from pyspark.sql import functions as F

    target = spark.table(table)
    cond = F.expr(condition)
    n = target.filter(cond).count()
    updated = target.select(
        *[
            F.when(cond, F.expr(assignments[c])).otherwise(F.col(c)).alias(c)
            if c in assignments
            else F.col(c)
            for c in target.columns
        ]
    )
    _overwrite_self(updated, table)
    return n


def _overwrite_self(df: DataFrame, table: str) -> None:
    """Overwrite ``table`` with a plan that reads from it: stage the
    rows into a temp table, then overwrite from the staged copy.

    On Delta/Iceberg this whole helper disappears (native DML with
    snapshot isolation); parquet managed tables need the staging hop
    because the lazy plan would otherwise read partially-deleted
    files mid-overwrite."""
    spark = df.sparkSession
    staging = f"__stage_{abs(hash(table)) % 10**8}"
    df.write.format("parquet").mode("overwrite").saveAsTable(staging)
    try:
        spark.table(staging).write.format("parquet").mode("overwrite").saveAsTable(table)
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {staging}")

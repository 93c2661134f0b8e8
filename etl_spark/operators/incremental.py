"""Incremental partition-scoped rollup refresh.

The reference's transform (scheduler.db sql_scripts row 30, run every
minute by task 25) is `TRUNCATE TABLE dwd; INSERT INTO dwd SELECT *
FROM staging` — a FULL recompute of the derived table on every tick,
no matter how little changed. At 31k rows that costs ~2 s; at 100 TB
it is simply impossible.

`refresh_rollup` is the scale-correct form: the derived table is
hive-partitioned on a time bucket, and a refresh recomputes ONLY the
partitions touched by the incoming delta, replacing them atomically
via dynamic partition overwrite (sources/writers.partitioned_save).
Cost scales with the size of the changed partitions, not the table.
The equality contract — incremental result == full recompute — is
asserted in tests/test_scale.py.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_spark.sources.writers import partitioned_save


def refresh_rollup(
    spark: SparkSession,
    source: DataFrame,
    table: str,
    partition_col: str,
    build: Callable[[DataFrame], DataFrame],
    delta: DataFrame | None = None,
) -> int:
    """Maintain ``table`` = ``build(source)``, partitioned by
    ``partition_col`` (a column of build's output).

    - First call (table absent): full build.
    - With ``delta`` (new/changed source rows): recompute only the
      partitions the delta touches — read back the affected source
      slice (partition-pruned scan), rebuild those partitions, and
      dynamic-overwrite them.

    ``build`` must be partition-local: every output row's
    ``partition_col`` must be derivable from its input rows alone
    (true for any groupBy that includes the partition column — the
    reference's day/shop rollups all qualify).

    Returns the number of partitions (re)written.
    """
    if not spark.catalog.tableExists(table):
        full = build(source)
        partitioned_save(full, table, [partition_col])
        return full.select(partition_col).distinct().count()

    if delta is None:
        return 0

    touched = [
        r[0]
        for r in build(delta).select(partition_col).distinct().collect()
    ]
    if not touched:
        return 0
    # rebuild ONLY the touched partitions from the full (updated)
    # source — the build's own partition column prunes the recompute
    rebuilt = build(source).filter(F.col(partition_col).isin(touched))
    partitioned_save(rebuilt, table, [partition_col])
    return len(touched)

"""Test-fixture table access.

The driver materializes TPC-H-ish parquet tables per scale factor
(TESTDATA.md). All queries take ``(spark, sf_dir)`` and read through
these helpers so the scan is always a plain parquet DataSource scan —
filters and column pruning push down into it (verified in tests via
``.explain``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Small dimension tables that should always be broadcast in joins.
DIM_TABLES = frozenset({"region", "nation", "supplier", "part", "customer"})


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table. Plain parquet scan; no caching — each
    query owns its plan so pushdown stays visible.

    ``events.ts`` is nanosecond-precision in the parquet file, which
    Spark's reader rejects; read it as raw int64 nanos
    (``nanosAsLong``) and floor-truncate to microseconds — exactly
    what DuckDB's µs timestamp does, so oracle parity holds. The cast
    to TIMESTAMP_NTZ goes through UTC so it is wall-clock-stable no
    matter what session timezone the caller configured.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    path = f"{sf_dir}/{name}.parquet"
    if name == "events":
        from pyspark.sql import functions as F

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        # epoch + exact DECIMAL seconds => TIMESTAMP_NTZ, no session-tz
        # dependence (make_dt_interval's seconds arg is DECIMAL-exact
        # to the microsecond)
        return spark.read.parquet(path).withColumn(
            "ts",
            F.expr(
                "TIMESTAMP_NTZ '1970-01-01 00:00:00' + make_dt_interval(0, 0, 0, "
                "CAST(ts DIV 1000 AS DECIMAL(26,0)) / 1000000)"
            ),
        )
    return spark.read.parquet(path)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view (for spark.sql use
    and the multi-statement runner)."""
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)

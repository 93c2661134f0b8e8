"""JDBC source/sink configuration (SURVEY.md §2.1 S2, §2.1 S5).

The reference connects to MySQL (pymysql), PostgreSQL (psycopg2) and
SQLite directly and ships SQL strings (web_scheduler.py:896-1026);
its remote OLAP endpoint speaks the MySQL protocol (Doris/StarRocks
FE on :9030, scheduler.db db_configs id=9). On Spark the same reach
is `spark.read.format("jdbc")` — with three scale levers the
reference has no analog for:

- **partitioned reads**: `partitionColumn/lowerBound/upperBound/
  numPartitions` (or explicit `predicates`) split one remote table
  into N parallel range scans — executor-side parallelism instead of
  one driver cursor;
- **pushdown**: Catalyst pushes filters (and with
  `pushDownAggregate`, aggregates/limits) into the remote SQL, so
  the warehouse does the reduction and only results cross the wire;
- **batched IO**: `fetchsize` (read) and `batchsize` (write) replace
  the reference's hand-rolled `executemany` batching
  (web_scheduler.py:4418).

The path is exercised END-TO-END against embedded Apache Derby
(`derby-*.jar` ships on Spark's own classpath): write → partitioned
read → filter pushdown, see `tests/test_io.py::test_jdbc_roundtrip_derby`.
Against MySQL/PostgreSQL the only delta is the driver jar on the
executor classpath and the url/driver pair — every option here is
engine-neutral. Timeouts mirror the reference's 30 s connect budget
(web_scheduler.py:913-914).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession

DEFAULT_FETCHSIZE = 10_000
DEFAULT_BATCHSIZE = 10_000
DEFAULT_CONNECT_TIMEOUT_S = 30  # web_scheduler.py:913-914


def jdbc_read_options(
    url: str,
    table: str | None = None,
    query: str | None = None,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
    fetchsize: int = DEFAULT_FETCHSIZE,
    **extra: Any,
) -> dict[str, str]:
    """Option map for a (possibly partitioned) JDBC scan. Exactly one
    of ``table``/``query``. Partitioned form requires all four range
    parameters — each partition becomes `WHERE col BETWEEN lo AND hi`
    executed by a different executor."""
    if (table is None) == (query is None):
        raise ValueError("exactly one of table/query is required")
    opts: dict[str, str] = {"url": url, "fetchsize": str(fetchsize)}
    opts["dbtable" if table is not None else "query"] = table or query  # type: ignore[assignment]
    part_args = (partition_column, lower_bound, upper_bound, num_partitions)
    if any(a is not None for a in part_args):
        if any(a is None for a in part_args):
            raise ValueError(
                "partitioned read needs partition_column, lower_bound, "
                "upper_bound AND num_partitions"
            )
        if query is not None:
            raise ValueError("partitioned read requires table, not query")
        opts.update(
            partitionColumn=str(partition_column),
            lowerBound=str(lower_bound),
            upperBound=str(upper_bound),
            numPartitions=str(num_partitions),
        )
    opts.update({k: str(v) for k, v in extra.items()})
    return opts


def jdbc_reader(spark: SparkSession, **kwargs: Any):
    """A configured DataFrameReader; `.load()` when a driver jar is on
    the classpath."""
    return spark.read.format("jdbc").options(**jdbc_read_options(**kwargs))


def jdbc_write_options(
    url: str,
    table: str,
    batchsize: int = DEFAULT_BATCHSIZE,
    isolation_level: str = "READ_COMMITTED",
    **extra: Any,
) -> dict[str, str]:
    """Option map for the S5 batch-insert sink: executor-parallel
    batched INSERTs (one connection per partition), replacing the
    reference's single-connection executemany loop."""
    opts = {
        "url": url,
        "dbtable": table,
        "batchsize": str(batchsize),
        "isolationLevel": isolation_level,
    }
    opts.update({k: str(v) for k, v in extra.items()})
    return opts


def jdbc_writer(df: DataFrame, mode: str = "append", **kwargs: Any):
    """A configured DataFrameWriter; `.save()` against a live
    endpoint. ``mode="overwrite"`` with `truncate=true` in extra
    reproduces S6 truncate-and-load on the remote side."""
    return df.write.format("jdbc").mode(mode).options(**jdbc_write_options(**kwargs))

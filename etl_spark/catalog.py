"""Catalog resolution (SURVEY.md §2.12) — the reference's single most
planner-like behavior: parse `db.table` names out of SQL text, and if
a name doesn't resolve, search every database for the table and
rewrite the query to the found location (web_scheduler.py:3211-3317).

Re-expressed on `spark.catalog`: listDatabases/tableExists instead of
`SHOW DATABASES` + per-db `SHOW TABLES LIKE` probes over a live
connection."""

from __future__ import annotations

import re

from pyspark.sql import SparkSession

# the reference's extraction regex (web_scheduler.py:3216):
# word.word after FROM or JOIN
_DB_TABLE_RE = re.compile(r"\b(?:from|join)\s+(\w+)\.(\w+)", re.IGNORECASE)

_SYSTEM_DBS = frozenset({"information_schema", "sys", "performance_schema", "mysql"})


def extract_tables(sql: str) -> list[tuple[str, str]]:
    """All (db, table) pairs referenced as `db.table` after FROM/JOIN."""
    return _DB_TABLE_RE.findall(sql)


def find_table(spark: SparkSession, table: str) -> str | None:
    """Search every non-system database for ``table``; return the
    first qualifying database or None (the reference's SHOW DATABASES
    → SHOW TABLES probe loop, web_scheduler.py:3240-3290)."""
    for db in spark.catalog.listDatabases():
        if db.name in _SYSTEM_DBS:
            continue
        if spark.catalog.tableExists(f"{db.name}.{table}"):
            return db.name
    return None


def resolve_sql(spark: SparkSession, sql: str) -> str:
    """Rewrite unresolvable `db.table` references to a database that
    actually contains the table (web_scheduler.py:3300-3317's SQL
    rewrite). References that already resolve are left alone."""
    out = sql
    for db, table in extract_tables(sql):
        if spark.catalog.tableExists(f"{db}.{table}"):
            continue
        found = find_table(spark, table)
        if found is not None:
            out = re.sub(
                rf"\b{re.escape(db)}\.{re.escape(table)}\b", f"{found}.{table}", out
            )
    return out

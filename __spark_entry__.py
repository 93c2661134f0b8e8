"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over ``etl_spark`` — the registry in
``etl_spark/registry.py`` is the single source of truth mapping
SURVEY.md §2 operators to (Spark callable, DuckDB oracle SQL) pairs.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import etl_spark


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    q = etl_spark.queries()["q01_pricing_summary"]
    return q(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return etl_spark.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each SQL-expressible query."""
    return etl_spark.oracle_sql()

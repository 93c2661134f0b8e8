"""Plan inspection — `.explain` output as data, so plan-shape
guarantees (pushdown, pruning, broadcast, shuffle count) can be
asserted in tests and monitored in production jobs.

The reference has no planner to inspect (SQL strings ship verbatim to
the target RDBMS, web_scheduler.py:896-1026); on Spark the physical
plan IS the performance contract, so we make it first-class.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """The formatted (pre-execution) physical plan with per-node
    details — where PushedFilters / ReadSchema / join strategies
    appear."""
    mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return df._jdf.queryExecution().explainString(mode)


def executed_plan(df: DataFrame) -> str:
    """The final post-AQE executed plan. Triggers execution —
    WholeStageCodegen spans and AQE's runtime decisions (coalesced
    partitions, demoted/promoted joins) only exist here."""
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def node_count(plan: str, node: str) -> int:
    """Count physical nodes in formatted-explain output via the
    numbered detail headers '(N) <node>'."""
    return len(re.findall(rf"\(\d+\) {node}(?:\n| )", plan))

"""Orchestrator (SURVEY.md §2.10, §3.1): cron/interval scheduling,
retry policy, dependency gating, in-flight dedup, run-now, audit
logging — the reference's 1-second scheduler thread re-expressed as a
testable, time-injected driver component over Spark metadata tables."""

from etl_spark.orchestrator.cron import next_fire
from etl_spark.orchestrator.scheduler import Orchestrator, TaskSpec

__all__ = ["next_fire", "Orchestrator", "TaskSpec"]

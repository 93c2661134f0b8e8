"""Physical-plan utilities: inspection helpers and skew-mitigation
strategies (SURVEY.md §4; the 100 TB survival toolkit)."""

from etl_spark.plans.inspect import executed_plan, formatted_plan, node_count
from etl_spark.plans.skew import key_skew_profile, salted_join

__all__ = [
    "executed_plan",
    "formatted_plan",
    "node_count",
    "key_skew_profile",
    "salted_join",
]

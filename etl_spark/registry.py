"""Query registry — the single source of truth wiring operator
implementations to the driver contract (``__spark_entry__.py``).

Each operator family from SURVEY.md §2 registers one or more named
queries here. A query = a Spark callable ``(spark, sf_dir) ->
DataFrame`` plus (where SQL-expressible) an equivalent ANSI-SQL oracle
string that DuckDB runs on the same parquet fixtures. Column names are
aligned on both sides because the driver's comparator sorts columns by
name before hashing values.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None = None  # ANSI SQL for DuckDB; None => rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


_REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
    doc: str = "",
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a query under ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = QuerySpec(
            name=name, fn=fn, oracle=oracle, tags=tuple(tags), doc=doc or (fn.__doc__ or "")
        )
        return fn

    return deco


def _ensure_loaded() -> None:
    """Import every module that registers queries (idempotent).

    ORDER MATTERS for the driver's correctness snapshot: r1 recorded
    exactly the first 50 registered queries (insertion order), leaving
    the extensions/advanced families without driver rows despite all
    passing the identical local oracle gate. The extension + advanced
    modules therefore register FIRST so the driver's hard signal
    covers them; the relational/scalar/analytics families (all 50
    green in CORRECTNESS_r01.json) follow."""
    import etl_spark.extensions.dedup  # noqa: F401
    import etl_spark.extensions.similarity  # noqa: F401
    import etl_spark.extensions.textstats  # noqa: F401
    import etl_spark.extensions.multimodal  # noqa: F401
    import etl_spark.extensions.pipeline  # noqa: F401
    import etl_spark.operators.advanced  # noqa: F401
    import etl_spark.operators.analytics_more  # noqa: F401
    import etl_spark.operators.analytics_ext  # noqa: F401
    import etl_spark.operators.event_analytics  # noqa: F401
    import etl_spark.operators.statistics  # noqa: F401
    import etl_spark.operators.relational  # noqa: F401
    import etl_spark.operators.scalar_functions  # noqa: F401
    import etl_spark.operators.analytics  # noqa: F401


# The driver's correctness snapshot covers only the FIRST 50 registered
# queries per round (insertion order). This list pins the front of the
# window each round so hard-signal rows land where they're most needed;
# unlisted queries follow in module-registration order.
#
# Round-3 priority (VERDICT r2 "Next round" #3):
#   1. the 17 queries never driver-checked in r1/r2;
#   2. the 13 events-reading queries whose r1 greens went stale when the
#      fixture was re-encoded (fresh rows post-loader-fix);
#   3. x28 (oracle HUGEINT cast fixed this round);
#   4. round-3 additions fill the remaining slots as they register.
_DRIVER_WINDOW_PRIORITY: tuple[str, ...] = (
    # -- never driver-checked (17)
    "e01_funnel_steps",
    "e02_retention_cohorts",
    "e03_event_transitions",
    "e04_value_heavy_hitters",
    "e05_error_spike_zscore",
    "e06_value_k_correlation",
    "a12_cube",
    "a13_percentiles",
    "q02_min_cost_supplier",
    "q09_product_profit",
    "q11_important_stock",
    "q12_late_shipment_priority",
    "q21_sole_returned_supplier",
    "q22_dormant_customers",
    "q23_gapfill_daily",
    "set03_intersect",
    "f11_array_hof",
    # -- stale r1 greens on the re-encoded events fixture (13)
    "p04_range_time",
    "f02_regexp_extract",
    "f05_tz_shift_interval",
    "a03_max_per_group",
    "a05_bool_and_gate",
    "a06_lastn_conditional",
    "o03_latest_row",
    "s01_tumbling_window",
    "s02_session_window",
    "w03_lag_lead_delta",
    "w04_sessionize",
    "j09_asof_join",
    "f09_json_extract",
    # -- r2 hash-fail, oracle fixed this round (1)
    "x28_sequence_pack",
    # -- new in round 3 (13): first driver rows
    "w07_percent_rank",
    "a14_filtered_agg",
    "a15_median_mode",
    "f12_string_agg",
    "f13_price_histogram",
    "e07_funnel_latency",
    "e08_dau_stickiness",
    "x33_word_freq_zipf",
    "x34_bigram_counts",
    "x35_type_token_ratio",
    "x36_pii_scrub",
    "x37_incremental_neardup",
    "x38_minhash_error",
    "x39_kmeans_assign",
)


def all_specs() -> dict[str, QuerySpec]:
    _ensure_loaded()
    prio = {n: i for i, n in enumerate(_DRIVER_WINDOW_PRIORITY)}
    order = {n: i for i, n in enumerate(_REGISTRY)}
    names = sorted(_REGISTRY, key=lambda n: (prio.get(n, len(prio)), order[n]))
    return {n: _REGISTRY[n] for n in names}


def queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in all_specs().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle for name, spec in all_specs().items() if spec.oracle is not None
    }

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
    import etl_spark.extensions.corpus  # noqa: F401
    import etl_spark.extensions.resampling  # noqa: F401
    import etl_spark.operators.advanced  # noqa: F401
    import etl_spark.operators.analytics_more  # noqa: F401
    import etl_spark.operators.analytics_ext  # noqa: F401
    import etl_spark.operators.event_analytics  # noqa: F401
    import etl_spark.operators.statistics  # noqa: F401
    import etl_spark.operators.relational  # noqa: F401
    import etl_spark.operators.scalar_functions  # noqa: F401
    import etl_spark.operators.analytics  # noqa: F401
    import etl_spark.operators.skew  # noqa: F401


# The driver's correctness snapshot covers only the FIRST 50 registered
# queries per round (insertion order). This list pins the front of the
# window each round so hard-signal rows land where they're most needed;
# unlisted queries follow in module-registration order.
#
# Rotation policy (enforced by tests/test_window_rotation.py, not just
# this comment — VERDICT r6 "Next round" #3): oldest-first dominance.
# Never-driver-checked queries count as infinitely stale and lead; then
# queries whose last CORRECTNESS row is oldest; ``oracle=None`` queries
# never occupy a slot (their rows-only check is a permanent weak
# signal — burning a hard-signal slot on them is waste, r5 lesson).
#
# Round-8 window (tools/rotate_window.py output, VERDICT r7 #1):
#   1. the 22 queries whose last driver green is r3 — three rounds
#      stale, the oldest outstanding debt (q12, e01-e08, a12/a13,
#      e06, p04, a03/a05/a06, o03, set03, f02/f05/f11, s01/s02);
#   2. 28 of the r4-green tier, module-registration order; the
#      remaining r4 queries rotate in r9.
_DRIVER_WINDOW_PRIORITY: tuple[str, ...] = (
    # -- last driver green is r3 (22): oldest outstanding debt
    "q12_late_shipment_priority",
    "e01_funnel_steps",
    "e02_retention_cohorts",
    "e03_event_transitions",
    "e04_value_heavy_hitters",
    "e05_error_spike_zscore",
    "e07_funnel_latency",
    "e08_dau_stickiness",
    "a12_cube",
    "a13_percentiles",
    "e06_value_k_correlation",
    "p04_range_time",
    "a03_max_per_group",
    "a05_bool_and_gate",
    "a06_lastn_conditional",
    "o03_latest_row",
    "set03_intersect",
    "f02_regexp_extract",
    "f05_tz_shift_interval",
    "f11_array_hof",
    "s01_tumbling_window",
    "s02_session_window",
    # -- last driver green is r4 (28 of 46), registration order
    "x29_dup_clusters",
    "x24_blocked_neardup",
    "x39_kmeans_assign",
    "x42_neardup_bucket_audit",
    "x43_embedding_norm_stats",
    "x36_pii_scrub",
    "x40_stratified_split",
    "x41_cross_source_overlap",
    "q11_important_stock",
    "p01_eq_filter",
    "p03_isin",
    "p05_compound_where",
    "p06_not_empty_string",
    "p07_bool_projection",
    "prj01_alias_unicode",
    "prj02_star",
    "j01_inner_2way",
    "j02_star_3way",
    "j03_left_outer",
    "j04_latest_per_key_join",
    "j05_correlated_max",
    "j06_semi",
    "a01_count_total",
    "a02_count_threshold",
    "a04_distinct",
    "w01_topk_per_group",
    "w02_running_sum",
    "o01_top10_orders",
)

# Queries whose SEMANTICS changed this round and therefore justify a
# window slot even though their last driver row is recent (the r5
# de-vacuification precedent). tests/test_window_rotation.py exempts
# these from the oldest-first dominance check; clear it when the
# re-verification lands.
REVERIFY_THIS_ROUND: frozenset[str] = frozenset()


def all_specs() -> dict[str, QuerySpec]:
    _ensure_loaded()
    # A typo'd or renamed entry would silently fall out of the window
    # instead of pinning it — fail loudly instead (ADVICE r3).
    unknown = set(_DRIVER_WINDOW_PRIORITY) - set(_REGISTRY)
    if unknown:
        raise ValueError(
            f"_DRIVER_WINDOW_PRIORITY names not in the registry: {sorted(unknown)}"
        )
    # the list IS the 50-slot window: fewer wastes hard-signal slots on
    # whatever registers first; more silently pushes the tail past the
    # driver's cutoff while looking pinned
    if len(_DRIVER_WINDOW_PRIORITY) != 50:
        raise ValueError(
            f"_DRIVER_WINDOW_PRIORITY must name exactly the 50 driver "
            f"window slots, got {len(_DRIVER_WINDOW_PRIORITY)}"
        )
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

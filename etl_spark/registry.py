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
    import etl_spark.operators.skew  # noqa: F401


# The driver's correctness snapshot covers only the FIRST 50 registered
# queries per round (insertion order). This list pins the front of the
# window each round so hard-signal rows land where they're most needed;
# unlisted queries follow in module-registration order.
#
# Round-4 priority (VERDICT r3 "Next round" #1: rotate oldest-first;
# no query's last driver row should age past 2 rounds):
#   1. queries whose semantics/plan CHANGED this round — q11 threshold
#      retune (non-vacuous), x36 redaction-flag fix, x39 tie-break
#      rounding, x24 occupancy cap, x29 durable-checkpoint refactor;
#   2. the 4 NEW round-4 queries (first driver rows);
#   3. all 41 queries whose last driver green is r1 (the relational/
#      scalar/analytics core — r2/r3 windows rotated elsewhere).
# The 36 remaining r2-checked queries (x06-x35 families etc.) AND the
# round-4 additions that registered after the window filled
# (j10_salted_skew_join, x44-x46) rotate in round 5; all are covered
# by the identical local oracle gate today.
_DRIVER_WINDOW_PRIORITY: tuple[str, ...] = (
    # -- changed this round (5): re-verify under the new form
    "q11_important_stock",
    "x36_pii_scrub",
    "x39_kmeans_assign",
    "x24_blocked_neardup",
    "x29_dup_clusters",
    # -- new in round 4 (4): first driver rows
    "x40_stratified_split",
    "x41_cross_source_overlap",
    "x42_neardup_bucket_audit",
    "x43_embedding_norm_stats",
    # -- last driver green is r1 (41): oldest-first refresh
    "p01_eq_filter",
    "p02_like_contains",
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
    "j07_anti",
    "a01_count_total",
    "a02_count_threshold",
    "a04_distinct",
    "w01_topk_per_group",
    "w02_running_sum",
    "o01_top10_orders",
    "o02_multikey_page",
    "set01_union",
    "set02_except",
    "f01_split_array_ops",
    "f03_multiformat_dates",
    "f04_date_format_parts",
    "f06_hashes",
    "f07_coalesce_fallback",
    "f08_string_ops",
    "q01_pricing_summary",
    "q03_shipping_priority",
    "q05_region_revenue",
    "q06_shop_day_rollup",
    "t01_dashboard_listing",
    "q04_priority_exists",
    "q10_returned_items",
    "q07_nation_volume",
    "q14_promo_effect",
    "q18_large_orders",
    "q19_disjunctive_revenue",
)


def all_specs() -> dict[str, QuerySpec]:
    _ensure_loaded()
    # A typo'd or renamed entry would silently fall out of the window
    # instead of pinning it — fail loudly instead (ADVICE r3).
    unknown = set(_DRIVER_WINDOW_PRIORITY) - set(_REGISTRY)
    if unknown:
        raise ValueError(
            f"_DRIVER_WINDOW_PRIORITY names not in the registry: {sorted(unknown)}"
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

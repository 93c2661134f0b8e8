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
    import etl_spark.extensions.sketches  # noqa: F401
    import etl_spark.extensions.textindex  # noqa: F401
    import etl_spark.extensions.graph  # noqa: F401
    import etl_spark.extensions.fuzzy  # noqa: F401
    import etl_spark.quality  # noqa: F401  (registers x87)
    import etl_spark.operators.advanced  # noqa: F401
    import etl_spark.operators.analytics_more  # noqa: F401
    import etl_spark.operators.analytics_ext  # noqa: F401
    import etl_spark.operators.event_analytics  # noqa: F401
    import etl_spark.operators.statistics  # noqa: F401
    import etl_spark.operators.bloomjoin  # noqa: F401
    import etl_spark.operators.scd  # noqa: F401  (registers x91)
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
# Round-9 window (tools/rotate_window.py output, VERDICT r8 #1):
#   1. the 18 queries whose last driver green is r4 — four rounds
#      stale, the oldest outstanding debt (o02, set01, f01/f03/f04/
#      f06/f07/f08, q01 the entry() flagship, q04-q07, q10, q14,
#      q18/q19, t01 the reference dashboard query);
#   2. the never-driver-checked r9 registrations (x84 bloom prune,
#      x85 PageRank, x86 fuzzy match, x87 profile, x88 incremental
#      CC, x89 substring dup, x75 ANN, x76-x82 sketch/sample family,
#      x83 boolean search) lead per policy rule 1;
#   3. 11 of the r6-green tier, module-registration order; the
#      remaining r6 queries (incl. a07/a08/j08/f10/x16/x25/x45/x47/
#      x49/x50/x51/x52/x54/x55, displaced by the sketch + index +
#      bloom/graph/fuzzy/profile families) rotate in r10 — displacing
#      within the equal-staleness r6 tier keeps the oldest-first
#      invariant.
_DRIVER_WINDOW_PRIORITY: tuple[str, ...] = (
    # -- never driver-checked: new registration leads (policy rule 1)
    "x84_bloom_join_prune",
    "x85_pagerank_trade_graph",
    "x86_fuzzy_name_match",
    "x87_table_profile",
    "x88_incremental_dup_clusters",
    "x89_substring_dup_coverage",
    "x90_entity_clusters",
    "e09_ewma_spike",
    "x91_priority_history",
    "x92_copurchase_lift",
    "x93_rfm_segments",
    "x94_mom_revenue_growth",
    "x75_ivfpq_residual_knn_join",
    "x76_kmv_distinct_customers",
    "x77_kmv_year_overlap",
    "x78_bottomk_sample_quantiles",
    "x79_token_heavy_hitters",
    "x80_priority_sample_revenue",
    "x81_countmin_token_freq",
    "x82_cms_merge_estimates",
    "x83_boolean_token_search",
    # -- last green r4
    "o02_multikey_page",
    "set01_union",
    "f01_split_array_ops",
    "f03_multiformat_dates",
    "f04_date_format_parts",
    "f06_hashes",
    "f07_coalesce_fallback",
    "f08_string_ops",
    "q01_pricing_summary",
    "q05_region_revenue",
    "q06_shop_day_rollup",
    "t01_dashboard_listing",
    "q04_priority_exists",
    "q10_returned_items",
    "q07_nation_volume",
    "q14_promo_effect",
    "q18_large_orders",
    "q19_disjunctive_revenue",
    # -- last green r6
    "x46_dedup_verdict",
    "x06_knn_bruteforce",
    "x07_embedding_neardup",
    "x08_ann_ivf_topk",
    "x21_cosine_lsh_buckets",
    "x44_incremental_embedding_neardup",
    "x53_kmeans_update",
    "x10_token_stats",
    "x11_quality_score",
    "x12_langid_heuristic",
    "x13_fingerprint",
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

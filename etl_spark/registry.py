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
# Round-10 window (tools/rotate_window.py output, VERDICT r9 #1):
#   1. the never-driver-checked r10 registrations lead per policy
#      rule 1: x95 perceptual image near-dup; x96-x98 + e10
#      warehouse analytics; x99-x106 media/CRM/SLA/BM25; x107/x108 +
#      e11 collocations/OLS/conversion; the late batch x109-x119 +
#      e12/e13 (sketches, robust statistics, graph, attribution,
#      intervals, histogram);
#   2. the oracle-backed queries whose last driver green is r6 — the
#      oldest outstanding tier, led by x15_media_decode's FIRST
#      hash-backed check since its r9 oracle upgrade (VERDICT r9
#      rule-1 lead). The late registrations displaced the equal-r6
#      tier's q08/q13/q15/q16/q17/q20/p02/j07/set02/q03/j10/j11 to
#      r11 (policy rule 1: never-checked dominates);
#   3. x72, whose registered SEMANTICS changed this round (fixed-
#      size delta batch — the r7 row verified the old half-corpus
#      shape; REVERIFY slot); the whole r7 tier (x01-x05, x23, x37,
#      x38, x69, x57, x60, x71, x73, x74, textstats x31-x35, ...)
#      rotates in r11 together with the displaced r6 remainder.
_DRIVER_WINDOW_PRIORITY: tuple[str, ...] = (
    # -- never driver-checked: new registrations lead (policy rule 1)
    "x109_hll_distinct",
    "x110_corr_matrix",
    "x111_cusum_changepoint",
    "x112_mad_outliers",
    "x114_bitmap_distinct",
    "x115_triangle_clustering",
    "x116_rolling_distinct",
    "x117_bfs_levels",
    "e12_time_to_convert",
    "e13_last_touch_attribution",
    "x118_peak_active_orders",
    "x119_price_histogram",
    "x120_weighted_percentiles",
    "x121_gini_concentration",
    "e14_dau_wau_stickiness",
    "x95_image_neardup",
    "x96_cohort_ltv",
    "x97_inventory_aging",
    "x98_abc_pareto",
    "e10_weekly_retention",
    "x99_media_resize",
    "x100_frame_stats",
    "x101_incremental_image_neardup",
    "x102_new_vs_returning",
    "x103_interpurchase_gaps",
    "x104_image_dup_clusters",
    "x105_ship_sla_monthly",
    "x106_bm25_search",
    "x107_bigram_pmi",
    "x108_revenue_trend",
    "e11_windowed_conversion",
    # -- last green r6 (x14/x17-x20 displaced to r11 — equal tier)
    "x48_quality_gate_agreement",
    "x15_media_decode",
    "x16_binary_meta",
    "x25_decontaminate",
    "x45_split_token_budget",
    "x47_curated_corpus",
    "x49_multimodal_curated",
    "x50_segment_dedup",
    "x51_temperature_mix_sample",
    "x52_training_order",
    "x54_lm_quality_score",
    "x55_split_leakage",
    "a07_rollup",
    "a08_count_distinct",
    "j08_range_join",
    "f10_explode_unnest",
    # (a09/a10/a11 displaced to r11 with the rest — equal r6 tier)
    "w05_ntile_quartiles",
    "w06_trailing_window",
    # (q08/q13/q15/q16/q17/q20/p02/j07/set02/q03/j10/j11 displaced to
    #  r11 by the r10-late registrations above — equal r6 tier, policy
    #  rule 1)
    # -- last green r7
    # -- re-registered this round (fixed-size delta batch): the r7
    #    driver row verified the OLD half-corpus shape, so x72 takes
    #    a REVERIFY slot (the r5 de-vacuification precedent)
    "x72_incremental_knn_join",
)

# Queries whose SEMANTICS changed this round and therefore justify a
# window slot even though their last driver row is recent (the r5
# de-vacuification precedent). tests/test_window_rotation.py exempts
# these from the oldest-first dominance check; clear it when the
# re-verification lands.
REVERIFY_THIS_ROUND: frozenset[str] = frozenset({"x72_incremental_knn_join"})


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

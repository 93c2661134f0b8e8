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

import functools
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

# Runtime session confs every registered query's semantics depend on.
# The driver runs queries inside ITS OWN SparkSession (see
# __spark_entry__.py) — nothing guaranteed the session timezone there,
# and CORRECTNESS_r10 showed x111/e13 flipping on to_date /
# unix_timestamp under a session config our builder never reproduces
# (VERDICT r10 "What's wrong" #1). Timezone-aware expressions resolve
# the session TZ at ANALYSIS time (Catalyst's ResolveTimeZone rule), so
# pinning immediately before the callable constructs its DataFrame is
# sufficient and sticks through the driver's later collect(). Both keys
# are runtime-settable. ANSI is pinned to the Spark 4.x default the
# whole suite is developed and tested under, so cast/overflow/dividing
# semantics cannot drift with the host session either.
_SESSION_PINS: dict[str, str] = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.ansi.enabled": "true",
}


def _pin_session(fn: QueryFn) -> QueryFn:
    """Wrap a query fn so every invocation re-pins the session confs
    in ``_SESSION_PINS`` on the caller-supplied session."""

    @functools.wraps(fn)
    def run(spark: SparkSession, sf: str) -> DataFrame:
        for k, v in _SESSION_PINS.items():
            # defensive: both keys are runtime-settable on stock Spark,
            # but if a host session ever rejects one, degrade to the
            # un-pinned (r10) behavior for that key rather than failing
            # every registered query on the set() itself
            try:
                spark.conf.set(k, v)
            except Exception:  # pragma: no cover - host-specific
                pass
        return fn(spark, sf)

    return run


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
    """Decorator: register a query under ``name``.

    SIDE EFFECT (ADVICE r11): the registered callable is wrapped by
    ``_pin_session``, so EVERY invocation sets ``_SESSION_PINS``
    (session timeZone=UTC, ansi.enabled=true) on the caller-supplied
    SparkSession and deliberately does NOT restore the previous
    values — the pin must stick through the driver's later
    ``collect()`` on the returned (lazy) DataFrame, and a restore
    before that collect would re-break the r10 TZ class. Hosts that
    need different session semantics for unrelated work should
    re-set those confs after consuming the result.
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = QuerySpec(
            name=name,
            fn=_pin_session(fn),
            oracle=oracle,
            tags=tuple(tags),
            doc=doc or (fn.__doc__ or ""),
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
# Round-13 window (tools/rotate_window.py output + VERDICT r12 #2):
#   1. the seven r13 registrations (x132 ANN recall@5 — retrieval
#      QUALITY as a driver-gated row, VERDICT r12 #7; x136 semantic
#      decontamination; e16 error-budget burn; x138 supplier HHI;
#      and the x133/x134/x135 warehouse KPIs) are
#      never-driver-checked and lead per policy rule 1;
#   2. x22_approx_aggs — oracle-backed THIS round (VERDICT r12 #4:
#      exact aggregates + sketch-within-bound booleans the oracle
#      asserts as literal TRUE), so it is newly slot-eligible and its
#      last driver row (r6, the suite's only red) is the oldest of
#      any eligible query;
#   3. the ENTIRE 42-query r8 cohort fills the remaining slots,
#      oldest-first in registration order (VERDICT r12 #2 — the
#      relational core p/j/a/w/o/f, e01-e08, a12/a13, s01/s02).
#      7 + 1 + 42 = 50 exactly; registration stopped here for the
#      round so no r8 entry is displaced past the driver's cutoff.
_DRIVER_WINDOW_PRIORITY: tuple[str, ...] = (
    # -- never driver-checked: the r13 registrations (policy rule 1)
    "x132_ann_recall_at5",
    "x136_semantic_decontaminate",
    "e16_error_budget_burn",
    "x138_supplier_hhi",
    "x133_abc_migration",
    "x134_discount_leakage",
    "x135_seasonality_shift",
    # -- newly oracle-backed; last driver row r6 (oldest eligible)
    "x22_approx_aggs",
    # -- last green r8 (the r13 rotation cohort, registration order)
    "q11_important_stock",
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
    "p01_eq_filter",
    "p03_isin",
    "p04_range_time",
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
    "a03_max_per_group",
    "a04_distinct",
    "a05_bool_and_gate",
    "a06_lastn_conditional",
    "w01_topk_per_group",
    "w02_running_sum",
    "o01_top10_orders",
    "o03_latest_row",
    "set03_intersect",
    "f02_regexp_extract",
    "f05_tz_shift_interval",
    "f11_array_hof",
    "s01_tumbling_window",
    "s02_session_window",
    # -- last green r9 (tier head fills the window)
)

# Queries whose SEMANTICS changed this round and therefore justify a
# window slot even though their last driver row is recent (the r5
# de-vacuification precedent). tests/test_window_rotation.py exempts
# these from the oldest-first dominance check; clear it when the
# re-verification lands.
REVERIFY_THIS_ROUND: frozenset[str] = frozenset(
    {
        # r13: x22 restructured from rows-only to oracle-backed
        # (exact aggregates + within-bound booleans) — the semantics
        # of its correctness row changed, so it takes a slot despite
        # its r6 row already ranking first among eligible queries
        "x22_approx_aggs",
    }
)


def all_specs() -> dict[str, QuerySpec]:
    """All registered specs, driver-window order. Note each spec's
    ``fn`` pins ``_SESSION_PINS`` on the session it is called with and
    does not restore prior values (see ``register``)."""
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

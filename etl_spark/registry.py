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
# Round-7 window (executing the rotation r6 skipped — VERDICT r6 #2):
#   1. the 15 round-5 late registrations that have NEVER had a driver
#      row (x56-x70 — training manifest, SemDeDup, curation funnel,
#      packing/sharding/layout, DSIR x62/x64 freshly repaired this
#      round, source cap, epoch upsampling, LR quality step);
#   2. the 6 queries whose last driver green is r2
#      (x23/x26/x27/x30/x31/x32 — displaced twice, oldest debt);
#   3. the queries registered new this round (x71, x65's k-means-cell
#      scale path; x72, its stored-index incremental twin; x73,
#      product-quantized code ranking; x74, the composed two-stage
#      IVF-PQ search — new-before-stale, r4 lesson);
#   4. 25 of the 47 r3-green queries, module-registration order; the
#      remaining 22 (q12, e01-e05/e07/e08, a03/a05/a06/a12/a13, e06,
#      p04, o03, set03, f02/f05/f11, s01/s02) rotate first in r8 with
#      the r4 tier behind them.
_DRIVER_WINDOW_PRIORITY: tuple[str, ...] = (
    # -- never driver-checked (15): registered after the r5 window filled
    "x69_cluster_size_histogram",
    "x57_semdedup",
    "x60_modal_agreement",
    "x65_knn_join",
    "x70_source_league",
    "x56_training_manifest",
    "x58_curation_funnel",
    "x59_incremental_segment_dedup",
    "x61_length_bucket_packing",
    "x68_shard_stats",
    "x62_dsir_importance",
    "x64_incremental_dsir",
    "x63_source_cap",
    "x66_epoch_upsample",
    "x67_quality_lr_step",
    # -- last driver green is r2 (6): oldest outstanding debt
    "x23_jaccard_capped_pairs",
    "x31_quality_percentile_gate",
    "x32_length_histogram",
    "x26_repetition_stats",
    "x27_hash_sample",
    "x30_chunk_docs",
    # -- new this round (4): x65's k-means-cell scale path, its
    #    stored-index incremental twin, PQ compressed-code ranking,
    #    and the composed two-stage IVF-PQ search
    "x71_kmeans_ivf_knn_join",
    "x72_incremental_knn_join",
    "x73_pq_adc_topk",
    "x74_ivfpq_knn_join",
    # -- last driver green is r3 (25 of 47), registration order
    "x01_dedup_exact",
    "x02_ngram_jaccard_pairs",
    "x03_minhash_signatures",
    "x04_minhash_lsh_pairs",
    "x05_simhash",
    "x37_incremental_neardup",
    "x38_minhash_error",
    "x33_word_freq_zipf",
    "x34_bigram_counts",
    "x35_type_token_ratio",
    "x28_sequence_pack",
    "w03_lag_lead_delta",
    "w04_sessionize",
    "j09_asof_join",
    "f09_json_extract",
    "w07_percent_rank",
    "a14_filtered_agg",
    "a15_median_mode",
    "f12_string_agg",
    "f13_price_histogram",
    "q21_sole_returned_supplier",
    "q22_dormant_customers",
    "q23_gapfill_daily",
    "q02_min_cost_supplier",
    "q09_product_profit",
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

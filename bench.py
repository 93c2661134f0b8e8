"""Benchmark harness — runs the headline query set at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": ..., "value": total_sec, "unit": "sec",
     "queries": {name: sec, ...}, "sf": ...}

Every query is consumed with a full collect (results are small
aggregates / top-k by design). Timings include planning + execution,
excluding session startup.
"""

from __future__ import annotations

import hashlib
import json
import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from etl_spark.extensions.similarity import (  # noqa: E402
    x71_kmeans_ivf_knn_join,
    x74_ivfpq_knn_join,
    x75_ivfpq_residual_knn_join,
)
from etl_spark.registry import _pin_session, all_specs  # noqa: E402
from etl_spark.session import get_spark  # noqa: E402

# r12: the in-plan ANN self-joins were demoted from the registry (the
# x65 precedent, VERDICT r11 #6 — their query side grows with the
# corpus, the documented n^1.5 term; x72/x128 are the registered
# delta-shaped production forms). Their bench rows STAY: they anchor
# FROZEN_SET_R9 round-over-round comparability, and their measured
# cost is the baseline the delta probes are judged against. Each is
# wrapped in _pin_session like every registered query so demoted rows
# run under the same session confs (UTC, ansi) as the rest of the
# suite (ADVICE r12).
DEMOTED_BASELINES = {
    name: _pin_session(fn)
    for name, fn in {
        "x71_kmeans_ivf_knn_join": x71_kmeans_ivf_knn_join,
        "x74_ivfpq_knn_join": x74_ivfpq_knn_join,
        "x75_ivfpq_residual_knn_join": x75_ivfpq_residual_knn_join,
    }.items()
}


def _bench_fn(specs, name):
    return specs[name].fn if name in specs else DEMOTED_BASELINES[name]


# loadavg sampled at main() start; emitted in the payload so every
# bench record carries its own contention provenance (r12/r13 lesson)
_LOAD_BEFORE: str | None = None

# Headline set: the reference-pipeline shapes (scans, multi-joins,
# aggregations, windows, threshold monitor) + the training-data ops
# (dedup, minhash, simhash, knn, text stats). Chosen to produce small
# result sets so collect() measures compute, not driver transfer.
HEADLINE = [
    "q01_pricing_summary",
    "q03_shipping_priority",
    "q04_priority_exists",
    "q05_region_revenue",
    "q06_shop_day_rollup",
    "q07_nation_volume",
    "q10_returned_items",
    "q14_promo_effect",
    "q18_large_orders",
    "q19_disjunctive_revenue",
    "q08_market_share",
    "q21_sole_returned_supplier",
    "j02_star_3way",
    "j05_correlated_max",
    "a06_lastn_conditional",
    "w01_topk_per_group",
    "s01_tumbling_window",
    "t01_dashboard_listing",
    "a07_rollup",
    "j08_range_join",
    "x01_dedup_exact",
    "x02_ngram_jaccard_pairs",
    "x03_minhash_signatures",
    "x04_minhash_lsh_pairs",
    "x05_simhash",
    "x06_knn_bruteforce",
    "x13_fingerprint",
    "x17_quality_filter",
    "x18_tfidf_top_terms",
    "x24_blocked_neardup",
    "x29_dup_clusters",
    "x30_chunk_docs",
    "x31_quality_percentile_gate",
    "w05_ntile_quartiles",
    "q02_min_cost_supplier",
    "q09_product_profit",
    "e01_funnel_steps",
    "e03_event_transitions",
    # round-4 additions
    "q11_important_stock",
    "x40_stratified_split",
    "x41_cross_source_overlap",
    "x42_neardup_bucket_audit",
    "x43_embedding_norm_stats",
    "x44_incremental_embedding_neardup",
    "x45_split_token_budget",
    "x46_dedup_verdict",
    "x47_curated_corpus",
    "j10_salted_skew_join",
    # round-5 additions
    "j11_salted_hotkeys_join",
    "x48_quality_gate_agreement",
    "x49_multimodal_curated",
    "x50_segment_dedup",
    "x51_temperature_mix_sample",
    "x52_training_order",
    "x53_kmeans_update",
    "x54_lm_quality_score",
    "x55_split_leakage",
    "x56_training_manifest",
    "x57_semdedup",
    "x58_curation_funnel",
    "x59_incremental_segment_dedup",
    "x60_modal_agreement",
    "x61_length_bucket_packing",
    "x62_dsir_importance",
    "x63_source_cap",
    "x64_incremental_dsir",
    # x65_knn_join was demoted r8 to a test-oracle baseline (fixed
    # 10-cell quantizer, quadratic on the replica corpus); x71
    # followed it r12 (n^1.5 self-join) but keeps its bench row via
    # DEMOTED_BASELINES
    "x66_epoch_upsample",
    "x67_quality_lr_step",
    "x68_shard_stats",
    "x69_cluster_size_histogram",
    "x70_source_league",
    # r7 ANN family: k-means-cell kNN join, incremental stored-index
    # probe, PQ code ranking, composed two-stage IVF-PQ. x71/x74/x75
    # were demoted from the registry r12 (n^1.5 self-joins — see
    # DEMOTED_BASELINES) but keep their bench rows as baselines.
    "x71_kmeans_ivf_knn_join",
    "x72_incremental_knn_join",
    "x73_pq_adc_topk",
    "x74_ivfpq_knn_join",
    # r9: residual IVFADC — x74's deployment encoding, oracle-backed
    "x75_ivfpq_residual_knn_join",
    # r12: the PQ tier's registered production shape — fixed-size
    # residual-IVFPQ delta probe (the x72 pattern for the codes tier)
    "x128_ivfpq_delta_probe",
    # r9: KMV/theta sketch family — bounded-state distinct counts,
    # merged set overlap, bottom-k sample quantiles
    "x76_kmv_distinct_customers",
    "x77_kmv_year_overlap",
    "x78_bottomk_sample_quantiles",
    "x79_token_heavy_hitters",
    "x80_priority_sample_revenue",
    "x81_countmin_token_freq",
    "x82_cms_merge_estimates",
    # r9: stored inverted-index boolean search (in-plan form)
    "x83_boolean_token_search",
    # r9b: bloom join pruning, fixed-point PageRank, q-gram fuzzy
    # matching, single-scan table profile
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
    # r10: perceptual image near-dup (dHash + banded LSH + Hamming)
    "x95_image_neardup",
    # r10: classic warehouse shapes — cohort LTV, inventory aging,
    # ABC/Pareto, normalized weekly retention
    "x96_cohort_ltv",
    "x97_inventory_aging",
    "x98_abc_pareto",
    "e10_weekly_retention",
    # r10: thumbnail pipeline (resize tier composed with decode)
    "x99_media_resize",
    # r10: frame-level stats (the frame-sample tier's registered query)
    "x100_frame_stats",
    # r10: incremental image near-dup probe (dHash band index delta)
    "x101_incremental_image_neardup",
    # r10: CRM classics — acquisition/retention split, purchase cadence
    "x102_new_vs_returning",
    "x103_interpurchase_gaps",
    # r10: image dup clusters (x95 pairs -> connected components)
    "x104_image_dup_clusters",
    # r10: monthly order-to-ship SLA percentiles
    "x105_ship_sla_monthly",
    # r10: BM25 ranked retrieval over the token index
    "x106_bm25_search",
    # r10: PMI collocations over the corpus bigrams
    "x107_bigram_pmi",
    # r10: per-nation OLS revenue trend (exact fixed-point fit)
    "x108_revenue_trend",
    # r10: windowed conversion funnel (7-day RANGE frame)
    "e11_windowed_conversion",
    # r10 late batch: robust statistics + sketch/graph primitives
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
    # r10 late batch 2: sweep-line interval concurrency + exact histogram
    "x118_peak_active_orders",
    "x119_price_histogram",
    # r10 late batch 3: weighted percentiles, Gini, DAU/WAU stickiness
    "x120_weighted_percentiles",
    "x121_gini_concentration",
    "e14_dau_wau_stickiness",
    # r11: warehouse KPIs — order-to-cash, supplier scorecard, OTIF,
    # priority mix shift; session-quality rollup
    "x122_order_to_cash_cycle",
    "x123_supplier_scorecard",
    "x124_otif_fill_rate",
    "x125_priority_mix_shift",
    "e15_session_duration_daily",
    "x126_sla_histogram_percentiles",
    "x127_customer_churn_buckets",
    # r12: churn transition matrix; per-supplier OTIF trend; revenue bridge
    "x129_churn_transition_matrix",
    "x130_supplier_otif_trend",
    "x131_revenue_bridge",
    # r13: ANN recall@5 as a registered quality row; ABC migration,
    # discount leakage, seasonality shift warehouse KPIs
    "x132_ann_recall_at5",
    "x133_abc_migration",
    "x134_discount_leakage",
    "x135_seasonality_shift",
    # r13 late: semantic decontamination (embedding-space eval-leak)
    "x136_semantic_decontaminate",
    # r13 late 2: SRE error-budget burn; supplier HHI concentration
    "e16_error_budget_burn",
    "x138_supplier_hhi",
    # r14: clustered-embedding ANN recall (meaningful-quality gate);
    # monthly margin waterfall
    "x139_ann_recall_clustered",
    "x140_margin_waterfall",
    # r15: Bloom + zonemap file-skipping identity over the z-ordered
    # layout (the per-query row times the PRUNED scans; the pruning
    # fractions themselves land in the payload's skip_stats section)
    "x141_skip_scan",
    # r15: inventory turns, backlog aging, supplier lead-time
    # percentiles (the x140 warehouse cadence, VERDICT r14 #8)
    "x142_inventory_turns",
    "x143_backlog_aging",
    "x144_supplier_leadtime",
]

# r4→r5 note on e01_funnel_steps (VERDICT r4 "What's wrong" #2): the
# 1.46x r4 regression was re-measured in r5 at n=7 on a quiet host
# (load 2.5/32): min 0.41 s / median 0.47 s with no code change —
# inter-session variance (JIT/GC), not a plan regression. The
# load_parallel guard was tried and is COUNTERPRODUCTIVE here (the
# window shuffle already spreads work; the extra round-robin exchange
# costs ~0.2 s). e01 did gain a pushed-down event-type filter (the
# real 100 TB win: non-funnel traffic never reaches the shuffle).



# Frozen r9 comparison set (ADVICE r9 #1): the exact 98 query keys in
# BENCH_r09.json's headline section. The headline set grows every
# round, so "value"/"value_median" are not comparable across rounds;
# value_r9set/value_median_r9set sum ONLY these keys, giving a
# same-population trend line from r9 onward. Never edit this list —
# that is the point of it.
FROZEN_SET_R9 = (
    "a06_lastn_conditional",
    "a07_rollup",
    "e01_funnel_steps",
    "e03_event_transitions",
    "e09_ewma_spike",
    "etl_ingest_overwrite",
    "etl_pipeline_e2e",
    "j02_star_3way",
    "j05_correlated_max",
    "j08_range_join",
    "j10_salted_skew_join",
    "j11_salted_hotkeys_join",
    "q01_pricing_summary",
    "q02_min_cost_supplier",
    "q03_shipping_priority",
    "q04_priority_exists",
    "q05_region_revenue",
    "q06_shop_day_rollup",
    "q07_nation_volume",
    "q08_market_share",
    "q09_product_profit",
    "q10_returned_items",
    "q11_important_stock",
    "q14_promo_effect",
    "q18_large_orders",
    "q19_disjunctive_revenue",
    "q21_sole_returned_supplier",
    "s01_tumbling_window",
    "t01_dashboard_listing",
    "w01_topk_per_group",
    "w05_ntile_quartiles",
    "x01_dedup_exact",
    "x02_ngram_jaccard_pairs",
    "x03_minhash_signatures",
    "x04_minhash_lsh_pairs",
    "x05_simhash",
    "x06_knn_bruteforce",
    "x13_fingerprint",
    "x17_quality_filter",
    "x18_tfidf_top_terms",
    "x24_blocked_neardup",
    "x29_dup_clusters",
    "x30_chunk_docs",
    "x31_quality_percentile_gate",
    "x40_stratified_split",
    "x41_cross_source_overlap",
    "x42_neardup_bucket_audit",
    "x43_embedding_norm_stats",
    "x44_incremental_embedding_neardup",
    "x45_split_token_budget",
    "x46_dedup_verdict",
    "x47_curated_corpus",
    "x48_quality_gate_agreement",
    "x49_multimodal_curated",
    "x50_segment_dedup",
    "x51_temperature_mix_sample",
    "x52_training_order",
    "x53_kmeans_update",
    "x54_lm_quality_score",
    "x55_split_leakage",
    "x56_training_manifest",
    "x57_semdedup",
    "x58_curation_funnel",
    "x59_incremental_segment_dedup",
    "x60_modal_agreement",
    "x61_length_bucket_packing",
    "x62_dsir_importance",
    "x63_source_cap",
    "x64_incremental_dsir",
    "x66_epoch_upsample",
    "x67_quality_lr_step",
    "x68_shard_stats",
    "x69_cluster_size_histogram",
    "x70_source_league",
    "x71_kmeans_ivf_knn_join",
    "x72_incremental_knn_join",
    "x73_pq_adc_topk",
    "x74_ivfpq_knn_join",
    "x75_ivfpq_residual_knn_join",
    "x76_kmv_distinct_customers",
    "x77_kmv_year_overlap",
    "x78_bottomk_sample_quantiles",
    "x79_token_heavy_hitters",
    "x80_priority_sample_revenue",
    "x81_countmin_token_freq",
    "x82_cms_merge_estimates",
    "x83_boolean_token_search",
    "x84_bloom_join_prune",
    "x85_pagerank_trade_graph",
    "x86_fuzzy_name_match",
    "x87_table_profile",
    "x88_incremental_dup_clusters",
    "x89_substring_dup_coverage",
    "x90_entity_clusters",
    "x91_priority_history",
    "x92_copurchase_lift",
    "x93_rfm_segments",
    "x94_mom_revenue_growth",
)


def _etl_bench(spark, sf_dir: str) -> dict[str, float]:
    """The reference's production pipeline at scale (BASELINE.md
    derived floors: ingest ≥17k rows/s, end-to-end ≥5.7k rows/s on
    ~31k rows — here the fact table is lineitem, ~600k rows at sf0.1):

    - etl_ingest_overwrite: truncate-and-load of lineitem into a
      managed table (S6, atomic overwrite);
    - etl_pipeline_e2e: ingest → full-refresh INSERT..SELECT transform
      (script-30 shape) → monitored aliased projection with a
      rows_gt count condition (script-33 shape).
    """
    import tempfile
    import time as _t

    from etl_spark.sources.writers import truncate_load
    from etl_spark.tables import load as load_table

    out: dict[str, float] = {}
    db = f"bench_{abs(hash(tempfile.mkdtemp())) % 10**8}"
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db}")
    try:
        li = load_table(spark, sf_dir, "lineitem")
        t0 = _t.perf_counter()
        truncate_load(li, f"{db}.stage_lineitem")
        out["etl_ingest_overwrite"] = round(_t.perf_counter() - t0, 3)

        t0 = _t.perf_counter()
        truncate_load(li, f"{db}.stage2")
        spark.sql(
            f"CREATE TABLE IF NOT EXISTS {db}.dwd_daily "
            f"(day STRING, flag STRING, n BIGINT, revenue DOUBLE) USING parquet"
        )
        spark.sql(f"TRUNCATE TABLE {db}.dwd_daily")
        spark.sql(
            f"INSERT INTO {db}.dwd_daily "
            f"SELECT date_format(l_shipdate, 'yyyy-MM-dd') AS day, l_returnflag AS flag, "
            f"count(*) AS n, CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) "
            f"FROM {db}.stage2 GROUP BY 1, 2"
        )
        monitored = spark.sql(
            f"SELECT day AS `日期`, flag AS `标志`, n AS `订单数`, revenue AS `总价格` "
            f"FROM {db}.dwd_daily"
        )
        n = monitored.count()
        assert n > 1  # rows_gt 1 condition (the reference's alert 2/3)
        out["etl_pipeline_e2e"] = round(_t.perf_counter() - t0, 3)
    finally:
        spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")
    return out


def _skip_stats_bench(spark, sf_dir: str) -> dict[str, int]:
    """Files-read vs files-total for both x141 skipping paths
    (VERDICT r14 #3's bench row): how many of the z-ordered layout's
    files each index actually let through for the registered probes.
    Pure metadata work — the scans themselves are timed in x141's
    HEADLINE row."""
    from etl_spark.sources.bloomindex import bloom_pruned_files
    from etl_spark.sources.skipquery import (
        PRICE_HI,
        PRICE_LO,
        ensure_skip_layout,
        layout_build_sec,
    )
    from etl_spark.sources.zonemap import pruned_files
    from etl_spark.tables import load as load_table
    from pyspark.sql import functions as F

    table, bloom, zmap = ensure_skip_layout(spark, sf_dir)
    ck = int(
        load_table(spark, sf_dir, "orders").agg(F.min("o_custkey")).first()[0]
    )
    kept_b, total_b = bloom_pruned_files(spark, bloom, "o_custkey", ck)
    kept_z, total_z = pruned_files(
        spark, zmap, "o_totalprice", PRICE_LO, PRICE_HI
    )
    return {
        "bloom_files_kept": len(kept_b),
        "bloom_files_total": total_b,
        "zonemap_files_kept": len(kept_z),
        "zonemap_files_total": total_z,
        # one-time layout+index build cost for this fixture generation
        # (VERDICT r15 #8 disclosure: x141's row times the pruned
        # scans only; the build is declared maintenance, paid once)
        "layout_build_sec": layout_build_sec(sf_dir),
    }


def _cc_shared_bench(spark, sf_dir: str) -> dict[str, float]:
    """VERDICT r12 #3: the CC family with the LSH-pair subtree
    computed ONCE. The four registered queries x29/x46/x47/x49 each
    derive the MinHash-LSH pair table + connected-components fixpoint
    in-plan (right for ad-hoc/oracle-replayable queries, and their
    individual headline rows above measure exactly that recompute
    form); a production pipeline materializing the corpus persists
    the pair table once and injects the shared cluster verdict
    (etl_spark/extensions/pipeline.py::write_curated_corpus). This
    row times ALL FOUR consumers' outputs against one persisted pair
    table + one CC run — compare it with the sum of the four
    queries' individual rows to read the family-level saving."""
    import time as _t

    from etl_spark.extensions.dedup import (
        dedup_verdict_frame,
        dup_clusters_from_pairs,
        x04_minhash_lsh_pairs,
    )
    from etl_spark.extensions.pipeline import (
        curated_corpus_frame,
        multimodal_curated_frame,
    )
    from etl_spark.tables import load as load_table

    t0 = _t.perf_counter()
    pairs = (
        x04_minhash_lsh_pairs(spark, sf_dir)
        .select("doc_a", "doc_b")
        .persist()
    )
    pairs.count()
    # one CC fixpoint; the returned labels are checkpoint-backed, so
    # every downstream consumer reuses the materialized rounds
    clusters = dup_clusters_from_pairs(pairs)
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    verdict = dedup_verdict_frame(docs, clusters)
    kept = verdict.filter("keep").select("doc_id")
    clusters.collect()  # x29's output
    verdict.collect()  # x46's output
    curated_corpus_frame(spark, sf_dir, kept=kept).collect()  # x47
    multimodal_curated_frame(spark, sf_dir, kept=kept).collect()  # x49
    elapsed = round(_t.perf_counter() - t0, 3)
    pairs.unpersist()
    return {"cc_family_shared_pairs": elapsed}


def _dedup_scale_bench(spark, sf_dir: str, replicas: int = 10) -> dict:
    """Dedup/LSH operators at ``replicas``× the fixture corpus
    (VERDICT r1 next-step #4 — the driver fixtures stop at 5k docs).

    The scaled corpus is ``replicas`` token-shifted copies: content
    tokens in replica r get an ``·r`` suffix, so shingle/token space
    is effectively DISJOINT across replicas (a genuinely r×-diverse
    corpus, not one hot duplicate cluster) while each replica
    preserves the original near-dup structure. STOPWORDS keep their
    surface form: suffixing them zeroed the x17 stop-ratio gate and
    made the composed x47 return 0 rows at scale (r5 finding) — and a
    realistic corpus shares function words anyway. Any 3-gram
    containing a content word still differs across replicas, so pair
    volume stays replica-local. Work therefore scales ~linearly for
    the bounded operators (x23/x04/x21) — exactly the property being
    measured. Embeddings are replicated with offset ids (signature
    computation is linear; bucket structure repeats)."""
    from pyspark.sql import functions as F

    from etl_spark.extensions.textstats import _sql_list, _STOPWORDS
    from etl_spark.registry import all_specs

    out: dict = {"replicas": replicas}
    tmp = tempfile.mkdtemp(prefix="dedup_scale_")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    reps = spark.range(replicas).select(F.col("id").alias("rep"))
    scaled_docs = (
        docs.crossJoin(reps)
        .select(
            (F.col("doc_id") + F.col("rep") * 10_000_000).alias("doc_id"),
            F.concat_ws(
                " ",
                F.expr(
                    "transform(split(text, ' '), t -> "
                    f"IF(t IN ({_sql_list(_STOPWORDS)}), t, concat(t, '·', rep)))"
                ),
            ).alias("text"),
            "lang",
            "source",
            "n_chars",
        )
    )
    scaled_docs.write.mode("overwrite").parquet(f"{tmp}/documents.parquet")
    emb.crossJoin(reps).select(
        (F.col("vec_id") + F.col("rep") * 10_000_000).alias("vec_id"),
        "label",
        "embedding",
    ).write.mode("overwrite").parquet(f"{tmp}/embeddings.parquet")
    out["n_docs"] = spark.read.parquet(f"{tmp}/documents.parquet").count()
    out["n_vecs"] = spark.read.parquet(f"{tmp}/embeddings.parquet").count()

    specs = all_specs()
    for name in (
        "x23_jaccard_capped_pairs",
        "x25_decontaminate",
        "x04_minhash_lsh_pairs",
        "x21_cosine_lsh_buckets",
        "x29_dup_clusters",
        # the replicated embedding corpus is 10 exact copies of every
        # vector — a DEGENERATE near-dup load by construction. x42
        # shows the occupancy audit catching it (capped buckets > 0);
        # x24 itself is excluded here because pairing a corpus of pure
        # copies measures the cap, not the operator.
        "x42_neardup_bucket_audit",
        # the composed curation outputs (VERDICT r4 next-round #4):
        # what a real run ships — their 10x->20x slope, not their
        # sf0.1 time, is the 100 TB claim
        "x46_dedup_verdict",
        "x47_curated_corpus",
        # x50: the segment-frequency shuffle is the cost driver; the
        # token-shifted replicas keep duplicate segments replica-local
        # (stopword-only 4-grams are rare), so its slope should track
        # corpus volume. x53: k x d output regardless of n_vecs — the
        # map-side partial-agg claim is the thing the slope verifies.
        "x50_segment_dedup",
        "x53_kmeans_update",
        # x54: the bigram MODEL (cb table) grows with the suffixed
        # vocabulary — the slope verifies the two-scan build stays
        # linear. x55: shingle-keyed train-vs-eval join. x59: the
        # batch-vs-segment-index probe, x37's slope twin.
        "x54_lm_quality_score",
        "x55_split_leakage",
        "x59_incremental_segment_dedup",
        # x62/x64: the DSIR model stays DSIR_BUCKETS rows no matter
        # the corpus, so the slope should track the feature stream
        # (linear) — the model-size-independence claim under test
        "x62_dsir_importance",
        "x64_incremental_dsir",
        # x65 is deliberately NOT here: its cost is n_queries x
        # nprobe x cell_size, and the replica corpus keeps nlist
        # FIXED at the 10 fixture labels, so cell_size grows with the
        # corpus and the join is honestly O(n^2/stride) in this setup
        # (measured: 32 s @10x, 68 s @20x at sf0.001 base). x71 keeps
        # a slope row as the DEMOTED self-join baseline (nlist =
        # ceil(sqrt(n)) cells, documented n^1.5 — the measured reason
        # it left the registry r12); x128 is the registered
        # delta-shaped production form whose slope should track the
        # linear index terms (the x72 story for the codes tier).
        # x67: the sparse feature-matrix GD step — two keyed
        # aggregates + broadcast weight joins, linear
        "x67_quality_lr_step",
        "x71_kmeans_ivf_knn_join",
        "x128_ivfpq_delta_probe",
    ):
        # best-of-2: the scale rows were single-shot through r6, and a
        # single GC stall or page-cache miss landed entirely on one
        # row — r6's x25 "9x slope" (and a 4.7x in an r7 dry run) did
        # not reproduce at n=3 on a quiet host (1.56x,
        # BENCH_QUIET_r07.json). Two runs bound that mode at modest
        # extra wall time; the HEADLINE section is already best-of-3.
        try:
            runs = []
            for _ in range(2):
                t0 = time.perf_counter()
                n = _bench_fn(specs, name)(spark, tmp).count()
                runs.append(time.perf_counter() - t0)
                spark.catalog.clearCache()
        except Exception as exc:  # noqa: BLE001 — same isolation as HEADLINE
            out[f"{name}_error"] = f"{type(exc).__name__}: {exc}"[:300]
            # a failed run may still have persisted its model table —
            # clear on BOTH paths or the leak skews every later row
            spark.catalog.clearCache()
            continue
        out[name] = round(min(runs), 3)
        out[f"{name}_rows"] = n
        # x54/x57-style queries persist a model table scoped to the
        # session; drop it so it cannot occupy memory (or be reused)
        # while LATER queries are timed
        spark.catalog.clearCache()
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)
    return out


def main() -> None:
    global _LOAD_BEFORE
    _LOAD_BEFORE = (
        " ".join(open("/proc/loadavg").read().split()[:3])
        if os.path.exists("/proc/loadavg")
        else None
    )
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).removeprefix("sf")
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = sf
    spark = get_spark(app_name="etl_spark-bench")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_specs()

    # warm the JVM/codegen path and the OS page cache for both fact
    # paths (lineitem + documents) so per-query times measure the
    # engine, not first-call initialization or cold reads
    specs["q01_pricing_summary"].fn(spark, sf_dir).collect()
    specs["x17_quality_filter"].fn(spark, sf_dir).collect()

    # 3 runs per query: "value" stays best-of (a single co-tenant CPU
    # spike or GC stall otherwise lands entirely on whichever query it
    # hits — observed 40x outliers on an idle-looking host), and the
    # median-of-3 is reported alongside so round-over-round comparisons
    # aren't best-case-vs-best-case (VERDICT r1 bench-honesty note)
    timings: dict[str, float] = {}
    medians: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in HEADLINE:
        fn = _bench_fn(specs, name)
        runs = []
        try:
            for _ in range(3):
                t0 = time.perf_counter()
                rows = fn(spark, sf_dir).collect()
                runs.append(time.perf_counter() - t0)
                assert rows is not None
        except Exception as exc:  # noqa: BLE001 — fault-isolate per query
            # one broken query must cost its own row, not the whole
            # bench JSON the driver records for the round
            errors[name] = f"{type(exc).__name__}: {exc}"[:300]
            spark.catalog.clearCache()  # failed run may have persisted
            continue
        timings[name] = round(min(runs), 3)
        medians[name] = round(statistics.median(runs), 3)
        # persist()-using queries (x54 bigram model, x57 clustered
        # base) cache a session-scoped relation; clear it so it can't
        # skew later queries' timings or accumulate across the suite.
        # (Runs 2-3 of the SAME query above still benefit — the cache
        # is only dropped after its own timings are taken.)
        spark.catalog.clearCache()
    etl = _etl_bench(spark, sf_dir)
    timings.update(etl)
    medians.update(etl)  # single-shot writes: same number in both views
    cc = _cc_shared_bench(spark, sf_dir)
    timings.update(cc)
    medians.update(cc)  # single-shot composite: same number in both views
    total = round(sum(timings.values()), 3)
    # two scale points so the growth EXPONENT is visible, not just one
    # ratio: a bounded (linear) operator should roughly double from
    # 10x to 20x; superlinear blow-ups show up as a steeper slope
    scale10 = _dedup_scale_bench(spark, sf_dir, replicas=10)
    scale20 = _dedup_scale_bench(spark, sf_dir, replicas=20)
    try:
        skip_stats = _skip_stats_bench(spark, sf_dir)
    except Exception as exc:  # noqa: BLE001 — fault-isolate like queries
        skip_stats = {"error": f"{type(exc).__name__}: {exc}"[:200]}
    # Key order is deliberate: the driver's record keeps only the TAIL
    # of this one-line JSON when it grows long (r5 lost the entire
    # headline section that way — VERDICT r5 "What's wrong" #4). The
    # numbers that matter most therefore go LAST: per-query medians,
    # the headline best-of dict, and the suite totals. The complete
    # JSON is also written to BENCH_LOCAL.json in-repo so the full
    # record survives regardless of driver truncation.
    payload = {
        "metric": "headline_query_suite_total_wall",
        "unit": "sec",
        # self-recorded contention provenance (the r12/r13 lesson:
        # external judge/driver load produced uniform 15-30% drift
        # that read as per-query regressions until loadavg was
        # captured) — "before" is sampled at session start, so a
        # nonzero value means the window was NOT quiet at launch
        "loadavg_before": _LOAD_BEFORE,
        "loadavg_after": " ".join(
            open("/proc/loadavg").read().split()[:3]
        ) if os.path.exists("/proc/loadavg") else None,
        # x65 left the HEADLINE set in r8 (demoted quadratic) — the
        # suite geomean/median population changed, so value/
        # value_median are not directly comparable across set
        # boundaries; compare per-query rows across them (ADVICE r8).
        # The rev is DERIVED from the set contents (count + digest of
        # the sorted names) so it can never go stale when HEADLINE
        # changes (ADVICE r10: the hand-bumped marker missed the
        # x118-x121/e14 additions).
        "headline_set_rev": "set-%d-%s" % (
            len(HEADLINE),
            hashlib.sha1(
                ",".join(sorted(HEADLINE)).encode()
            ).hexdigest()[:8],
        ),
        "sf": sf_val,
        "skip_stats": skip_stats,
        "scale10x": scale10,
        "scale20x": scale20,
        **({"errors": errors} if errors else {}),
        "value_r9set": round(
            sum(t for n, t in timings.items() if n in FROZEN_SET_R9), 3
        ),
        "value_median_r9set": round(
            sum(t for n, t in medians.items() if n in FROZEN_SET_R9), 3
        ),
        "queries_median": medians,
        "queries": timings,
        "value_median": round(sum(medians.values()), 3),
        "value": total,
    }
    # The COMPLETE payload goes to BENCH_LOCAL.json (committed
    # in-repo); STDOUT gets a compact subset. Rationale (VERDICT r15
    # "What's wrong" #1, measurement-contract fix declared in
    # OPTIMIZATION_r16.md): the driver's record keeps only a bounded
    # tail of this one-line JSON, and by r14 the full line outgrew it
    # — BENCH_r14 recorded parsed:null, which zeroed the round's
    # official prev-vs-now comparison. The stdout line keeps every
    # REQUIRED field (metric/value/unit/queries/sf — the full
    # per-query best-of dict, nothing removed or renamed) plus the
    # provenance fields, and drops only the auxiliary sections
    # (queries_median, scale10x/20x, skip_stats) that remain in
    # BENCH_LOCAL.json.
    with open(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_LOCAL.json"),
        "w",
    ) as fh:
        fh.write(json.dumps(payload) + "\n")
    stdout_payload = {
        k: v
        for k, v in payload.items()
        if k not in ("queries_median", "scale10x", "scale20x", "skip_stats")
    }
    print(json.dumps(stdout_payload))
    spark.stop()


if __name__ == "__main__":
    main()

"""Round-13 additions: the shared LSH-pair/CC intermediate (VERDICT
r12 #3 — injected forms must be row-identical to the registered
recompute forms, and the production writer must agree with the x47
report), the oracle-backed x22 surface (VERDICT r12 #4), and the
ANN recall@5 registered query (VERDICT r12 #7).
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from etl_spark.registry import all_specs
from etl_spark.tables import load

SPECS = all_specs()


def _rowset(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.slow
def test_injected_cc_forms_match_registered(spark, sf_dir):
    """dup_clusters_from_pairs / dedup_verdict_frame /
    curated_corpus_frame / multimodal_curated_frame with ONE persisted
    pair table reproduce x29/x46/x47/x49 row-for-row — the property
    that lets production pay the pair generation + CC fixpoint once
    per pipeline instead of once per consumer."""
    from etl_spark.extensions.dedup import (
        dedup_verdict_frame,
        dup_clusters_from_pairs,
        x04_minhash_lsh_pairs,
    )
    from etl_spark.extensions.pipeline import (
        curated_corpus_frame,
        multimodal_curated_frame,
    )

    pairs = (
        x04_minhash_lsh_pairs(spark, sf_dir)
        .select("doc_a", "doc_b")
        .persist()
    )
    try:
        pairs.count()
        clusters = dup_clusters_from_pairs(pairs)
        assert _rowset(clusters) == _rowset(
            SPECS["x29_dup_clusters"].fn(spark, sf_dir)
        )
        docs = load(spark, sf_dir, "documents").select("doc_id")
        verdict = dedup_verdict_frame(docs, clusters)
        assert _rowset(verdict) == _rowset(
            SPECS["x46_dedup_verdict"].fn(spark, sf_dir)
        )
        kept = verdict.filter("keep").select("doc_id")
        assert _rowset(curated_corpus_frame(spark, sf_dir, kept=kept)) == (
            _rowset(SPECS["x47_curated_corpus"].fn(spark, sf_dir))
        )
        assert _rowset(multimodal_curated_frame(spark, sf_dir, kept=kept)) == (
            _rowset(SPECS["x49_multimodal_curated"].fn(spark, sf_dir))
        )
        from etl_spark.extensions.corpus import curation_funnel_frame

        assert _rowset(curation_funnel_frame(spark, sf_dir, verdict=verdict)) == (
            _rowset(SPECS["x58_curation_funnel"].fn(spark, sf_dir))
        )
        from etl_spark.extensions.pipeline import source_league_frame

        assert _rowset(source_league_frame(spark, sf_dir, clusters=clusters)) == (
            _rowset(SPECS["x70_source_league"].fn(spark, sf_dir))
        )
    finally:
        pairs.unpersist()


def test_write_curated_corpus_matches_report(spark, sf_dir, tmp_path):
    """The production writer's parquet output and its returned (lang,
    split) report describe the same corpus: written doc count equals
    the report's n_docs total, the report is exactly x47's output,
    and every written doc passes the quality gate."""
    from etl_spark.extensions.pipeline import write_curated_corpus
    from etl_spark.extensions.textstats import quality_keep_col

    out = str(tmp_path / "curated")
    report = write_curated_corpus(spark, sf_dir, out)
    rep_rows = report.collect()
    assert _rowset(report) == _rowset(
        SPECS["x47_curated_corpus"].fn(spark, sf_dir)
    )
    written = spark.read.parquet(out)
    assert written.count() == sum(r.n_docs for r in rep_rows)
    assert written.filter(~quality_keep_col()).count() == 0
    # written doc_ids are unique (dedup verdict applied)
    assert written.select("doc_id").distinct().count() == written.count()


def test_x22_bounds_and_exactness(spark, sf_dir):
    """The r13 oracle-backed x22: boolean columns are non-null TRUE
    at every fixture scale (deterministic sketches — this is what the
    literal-TRUE oracle hashes against) and the exact columns agree
    with a direct aggregation."""
    rows = SPECS["x22_approx_aggs"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.cd_within_bound is True
        assert r.median_within_bound is True
    direct = {
        r.o_orderstatus: (r.cd, r.n)
        for r in load(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.count_distinct("o_custkey").alias("cd"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    }
    assert {
        r.o_orderstatus: (r.exact_customers, r.n_orders) for r in rows
    } == direct


def test_x132_recall_semantics(spark, sf_dir):
    """x132: one row per query in the fixed batch, hits in [0, 5],
    recall = hits/5, and recall is 1.0 wherever the IVF-PQ top-5
    equals the exact top-5 (sanity: at least one query must achieve a
    hit on the fixture — an all-zero recall would mean the probe and
    the brute force disagree on everything, i.e. a broken index)."""
    from etl_spark.extensions.similarity import KNN_K, X72_BATCH_MAX_ID

    rows = SPECS["x132_ann_recall_at5"].fn(spark, sf_dir).collect()
    n_q = (
        load(spark, sf_dir, "embeddings")
        .filter(
            (F.col("vec_id") % 2 == 1) & (F.col("vec_id") < X72_BATCH_MAX_ID)
        )
        .count()
    )
    assert len(rows) == n_q
    for r in rows:
        assert 0 <= r.hits <= KNN_K
        assert abs(r.recall_at_5 - r.hits / KNN_K) < 1e-12
    assert sum(r.hits for r in rows) > 0


def test_x136_soundness_and_sides(spark, sf_dir):
    """x136 semantic decontamination: every flagged doc is (a) NOT an
    eval-source doc, (b) truly cosine-near (>= SEMDECON_COS) at least
    one eval embedding under the exact brute force — i.e. the banded
    path never invents a hit (soundness; completeness is the
    documented LSH-recall contract, not asserted)."""
    from etl_spark.extensions.pipeline import EVAL_SOURCE, SEMDECON_COS

    rows = SPECS["x136_semantic_decontaminate"].fn(spark, sf_dir).collect()
    assert rows  # non-vacuous at every fixture SF (tuned floor)
    flagged = {r.doc_id for r in rows}
    docs = {
        r.doc_id: r.source
        for r in load(spark, sf_dir, "documents")
        .select("doc_id", "source")
        .collect()
    }
    assert all(docs[d] != EVAL_SOURCE for d in flagged)
    for r in rows:
        assert r.n_eval_hits >= 1
        assert r.max_cosine >= SEMDECON_COS

    # exact brute-force cross-check (fixture-scale only): the flagged
    # set must be a SUBSET of the true >= floor cross-source set
    import numpy as np

    emb = {
        r.vec_id: np.array(r.embedding, dtype=np.float64)
        for r in load(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .collect()
    }
    eval_ids = [d for d, s in docs.items() if s == EVAL_SOURCE and d in emb]
    E = np.vstack([emb[i] for i in eval_ids])
    En = E / np.linalg.norm(E, axis=1, keepdims=True)
    for d in flagged:
        v = emb[d]
        cos = En @ (v / np.linalg.norm(v))
        assert cos.max() >= SEMDECON_COS - 1e-9, d


def test_streaming_decon_matches_batch_x136(spark, sf_dir, tmp_path):
    """The ingest-time decontamination gate replayed over the train
    corpus in two micro-batches flags EXACTLY the x136 batch sweep's
    doc set with identical evidence (the eval index is static, so
    batching cannot change candidates), and kept + flagged partitions
    the input."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from etl_spark.extensions.pipeline import EVAL_SOURCE
    from etl_spark.streaming.neardup import build_decon_index, run_decon_ingest

    docs = load(spark, sf_dir, "documents").select("doc_id", "source")
    emb = load(spark, sf_dir, "embeddings")
    joined = emb.join(docs, emb.vec_id == docs.doc_id)
    build_decon_index(
        joined.filter(F.col("source") == EVAL_SOURCE).select(
            "vec_id", "embedding"
        ),
        str(tmp_path / "eval_idx"),
    )

    train = (
        joined.filter(F.col("source") != EVAL_SOURCE)
        .select("vec_id", "embedding")
        .collect()
    )
    # two plain parquet files => two micro-batches (maxFilesPerTrigger=1)
    src = tmp_path / "train_src"
    src.mkdir()
    half = len(train) // 2
    for i, chunk in enumerate((train[:half], train[half:])):
        pq.write_table(
            pa.table(
                {
                    "vec_id": [r.vec_id for r in chunk],
                    "embedding": [list(r.embedding) for r in chunk],
                }
            ),
            str(src / f"part-{i}.parquet"),
        )
        # pin strictly increasing mtimes: FileStreamSource orders by
        # mtime and back-to-back writes can tie under host load
        os.utime(str(src / f"part-{i}.parquet"), (1000000000 + i * 100,) * 2)

    seen = []
    stream = (
        spark.readStream.schema("vec_id bigint, embedding array<double>")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = run_decon_ingest(
        stream,
        id_col="vec_id",
        emb_col="embedding",
        index_path=str(tmp_path / "eval_idx"),
        out_path=str(tmp_path / "clean"),
        flagged_path=str(tmp_path / "flagged"),
        checkpoint=str(tmp_path / "ckpt"),
        on_batch=lambda b, n_in, n_fl: seen.append((b, n_in, n_fl)),
    )
    q.awaitTermination(120)
    assert len(seen) == 2

    flagged = spark.read.option("recursiveFileLookup", "true").parquet(
        str(tmp_path / "flagged")
    )
    clean = spark.read.option("recursiveFileLookup", "true").parquet(
        str(tmp_path / "clean")
    )
    batch = {
        r.doc_id: (r.n_eval_hits, r.max_cosine)
        for r in SPECS["x136_semantic_decontaminate"].fn(spark, sf_dir).collect()
    }
    stream_got = {
        r.vec_id: (r.n_eval_hits, r.max_cosine) for r in flagged.collect()
    }
    assert stream_got == batch
    clean_ids = {r.vec_id for r in clean.select("vec_id").collect()}
    assert clean_ids.isdisjoint(stream_got)
    assert len(clean_ids) + len(stream_got) == len(train)


def test_streaming_decon_replays_idempotently(spark, sf_dir, tmp_path):
    """The decon sink's exactly-once contract: a crash window that
    loses a batch's _SUCCESS marker (flagged tier) must re-run that
    batch on a fresh checkpoint and land byte-identical outputs —
    never duplicates, never dropped rows. A fully-committed batch
    replayed from a fresh checkpoint must be skipped (markers
    present), leaving outputs unchanged."""
    import os as _os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from etl_spark.extensions.pipeline import EVAL_SOURCE
    from etl_spark.streaming.neardup import build_decon_index, run_decon_ingest

    docs = load(spark, sf_dir, "documents").select("doc_id", "source")
    emb = load(spark, sf_dir, "embeddings")
    joined = emb.join(docs, emb.vec_id == docs.doc_id)
    build_decon_index(
        joined.filter(F.col("source") == EVAL_SOURCE).select(
            "vec_id", "embedding"
        ),
        str(tmp_path / "eval_idx"),
    )
    train = (
        joined.filter(F.col("source") != EVAL_SOURCE)
        .select("vec_id", "embedding")
        .limit(200)
        .collect()
    )
    src = tmp_path / "src"
    src.mkdir()
    pq.write_table(
        pa.table(
            {
                "vec_id": [r.vec_id for r in train],
                "embedding": [list(r.embedding) for r in train],
            }
        ),
        str(src / "b0.parquet"),
    )

    def run(tag):
        stream = (
            spark.readStream.schema("vec_id bigint, embedding array<double>")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        q = run_decon_ingest(
            stream,
            id_col="vec_id",
            emb_col="embedding",
            index_path=str(tmp_path / "eval_idx"),
            out_path=str(tmp_path / "clean"),
            flagged_path=str(tmp_path / "flagged"),
            checkpoint=str(tmp_path / f"ckpt_{tag}"),
        )
        q.awaitTermination(120)

    def snapshot():
        clean = spark.read.option("recursiveFileLookup", "true").parquet(
            str(tmp_path / "clean")
        )
        flagged = spark.read.option("recursiveFileLookup", "true").parquet(
            str(tmp_path / "flagged")
        )
        return (
            sorted(r.vec_id for r in clean.select("vec_id").collect()),
            sorted(tuple(r) for r in flagged.collect()),
        )

    run("first")
    first = snapshot()
    assert len(first[0]) + len(first[1]) == len(train)

    # committed batch + fresh checkpoint => markers skip the re-run
    run("skip")
    assert snapshot() == first

    # crash window: flagged tier lost its commit marker => full re-run
    _os.remove(tmp_path / "flagged" / "batch-0" / "_SUCCESS")
    run("replay")
    assert snapshot() == first


def test_e16_matches_pure_python_reference(spark, sf_dir):
    """e16 vs an independent sequential replay: daily counts, the
    trailing 7-day window, truncating-ppm, and the exact-rational
    breach compare recomputed in pure Python from raw events — the
    x120/x121 discipline (a DuckDB oracle can share an engine
    misunderstanding; a from-scratch replay cannot)."""
    from collections import defaultdict
    from fractions import Fraction

    from etl_spark.operators.event_analytics import (
        E16_BUDGET_PPM,
        E16_WINDOW_DAYS,
    )

    raw = (
        load(spark, sf_dir, "events")
        .select(F.to_date("ts").alias("day"), "event_type")
        .collect()
    )
    n = defaultdict(int)
    e = defaultdict(int)
    for r in raw:
        n[r.day] += 1
        if r.event_type == "error":
            e[r.day] += 1
    days = sorted(n)
    want = {}
    for d in days:
        lo = d.toordinal() - (E16_WINDOW_DAYS - 1)
        w_ev = sum(n[x] for x in days if lo <= x.toordinal() <= d.toordinal())
        w_er = sum(e[x] for x in days if lo <= x.toordinal() <= d.toordinal())
        want[d] = (
            n[d],
            e[d],
            1_000_000 * e[d] // n[d],
            1_000_000 * w_er // w_ev,
            Fraction(w_er, w_ev) > Fraction(E16_BUDGET_PPM, 1_000_000),
        )
    got = {
        r.day: (r.n_events, r.n_errors, r.err_ppm, r.window_ppm, r.breach)
        for r in SPECS["e16_error_budget_burn"].fn(spark, sf_dir).collect()
    }
    assert got == want


def test_x138_matches_pure_python_reference(spark, sf_dir):
    """x138 vs an independent pure-Python HHI: per-supplier floor-cents
    from raw lineitem rows, integer-ppm shares, squared-share sum —
    recomputed from scratch and compared exactly."""
    import math
    from collections import defaultdict

    li = (
        load(spark, sf_dir, "lineitem")
        .select("l_suppkey", "l_extendedprice", "l_discount")
        .collect()
    )
    sup = {
        r.s_suppkey: r.s_nationkey
        for r in load(spark, sf_dir, "supplier").collect()
    }
    nat = {
        r.n_nationkey: r.n_name
        for r in load(spark, sf_dir, "nation").collect()
    }
    cents = defaultdict(int)
    for r in li:
        nk = sup[r.l_suppkey]
        cents[(nk, r.l_suppkey)] += int(
            math.floor(r.l_extendedprice * (1 - r.l_discount) * 100 + 0.5)
        )
    nsum = defaultdict(int)
    for (nk, _), c in cents.items():
        nsum[nk] += c
    shares = defaultdict(list)
    for (nk, sk), c in cents.items():
        shares[nk].append(1_000_000 * c // nsum[nk])
    want = {
        nat[nk]: (
            len(s),
            max(s),
            sum(x * x for x in s) // 1_000_000,
        )
        for nk, s in shares.items()
    }
    got = {
        r.n_name: (r.n_suppliers, r.top_share_ppm, r.hhi_ppm)
        for r in SPECS["x138_supplier_hhi"].fn(spark, sf_dir).collect()
    }
    assert got == want

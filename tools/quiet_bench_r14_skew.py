"""Skew-adversarial quiet evidence for the dedup/LSH family
(VERDICT r13 #4): the committed quiet slopes so far use UNIFORM
token-shifted replicas; the 100 TB risk named in dedup.py (a hot
shingle / hot band bucket) was designed against but never measured.
This harness builds SKEWED replicas and measures each family member
with and without its guard:

- text skew: one constant 3-token suffix appended to 30% of docs in
  every replica => ONE shingle whose frequency is 0.3*corpus and
  grows with scale (plus two doc-specific boundary shingles).
    * x23 (stop-shingle cap, the guard): 10x/20x slope — the cap bans
      the hot shingle from the inverted index, so the slope must stay
      <= ~2.0 per 2x data.
    * x02 (UNCAPPED counterfactual): measured at 2x/4x only — the hot
      shingle makes the index join enumerate (0.3n)^2 row pairs
      inside one join key, a single-task quadratic blowup; the
      2x->4x slope (~4, not ~2) and the absolute x23-vs-x02 gap at 4x
      are the documented counterfactual. NOT run at 10x/20x on
      purpose (minutes of single-core join enumeration proves nothing
      more than 4x does).
    * x04 (MinHash-LSH, NO cap needed): 10x/20x slope — a single hot
      shingle does NOT create a hot band bucket, because the minhash
      is a MIN over all of a doc's shingles (one shared shingle only
      dominates a signature slot with prob ~1/|shingles|). The
      measurement demonstrates banding absorbs frequency skew by
      construction. (A hot NEAR-DUP TEMPLATE cluster is different:
      identical signatures legitimately pair all members — quadratic
      in the OUTPUT, which the shared-CC consumers avoid needing; see
      dedup.py's x03/x23 notes.)
- embedding skew: rotation-decorrelated replicas (the r13 decon
  protocol) but 30% of ALL vectors (train and eval alike) are set to
  one constant vector => one cross-replica hot (band, sig) bucket on
  BOTH sides of x136's cross-set join.
    * x136 with X24_BUCKET_CAP (registered form): 10x/20x slope —
      the hot eval bucket (occupancy 0.3*n_eval >> CAP) is dropped,
      so candidates stay bucket-local and the slope <= ~2.0.
    * x136 with the cap disabled (monkeypatched to 2^62): the hot
      bucket alone contributes 0.09*n_train*n_eval candidate pairs —
      measured at 10x/20x, slope ~4 per 2x. The counterfactual.

MUST run quiet (no concurrent Spark work); loadavg is recorded in the
payload per the quiet-bench protocol. Forcing: agg(sum(xxhash64)).
Merges into BENCH_QUIET_r14.json.  Usage:
    python tools/quiet_bench_r14_skew.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
N_RUNS = 3
SHIFT = 10_000_000
HOT_FRAC_MOD = 10  # doc_id % 10 < 3  => 30% of docs are hot
HOT_SUFFIX = "hotskew alpha beta"  # one constant word-3-gram


def _force(df) -> float:
    from pyspark.sql import functions as F

    t0 = time.perf_counter()
    df.agg(F.sum(F.pmod(F.xxhash64(*df.columns), F.lit(1_000_003)))).collect()
    return time.perf_counter() - t0


def _runs(fn, n=N_RUNS):
    out = []
    for _ in range(n):
        out.append(round(_force(fn()), 3))
    return {"best": min(out), "all": out}


def _build_text_skew(spark, replicas: int) -> str:
    """Token-shifted replicas (the quiet_bench construction — content
    tokens disjoint across replicas so LSH never sees exact copies)
    PLUS the constant hot suffix on 30% of docs in EVERY replica."""
    from pyspark.sql import functions as F

    from etl_spark.extensions.textstats import _sql_list, _STOPWORDS

    tmp = tempfile.mkdtemp(prefix=f"quiet_r14skew_txt{replicas}x_")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    reps = spark.range(replicas).select(F.col("id").alias("rep"))
    shifted = F.concat_ws(
        " ",
        F.expr(
            "transform(split(text, ' '), t -> "
            f"IF(t IN ({_sql_list(_STOPWORDS)}), t, concat(t, '·', rep)))"
        ),
    )
    (
        docs.crossJoin(reps)
        .select(
            (F.col("doc_id") + F.col("rep") * SHIFT).alias("doc_id"),
            F.when(
                F.col("doc_id") % HOT_FRAC_MOD < 3,
                F.concat(shifted, F.lit(" " + HOT_SUFFIX)),
            )
            .otherwise(shifted)
            .alias("text"),
            "lang",
            "source",
            "n_chars",
        )
        .write.mode("overwrite")
        .parquet(f"{tmp}/documents.parquet")
    )
    return tmp


def _build_emb_skew(spark, replicas: int) -> str:
    """Rotation-decorrelated embedding replicas (the r13 decon
    protocol) with 30% of ALL vectors forced to one constant vector —
    a cross-replica hot (band, sig) bucket on both join sides.
    documents replicate with unchanged source labels so every replica
    carries its own eval slice."""
    from pyspark.sql import functions as F

    tmp = tempfile.mkdtemp(prefix=f"quiet_r14skew_emb{replicas}x_")
    reps = spark.range(replicas).select(F.col("id").alias("rep"))
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    const_vec = F.expr(
        "transform(sequence(1, size(embedding)),"
        " i -> CAST(0.1 + 0.001 * i AS DOUBLE))"
    )
    rotated = F.expr(
        "transform(sequence(1, size(embedding)), i -> "
        "CAST(element_at(embedding, CAST((i - 1 + rep) % size(embedding)"
        " AS INT) + 1) AS DOUBLE))"
    )
    (
        emb.crossJoin(reps)
        .select(
            (F.col("vec_id") + F.col("rep") * SHIFT).alias("vec_id"),
            "label",
            F.when(F.col("vec_id") % HOT_FRAC_MOD < 3, const_vec)
            .otherwise(rotated)
            .alias("embedding"),
        )
        .write.mode("overwrite")
        .parquet(f"{tmp}/embeddings.parquet")
    )
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    (
        docs.crossJoin(reps)
        .select(
            (F.col("doc_id") + F.col("rep") * SHIFT).alias("doc_id"),
            *[c for c in docs.columns if c != "doc_id"],
        )
        .write.mode("overwrite")
        .parquet(f"{tmp}/documents.parquet")
    )
    return tmp


def main() -> None:
    from pyspark.sql import SparkSession

    import etl_spark.extensions.similarity as sim
    from etl_spark.registry import all_specs

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_specs()

    out: dict = {
        "skew_note": (
            "Skew-adversarial quiet evidence (VERDICT r13 #4). Text: hot "
            f"3-gram '{HOT_SUFFIX}' in 30% of docs, token-shifted replicas "
            "over sf0.1. Embeddings: rotation-decorrelated replicas with "
            "30% of vectors forced constant (hot band bucket, both sides). "
            "n=3, xxhash64-forced, no concurrent Spark work."
        ),
        "loadavg_at_start": os.getloadavg(),
    }

    # ---- text skew: guarded x23 + cap-free-by-construction x04 ----
    sec: dict = {}
    for replicas in (10, 20):
        tmp = _build_text_skew(spark, replicas)
        level = {
            "n_docs": spark.read.parquet(f"{tmp}/documents.parquet").count()
        }
        for name in ("x23_jaccard_capped_pairs", "x04_minhash_lsh_pairs"):
            level[name] = _runs(lambda: specs[name].fn(spark, tmp))
            print(f"text {replicas}x {name}: {level[name]['all']}", flush=True)
        sec[f"{replicas}x"] = level
        shutil.rmtree(tmp, ignore_errors=True)
    for name in ("x23_jaccard_capped_pairs", "x04_minhash_lsh_pairs"):
        b10, b20 = sec["10x"][name]["best"], sec["20x"][name]["best"]
        sec[f"slope_{name}"] = round(b20 / b10, 2)
    out["text_skew_capped"] = sec

    # ---- text skew counterfactual: UNCAPPED x02 at 2x/4x ----
    cf: dict = {}
    for replicas in (2, 4):
        tmp = _build_text_skew(spark, replicas)
        cf[f"{replicas}x"] = {
            "x02_ngram_jaccard_pairs": _runs(
                lambda: specs["x02_ngram_jaccard_pairs"].fn(spark, tmp), n=2
            ),
            "x23_jaccard_capped_pairs": _runs(
                lambda: specs["x23_jaccard_capped_pairs"].fn(spark, tmp), n=2
            ),
        }
        print(f"counterfactual {replicas}x: {cf[f'{replicas}x']}", flush=True)
        shutil.rmtree(tmp, ignore_errors=True)
    cf["slope_x02_uncapped"] = round(
        cf["4x"]["x02_ngram_jaccard_pairs"]["best"]
        / cf["2x"]["x02_ngram_jaccard_pairs"]["best"],
        2,
    )
    cf["slope_x23_capped_same_corpora"] = round(
        cf["4x"]["x23_jaccard_capped_pairs"]["best"]
        / cf["2x"]["x23_jaccard_capped_pairs"]["best"],
        2,
    )
    cf["x02_over_x23_at_4x"] = round(
        cf["4x"]["x02_ngram_jaccard_pairs"]["best"]
        / cf["4x"]["x23_jaccard_capped_pairs"]["best"],
        2,
    )
    out["text_skew_uncapped_counterfactual"] = cf

    # ---- embedding skew: x136 with cap vs cap disabled ----
    emb_sec: dict = {}
    real_cap = sim.X24_BUCKET_CAP
    for replicas in (10, 20):
        tmp = _build_emb_skew(spark, replicas)
        level = {
            "n_vecs": spark.read.parquet(f"{tmp}/embeddings.parquet").count()
        }
        level["x136_capped"] = _runs(
            lambda: specs["x136_semantic_decontaminate"].fn(spark, tmp)
        )
        print(f"emb {replicas}x capped: {level['x136_capped']['all']}", flush=True)
        try:
            sim.X24_BUCKET_CAP = 1 << 62  # counterfactual: no guard
            level["x136_uncapped"] = _runs(
                lambda: specs["x136_semantic_decontaminate"].fn(spark, tmp),
                n=2,
            )
        finally:
            sim.X24_BUCKET_CAP = real_cap
        print(
            f"emb {replicas}x uncapped: {level['x136_uncapped']['all']}",
            flush=True,
        )
        emb_sec[f"{replicas}x"] = level
        shutil.rmtree(tmp, ignore_errors=True)
    for form in ("x136_capped", "x136_uncapped"):
        emb_sec[f"slope_{form}"] = round(
            emb_sec["20x"][form]["best"] / emb_sec["10x"][form]["best"], 2
        )
    emb_sec["uncapped_over_capped_at_20x"] = round(
        emb_sec["20x"]["x136_uncapped"]["best"]
        / emb_sec["20x"]["x136_capped"]["best"],
        2,
    )
    out["embedding_skew_x136"] = emb_sec

    out["loadavg_at_end"] = os.getloadavg()

    path = os.path.join(REPO, "BENCH_QUIET_r14.json")
    if os.path.exists(path):
        prior = json.load(open(path))
        prior.update(out)
        out = prior
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print("wrote", path)
    spark.stop()


if __name__ == "__main__":
    main()

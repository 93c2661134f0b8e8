"""Quiet-host scale evidence for x136_semantic_decontaminate: n=3
runs at 10x/20x replica corpora.

The in-bench dedup scale protocol replicates embeddings as EXACT
copies — a degenerate near-dup load that measures the bucket cap, not
the operator (the x24 exclusion note in bench.py). Here each replica
r instead gets its vector components ROTATED by r positions (the
embedding-space analog of x86's Caesar-rotated vocabularies): rotation
preserves norms and all WITHIN-replica dot products exactly — every
replica keeps the original's cross-source near structure — while
cross-replica cosines and band signatures decorrelate, so candidate
volume grows with the corpus instead of quadratically in copies.
documents replicate with shifted doc_ids and unchanged source labels
(each replica carries its own eval slice — BOTH sides of the
cross-set join grow).

Design claim: one signature pass + a bucket-local (band, sig)
equi-join + candidate-only re-score => slope <= ~2.0 per 2x data.

Merges results into BENCH_QUIET_r13.json.
Usage: python tools/quiet_bench_r13_decon.py
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
N_SCALE = 3
SHIFT = 10_000_000


def _force(df) -> float:
    from pyspark.sql import functions as F

    t0 = time.perf_counter()
    df.agg(F.sum(F.pmod(F.xxhash64(*df.columns), F.lit(1_000_003)))).collect()
    return time.perf_counter() - t0


def _build(spark, replicas: int) -> str:
    from pyspark.sql import functions as F

    tmp = tempfile.mkdtemp(prefix=f"quiet_r13decon_{replicas}x_")
    reps = spark.range(replicas).select(F.col("id").alias("rep"))

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    (
        emb.crossJoin(reps)
        .select(
            (F.col("vec_id") + F.col("rep") * SHIFT).alias("vec_id"),
            "label",
            # rotate components by rep positions (1-indexed arrays):
            # norms and within-replica dots are EXACTLY preserved
            F.expr(
                "transform(sequence(1, size(embedding)), i -> "
                "element_at(embedding, CAST((i - 1 + rep) % size(embedding)"
                " AS INT) + 1))"
            ).alias("embedding"),
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

    section: dict = {
        "note": (
            "x136 quiet scale: component-rotated replica embeddings "
            "(within-replica cosines exact, cross-replica decorrelated "
            "— the x86 Caesar trick in embedding space), doc_ids "
            "shifted, source labels kept so both sides of the "
            "cross-set join grow. n=3, xxhash64-forced."
        ),
        "loadavg_at_start": open("/proc/loadavg").read().split()[0],
    }
    for replicas in (10, 20):
        tmp = _build(spark, replicas)
        sec: dict = {"replicas": replicas}
        runs = []
        for _ in range(N_SCALE):
            runs.append(
                round(
                    _force(
                        specs["x136_semantic_decontaminate"].fn(spark, tmp)
                    ),
                    3,
                )
            )
            spark.catalog.clearCache()
        sec["x136_semantic_decontaminate"] = {"best": min(runs), "all": runs}
        print(f"{replicas}x x136: {runs}", flush=True)
        section[f"scale_{replicas}x"] = sec
        shutil.rmtree(tmp, ignore_errors=True)

    section["slope_20x_over_10x"] = round(
        section["scale_20x"]["x136_semantic_decontaminate"]["best"]
        / section["scale_10x"]["x136_semantic_decontaminate"]["best"],
        2,
    )
    path = os.path.join(REPO, "BENCH_QUIET_r13.json")
    out = json.load(open(path)) if os.path.exists(path) else {}
    out["semantic_decon_r13"] = section
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({"slope": section["slope_20x_over_10x"]}))
    print("wrote", path)
    spark.stop()


if __name__ == "__main__":
    main()

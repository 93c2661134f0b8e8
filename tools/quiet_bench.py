"""Quiet-host scale re-measurement for the ANN tier (VERDICT r8 #2,
carried from r7 #3): n>=3 runs of x71/x72/x74 + x54/x64 at 10x/20x the
sf0.1 fixture corpus, plus an n=5 x06 wobble check at plain sf0.1.

MUST run with no concurrent Spark work (bench isolation — contention
fakes super-linear slopes; see BENCH_QUIET_r07.json's x25 finding).

Forcing: count() column-prunes aggregate/UDF columns and times hollow
plans (r7: a 23.5 s assignment measured as 1.15 s), so every timed run
is forced with agg(sum(xxhash64(*cols))) — one scalar to the driver,
every output column computed.

Writes BENCH_QUIET_r{N}.json (N via --round). Usage:
    python tools/quiet_bench.py --round 8
"""

from __future__ import annotations

import argparse
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

SCALE_QUERIES = (
    "x71_kmeans_ivf_knn_join",  # demoted r12 baseline (bench.DEMOTED_BASELINES)
    "x72_incremental_knn_join",
    "x74_ivfpq_knn_join",  # demoted r12 baseline
    "x128_ivfpq_delta_probe",
    "x54_lm_quality_score",
    "x64_incremental_dsir",
)
N_SCALE = 3
N_WOBBLE = 5


def _force(df) -> float:
    """Execute df computing EVERY output column; return elapsed sec."""
    from pyspark.sql import functions as F

    t0 = time.perf_counter()
    # modulo keeps the ANSI-mode sum from long-overflowing; xxhash64
    # still has to compute every output column
    df.agg(F.sum(F.pmod(F.xxhash64(*df.columns), F.lit(1_000_003)))).collect()
    return time.perf_counter() - t0


def _build_scaled(spark, sf_dir: str, replicas: int) -> str:
    """Token-shifted replica corpus — same construction as
    bench._dedup_scale_bench (disjoint content-token space per replica,
    stopwords shared, embeddings replicated with offset ids)."""
    from pyspark.sql import functions as F

    from etl_spark.extensions.textstats import _sql_list, _STOPWORDS

    tmp = tempfile.mkdtemp(prefix=f"quiet_scale{replicas}x_")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    reps = spark.range(replicas).select(F.col("id").alias("rep"))
    (
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
        .write.mode("overwrite")
        .parquet(f"{tmp}/documents.parquet")
    )
    emb.crossJoin(reps).select(
        (F.col("vec_id") + F.col("rep") * 10_000_000).alias("vec_id"),
        "label",
        "embedding",
    ).write.mode("overwrite").parquet(f"{tmp}/embeddings.parquet")
    return tmp


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, required=True)
    args = ap.parse_args()

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

    out: dict = {
        "note": (
            "Quiet-host ANN-tier scale evidence (VERDICT r8 #2, carried from "
            "r7 #3): no concurrent Spark work, n=3 per query per replica "
            "level, runs forced with agg(sum(xxhash64(*cols))) so no column "
            "is pruned (count() forcing times hollow plans). Corpus is the "
            "bench's token-shifted replica construction over sf0.1. Slopes "
            "are best20x/best10x per 2x data."
        ),
        "sf": 0.1,
        "cpus": int(CPUS),
    }

    for replicas in (10, 20):
        tmp = _build_scaled(spark, SF_DIR, replicas)
        sec: dict = {
            "replicas": replicas,
            "n_docs": spark.read.parquet(f"{tmp}/documents.parquet").count(),
            "n_vecs": spark.read.parquet(f"{tmp}/embeddings.parquet").count(),
        }
        from bench import _bench_fn

        for name in SCALE_QUERIES:
            runs = []
            for _ in range(N_SCALE):
                runs.append(round(_force(_bench_fn(specs, name)(spark, tmp)), 3))
                spark.catalog.clearCache()
            sec[name] = {"best": min(runs), "all": runs}
            print(f"{replicas}x {name}: {runs}", flush=True)
        out[f"scale_{replicas}x"] = sec
        shutil.rmtree(tmp, ignore_errors=True)

    slopes = {}
    for name in SCALE_QUERIES:
        b10 = out["scale_10x"][name]["best"]
        b20 = out["scale_20x"][name]["best"]
        slopes[name] = round(b20 / b10, 2) if b10 else None
    out["slope_20x_over_10x"] = slopes

    # x06 wobble check (r8: 0.276 -> 0.383 s in the driver bench)
    runs = []
    for _ in range(N_WOBBLE):
        runs.append(round(_force(specs["x06_knn_bruteforce"].fn(spark, SF_DIR)), 3))
        spark.catalog.clearCache()
    out["x06_knn_bruteforce_sf0.1"] = {"best": min(runs), "all": runs}

    path = os.path.join(REPO, f"BENCH_QUIET_r{args.round:02d}.json")
    # MERGE with any focused-harness sections already recorded this
    # round (quiet_bench_r10_x72 / _wh write to the same file)
    if os.path.exists(path):
        prior = json.load(open(path))
        prior.update(out)
        out = prior
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out["slope_20x_over_10x"]))
    print("wrote", path)
    spark.stop()


if __name__ == "__main__":
    main()

"""Quiet-host scale evidence for the RE-REGISTERED x72 (VERDICT r9
#2): the registered form is now a fixed-size delta batch (odd vec_id
< X72_BATCH_MAX_ID, <=128 queries) probed against the even-half IVF
index, replacing the half-corpus form whose slope was 3.04 per 2x
(BENCH_QUIET_r08.json — the n^1.5 term of batch ~ n/2 x probe ~
sqrt(n)). Expected now: the probe term is batch * nprobe * cell_size
~ sqrt(n), so the measured slope should be dominated by the LINEAR
index-build terms (scan + assign) — ~2.0 or below per 2x.

MUST run with no concurrent Spark work. Writes
BENCH_QUIET_r10.json. Usage: python tools/quiet_bench_r10_x72.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
N = 3


def _force(df) -> float:
    from pyspark.sql import functions as F

    t0 = time.perf_counter()
    df.agg(F.sum(F.pmod(F.xxhash64(*df.columns), F.lit(1_000_003)))).collect()
    return time.perf_counter() - t0


def main() -> None:
    from pyspark.sql import SparkSession

    from etl_spark.registry import all_specs
    from tools.quiet_bench import _build_scaled

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
            "Quiet-host scale evidence for the re-registered x72 "
            "(fixed-size delta batch vs even-half IVF index, VERDICT r9 "
            "#2). Same replica construction and xxhash64 forcing as "
            "quiet_bench.py; old half-corpus form's slope was 3.04 "
            "(BENCH_QUIET_r08.json), now a test-only baseline."
        ),
        "sf": 0.1,
        "cpus": int(CPUS),
    }
    for replicas in (10, 20):
        tmp = _build_scaled(spark, SF_DIR, replicas)
        runs = []
        for _ in range(N):
            runs.append(
                round(
                    _force(specs["x72_incremental_knn_join"].fn(spark, tmp)),
                    3,
                )
            )
            spark.catalog.clearCache()
        out[f"scale_{replicas}x"] = {
            "replicas": replicas,
            "n_vecs": spark.read.parquet(f"{tmp}/embeddings.parquet").count(),
            "x72_incremental_knn_join": {"best": min(runs), "all": runs},
        }
        print(f"{replicas}x x72: {runs}", flush=True)
        shutil.rmtree(tmp, ignore_errors=True)

    b10 = out["scale_10x"]["x72_incremental_knn_join"]["best"]
    b20 = out["scale_20x"]["x72_incremental_knn_join"]["best"]
    out["slope_20x_over_10x"] = {
        "x72_incremental_knn_join": round(b20 / b10, 2) if b10 else None
    }
    path = os.path.join(REPO, "BENCH_QUIET_r10.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out["slope_20x_over_10x"]))
    print("wrote", path)
    spark.stop()


if __name__ == "__main__":
    main()

"""Quiet-host scale evidence for the r10 image near-dup family (x95
pairs, x101 incremental probe, x104 clusters): n=3 at 10x/20x the
sf0.1 documents corpus (quiet_bench's token-shifted replica build —
replica payloads differ, so cross-replica dHash collisions are chance
level and bucket occupancy stays bounded, the banded-LSH design
claim). Slope target <= ~2.0 per 2x.

MUST run with no concurrent Spark work. Merges into
BENCH_QUIET_r10.json. Usage: python tools/quiet_bench_r10_img.py
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
QUERIES = (
    "x95_image_neardup",
    "x101_incremental_image_neardup",
    "x104_image_dup_clusters",
)


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

    section: dict = {
        "note": (
            "r10 image near-dup family quiet scale (x95/x101/x104): "
            "quiet_bench replica protocol, n=3, xxhash64-forced."
        )
    }
    for replicas in (10, 20):
        tmp = _build_scaled(spark, SF_DIR, replicas)
        sec: dict = {
            "replicas": replicas,
            "n_docs": spark.read.parquet(f"{tmp}/documents.parquet").count(),
        }
        for name in QUERIES:
            runs = []
            for _ in range(N):
                runs.append(round(_force(specs[name].fn(spark, tmp)), 3))
                spark.catalog.clearCache()
            sec[name] = {"best": min(runs), "all": runs}
            print(f"{replicas}x {name}: {runs}", flush=True)
        section[f"scale_{replicas}x"] = sec
        shutil.rmtree(tmp, ignore_errors=True)

    section["slope_20x_over_10x"] = {
        n: round(
            section["scale_20x"][n]["best"] / section["scale_10x"][n]["best"],
            2,
        )
        for n in QUERIES
    }
    path = os.path.join(REPO, "BENCH_QUIET_r10.json")
    out = json.load(open(path)) if os.path.exists(path) else {}
    out["image_neardup_r10"] = section
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(section["slope_20x_over_10x"]))
    print("wrote", path)
    spark.stop()


if __name__ == "__main__":
    main()

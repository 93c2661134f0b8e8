"""Quiet-host scale evidence for the r10 warehouse-analytics family
(x96 cohort LTV, x97 inventory aging, x98 ABC/Pareto, e10 weekly
retention): n=3 runs at 10x/20x replica corpora, same protocol as
quiet_bench_r9e (entity key spaces shifted per replica so per-entity
series stay constant while entity counts grow; xxhash64 forcing).

Design claim: each query is one fact pass + dimension-sized windows,
so slope <= ~2.0 per 2x. Part stays UNREPLICATED (x97 joins it as the
left dim; replica partkeys fall out of the left join, but the
fact-side aggregate — the scale term — still processes every row).

MUST run with no concurrent Spark work. Merges results into
BENCH_QUIET_r10.json. Usage: python tools/quiet_bench_r10_wh.py
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
N_SCALE = 3
SCALE_QUERIES = (
    "x96_cohort_ltv",
    "x97_inventory_aging",
    "x98_abc_pareto",
    "e10_weekly_retention",
    "x102_new_vs_returning",
    "x103_interpurchase_gaps",
)


def _force(df) -> float:
    from pyspark.sql import functions as F

    t0 = time.perf_counter()
    df.agg(F.sum(F.pmod(F.xxhash64(*df.columns), F.lit(1_000_003)))).collect()
    return time.perf_counter() - t0


def main() -> None:
    from pyspark.sql import SparkSession

    from etl_spark.registry import all_specs
    from tools.quiet_bench_r9e import _build

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
            "r10 warehouse-analytics quiet scale (x96-x98, e10): r9e "
            "replica protocol, n=3, xxhash64-forced; part dim "
            "unreplicated (fact-side aggregate is the scale term)."
        )
    }
    for replicas in (10, 20):
        tmp = _build(spark, replicas)
        shutil.copy(f"{SF_DIR}/part.parquet", f"{tmp}/part.parquet")
        sec: dict = {"replicas": replicas}
        for name in SCALE_QUERIES:
            runs = []
            for _ in range(N_SCALE):
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
        for n in SCALE_QUERIES
    }
    path = os.path.join(REPO, "BENCH_QUIET_r10.json")
    out = json.load(open(path)) if os.path.exists(path) else {}
    out["warehouse_analytics_r10"] = section
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(section["slope_20x_over_10x"]))
    print("wrote", path)
    spark.stop()


if __name__ == "__main__":
    main()

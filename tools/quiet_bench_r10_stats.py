"""Quiet-host scale evidence for the r10 late batch (x109-x117,
e12/e13): n=3 runs at 10x/20x replica corpora, same protocol as
quiet_bench_r9e (entity key spaces shifted per replica so per-entity
series stay constant while entity counts grow; xxhash64 forcing).

Design claims per query (slope per 2x <= ~2.0 unless noted):
- x109/x114: one fact aggregate into bounded sketch state (registers /
  bitmap chunks) -> scan-term slope.
- x110: one scan, 1-row aggregate -> scan-term slope.
- x111/x116: fact aggregate to a days-sized series; windows run over
  the SERIES (days don't grow with replicas), so the window term is
  flat and the scan term dominates.
- x112: two group-keyed exact medians (per-group sorts) + broadcast
  joins back -> sort term n log n, slope slightly above 2.
- x115: per-basket pair gen (baskets identical per replica) + degree-
  oriented wedge joins; edges grow linearly in replicas.
- x117: frontier joins against a linearly-growing edge list.
- e12/e13: one user-keyed window Exchange + tiny aggregate.

MUST run with no concurrent Spark work. Merges results into
BENCH_QUIET_r10.json per-query (an argv subset re-measures only those
queries and leaves the rest of the section intact).
Usage: python tools/quiet_bench_r10_stats.py [query ...]
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
DEFAULT_QUERIES = (
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
    names = tuple(sys.argv[1:]) or DEFAULT_QUERIES

    section: dict = {
        "note": (
            "r10 late-batch quiet scale (x109-x117, e12/e13): r9e "
            "replica protocol (events/orders/lineitem replicated with "
            "shifted entity keys), n=3, xxhash64-forced."
        )
    }
    for replicas in (10, 20):
        tmp = _build(spark, replicas)
        # x118 joins customer (inner) + nation: replicate customer with
        # the SAME key shift as orders (an unreplicated dim would drop
        # every shifted order and the test would measure nothing);
        # nation is genuinely dimension-sized and copies as-is.
        from pyspark.sql import functions as F

        from tools.quiet_bench_r9e import SHIFT

        cust = spark.read.parquet(f"{SF_DIR}/customer.parquet")
        reps = spark.range(replicas).select(F.col("id").alias("rep"))
        (
            cust.crossJoin(reps)
            .select(
                (F.col("c_custkey") + F.col("rep") * SHIFT).alias("c_custkey"),
                *[c for c in cust.columns if c != "c_custkey"],
            )
            .write.mode("overwrite")
            .parquet(f"{tmp}/customer.parquet")
        )
        shutil.copy(f"{SF_DIR}/nation.parquet", f"{tmp}/nation.parquet")
        sec: dict = {"replicas": replicas}
        for name in names:
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
        for n in names
    }
    path = os.path.join(REPO, "BENCH_QUIET_r10.json")
    out = json.load(open(path)) if os.path.exists(path) else {}
    prev = out.get("late_batch_r10")
    if prev:  # merge per-query so subset runs keep earlier evidence
        for lvl in ("scale_10x", "scale_20x", "slope_20x_over_10x"):
            section[lvl] = {**prev.get(lvl, {}), **section[lvl]}
        for extra in set(prev) - set(section):
            section[extra] = prev[extra]
    out["late_batch_r10"] = section
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(section["slope_20x_over_10x"]))
    print("wrote", path)
    spark.stop()


if __name__ == "__main__":
    main()

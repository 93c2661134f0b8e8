"""Quiet-host scale evidence for the r9 business-analytics additions
(e09 EWMA, x91 state history, x92 basket lift, x93 RFM, x94 growth):
n>=3 at 10x/20x the sf0.1 fixture, slopes per 2x data.

All five are one-aggregate-plus-small-window shapes, so the design
claim is the linear scan term only (slope ~<= 2.0). Replicas shift
the entity key spaces (users/customers/orders) so per-entity series
lengths stay constant while entity counts grow x replicas — the axis
these operators group or window on.

MUST run with no concurrent Spark work. Writes BENCH_QUIET_r09e.json.
Usage: python tools/quiet_bench_r9e.py
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

SCALE_QUERIES = (
    "e09_ewma_spike",
    "x91_priority_history",
    "x92_copurchase_lift",
    "x93_rfm_segments",
    "x94_mom_revenue_growth",
)


def _force(df) -> float:
    from pyspark.sql import functions as F

    t0 = time.perf_counter()
    df.agg(F.sum(F.pmod(F.xxhash64(*df.columns), F.lit(1_000_003)))).collect()
    return time.perf_counter() - t0


def _build(spark, replicas: int) -> str:
    from pyspark.sql import functions as F

    tmp = tempfile.mkdtemp(prefix=f"quiet_r9e_{replicas}x_")
    reps = spark.range(replicas).select(F.col("id").alias("rep"))

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    (
        ev.crossJoin(reps)
        .select(
            (F.col("event_id") + F.col("rep") * SHIFT).alias("event_id"),
            "ts",
            (F.col("user_id") + F.col("rep") * SHIFT).alias("user_id"),
            "event_type",
            "value",
            "props",
        )
        .write.mode("overwrite")
        .parquet(f"{tmp}/events.parquet")
    )

    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    (
        orders.crossJoin(reps)
        .select(
            (F.col("o_orderkey") + F.col("rep") * SHIFT).alias("o_orderkey"),
            (F.col("o_custkey") + F.col("rep") * SHIFT).alias("o_custkey"),
            *[c for c in orders.columns if c not in ("o_orderkey", "o_custkey")],
        )
        .write.mode("overwrite")
        .parquet(f"{tmp}/orders.parquet")
    )

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    (
        li.crossJoin(reps)
        .select(
            (F.col("l_orderkey") + F.col("rep") * SHIFT).alias("l_orderkey"),
            (F.col("l_partkey") + F.col("rep") * SHIFT).alias("l_partkey"),
            *[c for c in li.columns if c not in ("l_orderkey", "l_partkey")],
        )
        .write.mode("overwrite")
        .parquet(f"{tmp}/lineitem.parquet")
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

    out: dict = {
        "note": (
            "Quiet-host scale evidence for the r9 business-analytics "
            "queries: n=3 per replica level, forced with "
            "agg(sum(xxhash64(*cols))). Entity key spaces shifted per "
            "replica so per-entity series stay constant while entity "
            "counts grow — the grouping/window axis. Design claim: one "
            "aggregate + dimension-sized windows => slope ~<= 2.0."
        ),
        "sf": 0.1,
        "cpus": int(CPUS),
    }
    for replicas in (10, 20):
        tmp = _build(spark, replicas)
        sec: dict = {"replicas": replicas}
        for name in SCALE_QUERIES:
            runs = []
            for _ in range(N_SCALE):
                runs.append(round(_force(specs[name].fn(spark, tmp)), 3))
                spark.catalog.clearCache()
            sec[name] = {"best": min(runs), "all": runs}
            print(f"{replicas}x {name}: {runs}", flush=True)
        out[f"scale_{replicas}x"] = sec
        shutil.rmtree(tmp, ignore_errors=True)

    out["slope_20x_over_10x"] = {
        n: round(out["scale_20x"][n]["best"] / out["scale_10x"][n]["best"], 2)
        for n in SCALE_QUERIES
    }
    path = os.path.join(REPO, "BENCH_QUIET_r09e.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out["slope_20x_over_10x"]))
    print("wrote", path)
    spark.stop()


if __name__ == "__main__":
    main()

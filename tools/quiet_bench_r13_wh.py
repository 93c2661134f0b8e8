"""Quiet-host scale evidence for the r13 warehouse KPIs (x133 ABC
migration, x134 discount leakage, x135 seasonality shift): n=3 runs
at 10x/20x replica corpora, the r9e/r12_wh protocol (entity key
spaces shifted per replica, xxhash64 forcing, no concurrent Spark
work). Unlike r12_wh, PART is replicated WITH SHIFTED p_partkey —
x133 classes parts per year and x134 joins lineitem->part on
l_partkey, so the part dimension must grow with the fact replicas or
the joined/classed work silently shrinks to 1/replicas.

Design claim: x133 is one (yr, part)-keyed fact aggregate + per-year
dimension windows + a dimension self-join; x134 is one fact scan +
broadcast dim join + (yr, mo, brand) aggregate; x135 is one fact pass
to a months-sized table — slope <= ~2.0 per 2x for all three.

Merges results into BENCH_QUIET_r13.json.
Usage: python tools/quiet_bench_r13_wh.py
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
    "x133_abc_migration",
    "x134_discount_leakage",
    "x135_seasonality_shift",
)


def _force(df) -> float:
    from pyspark.sql import functions as F

    t0 = time.perf_counter()
    df.agg(F.sum(F.pmod(F.xxhash64(*df.columns), F.lit(1_000_003)))).collect()
    return time.perf_counter() - t0


def _build(spark, replicas: int) -> str:
    from pyspark.sql import functions as F

    tmp = tempfile.mkdtemp(prefix=f"quiet_r13wh_{replicas}x_")
    reps = spark.range(replicas).select(F.col("id").alias("rep"))

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

    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    (
        orders.crossJoin(reps)
        .select(
            (F.col("o_orderkey") + F.col("rep") * SHIFT).alias("o_orderkey"),
            (F.col("o_custkey") + F.col("rep") * SHIFT).alias("o_custkey"),
            *[
                c
                for c in orders.columns
                if c not in ("o_orderkey", "o_custkey")
            ],
        )
        .write.mode("overwrite")
        .parquet(f"{tmp}/orders.parquet")
    )

    part = spark.read.parquet(f"{SF_DIR}/part.parquet")
    (
        part.crossJoin(reps)
        .select(
            (F.col("p_partkey") + F.col("rep") * SHIFT).alias("p_partkey"),
            *[c for c in part.columns if c != "p_partkey"],
        )
        .write.mode("overwrite")
        .parquet(f"{tmp}/part.parquet")
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
            "r13 warehouse KPIs quiet scale (x133/x134/x135): r9e "
            "replica protocol, n=3, xxhash64-forced; part replicated "
            "with shifted keys (x133/x134 group/join on partkey)."
        ),
        "loadavg_at_start": open("/proc/loadavg").read().split()[0],
    }
    for replicas in (10, 20):
        tmp = _build(spark, replicas)
        for dim in ("supplier", "nation", "customer", "region"):
            shutil.copy(f"{SF_DIR}/{dim}.parquet", f"{tmp}/{dim}.parquet")
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
    path = os.path.join(REPO, "BENCH_QUIET_r13.json")
    out = json.load(open(path)) if os.path.exists(path) else {}
    out["warehouse_kpis_r13"] = section
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(section["slope_20x_over_10x"]))
    print("wrote", path)
    spark.stop()


if __name__ == "__main__":
    main()

"""Quiet-host scale evidence for the r12 warehouse KPIs (x129 churn
transition matrix, x130 supplier OTIF trend, x131 revenue bridge):
n=3 runs at 10x/20x replica corpora, the r9e/r11_wh protocol (entity
key spaces shifted per replica, xxhash64 forcing, no concurrent Spark
work). supplier/customer stay UNREPLICATED dims.

Design claim: x129 is one fact-keyed Exchange + a <=12-row matrix;
x130 is one orderkey SMJ Exchange + one suppkey Exchange shared by
rollup and window; x131 is one month-keyed agg + an 80-row lag window
— slope <= ~2.0 per 2x for all three.

Merges results into BENCH_QUIET_r12.json.
Usage: python tools/quiet_bench_r12_wh.py
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
    "x129_churn_transition_matrix",
    "x130_supplier_otif_trend",
    "x131_revenue_bridge",
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
            "r12 warehouse KPIs quiet scale (x129/x130/x131): r9e "
            "replica protocol, n=3, xxhash64-forced; supplier/"
            "customer unreplicated dims."
        )
    }
    for replicas in (10, 20):
        tmp = _build(spark, replicas)
        for dim in ("part", "supplier", "nation", "customer", "region"):
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
    path = os.path.join(REPO, "BENCH_QUIET_r12.json")
    out = json.load(open(path)) if os.path.exists(path) else {}
    out["warehouse_kpis_r12"] = section
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(section["slope_20x_over_10x"]))
    print("wrote", path)
    spark.stop()


if __name__ == "__main__":
    main()

"""Quiet-host scale evidence for the r11 warehouse KPIs + session rollup (x122
order-to-cash cycle, x123 supplier scorecard, x124 OTIF fill rate):
n=3 runs at 10x/20x replica corpora, the r9e/r10_wh protocol (entity
key spaces shifted per replica, xxhash64 forcing, no concurrent Spark
work). supplier/nation/customer stay UNREPLICATED dims (x123's
per-supplier series grows with the corpus — the fact aggregate is the
scale term either way).

Design claim: each query is one fact-keyed Exchange + a months- or
suppliers-sized rollup, so slope <= ~2.0 per 2x.

Merges results into BENCH_QUIET_r11.json.
Usage: python tools/quiet_bench_r11_wh.py
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
    "x122_order_to_cash_cycle",
    "x123_supplier_scorecard",
    "x124_otif_fill_rate",
    "e15_session_duration_daily",
    "x125_priority_mix_shift",
    "x126_sla_histogram_percentiles",
    "x127_customer_churn_buckets",
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
            "r11 warehouse KPIs + session rollup quiet scale (x122-x125, e15): r9e replica "
            "protocol, n=3, xxhash64-forced; supplier/nation/customer "
            "unreplicated dims."
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
    path = os.path.join(REPO, "BENCH_QUIET_r11.json")
    out = json.load(open(path)) if os.path.exists(path) else {}
    out["warehouse_kpis_r11"] = section
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(section["slope_20x_over_10x"]))
    print("wrote", path)
    spark.stop()


if __name__ == "__main__":
    main()

"""Quiet-host scale evidence for the r13 late registrations (e16
error-budget burn, x138 supplier HHI): n=3 runs at 10x/20x replica
corpora via the r9e builder (events replicated with shifted user_id —
days stay 30, per-day volume grows; lineitem replicated with UNSHIFTED
l_suppkey — the supplier market structure stays fixed while fact
volume grows, exactly the axis x138 aggregates over).

Design claim: e16 is one fact pass to a 30-row aggregate + two
30-row windows; x138 is one broadcast-dim fact aggregate + supplier-
dimension windows — slope <= ~2.0 per 2x for both.

Merges results into BENCH_QUIET_r13.json.
Usage: python tools/quiet_bench_r13b.py
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
SCALE_QUERIES = ("e16_error_budget_burn", "x138_supplier_hhi")


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
            "r13 late registrations quiet scale (e16/x138): r9e "
            "replica protocol, n=3, xxhash64-forced; supplier dim "
            "unreplicated and l_suppkey unshifted (fixed market "
            "structure, growing fact volume)."
        ),
        "loadavg_at_start": open("/proc/loadavg").read().split()[0],
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
    path = os.path.join(REPO, "BENCH_QUIET_r13.json")
    out = json.load(open(path)) if os.path.exists(path) else {}
    out["late_kpis_r13"] = section
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(section["slope_20x_over_10x"]))
    print("wrote", path)
    spark.stop()


if __name__ == "__main__":
    main()

"""File-skipping at scale — quiet evidence for VERDICT r14 #4.

The 16-file x141 fixture proves the pruned-scan identity; the SCALE
claim (~n_files^(1-1/d) files kept under z-ordering, i.e. the KEPT
FRACTION falls as the file count grows) was argued, not measured.
This harness replicates ``orders`` (sf0.1) at 1x/10x/20x, lays each
corpus out twice —

- ``linear``: range-clustered on o_custkey ONLY (write_clustered) —
  the one-column layout that makes zone maps maximally selective on
  custkey and provably useless on the uncorrelated o_totalprice;
- ``zorder``: z-ordered on (o_custkey, o_totalprice)
  (write_zordered, d=2) — the layout that spends the budget evenly

— with n_files = 16 * replicas, builds the Bloom index (o_custkey)
and zone map (both columns) on each, and records for the three x141
probes (custkey equality via Bloom, custkey range and totalprice
range via zone map):

- files kept / files total (the pruning fraction, per layout), and
- best-of-N wall for the PRUNED scan vs the FULL filtered scan.

Expected shape: on ``zorder`` both columns' kept fractions fall
roughly as (16R)^(-1/2); on ``linear`` the custkey fraction falls
faster (d=1) while totalprice stays pinned at ~1.0 — the measured
reason multi-predicate workloads pay for Morton layout.

MUST run quiet (no concurrent Spark work); loadavg recorded in the
payload per the quiet-bench protocol. Merges into
BENCH_QUIET_r15.json.  Usage:
    python tools/quiet_bench_r15_skip.py
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
N_RUNS = 3
BASE_FILES = 16
SHIFT = 10_000_000
PRICE_LO, PRICE_HI = 1000.0, 20000.0
CUSTKEY_LO, CUSTKEY_HI = 100.0, 200.0


def _force(df) -> float:
    from pyspark.sql import functions as F

    t0 = time.perf_counter()
    df.agg(F.sum(F.pmod(F.xxhash64(*df.columns), F.lit(1_000_003)))).collect()
    return time.perf_counter() - t0


def _runs(fn, n=N_RUNS):
    out = [round(_force(fn()), 3) for _ in range(n)]
    return {"best": min(out), "all": out}


def _build_replicated_orders(spark, replicas: int) -> str:
    """orders replicated with orderkeys shifted per replica; custkey
    and totalprice keep their ORIGINAL distributions, so the probes
    stay equally selective by value while the file count grows —
    isolating the layout variable."""
    from pyspark.sql import functions as F

    tmp = tempfile.mkdtemp(prefix=f"quiet_r15skip_{replicas}x_")
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    reps = spark.range(replicas).select(F.col("id").alias("rep"))
    (
        orders.crossJoin(reps)
        .select(
            (F.col("o_orderkey") + F.col("rep") * SHIFT).alias("o_orderkey"),
            "o_custkey",
            "o_orderstatus",
            "o_totalprice",
            "o_orderdate",
            "o_orderpriority",
        )
        .write.mode("overwrite")
        .parquet(f"{tmp}/orders.parquet")
    )
    return tmp


def _measure_layout(spark, src_parquet: str, layout: str, n_files: int, root: str):
    from pyspark.sql import functions as F

    from etl_spark.sources.bloomindex import (
        bloom_pruned_files,
        bloom_scan,
        write_bloom_index,
    )
    from etl_spark.sources.zonemap import (
        pruned_files,
        write_clustered,
        write_zonemap,
        write_zordered,
        zonemap_scan,
    )

    table = os.path.join(root, f"orders_{layout}")
    bloom = os.path.join(root, f"bloom_{layout}")
    zmap = os.path.join(root, f"zonemap_{layout}")
    df = spark.read.parquet(src_parquet)
    t0 = time.perf_counter()
    if layout == "zorder":
        write_zordered(df, table, ["o_custkey", "o_totalprice"], n_files)
    else:
        write_clustered(df, table, "o_custkey", n_files)
    layout_sec = round(time.perf_counter() - t0, 3)
    write_bloom_index(spark, table, ["o_custkey"], bloom, m_bits=1 << 19)
    write_zonemap(spark, table, ["o_custkey", "o_totalprice"], zmap)

    ck = int(df.agg(F.min("o_custkey")).first()[0])
    kept_eq, total = bloom_pruned_files(spark, bloom, "o_custkey", ck)
    kept_ck, _ = pruned_files(spark, zmap, "o_custkey", CUSTKEY_LO, CUSTKEY_HI)
    kept_pr, _ = pruned_files(spark, zmap, "o_totalprice", PRICE_LO, PRICE_HI)

    out = {
        "layout_write_sec": layout_sec,
        "files_total": total,
        "bloom_eq_kept": len(kept_eq),
        "zm_custkey_range_kept": len(kept_ck),
        "zm_price_range_kept": len(kept_pr),
        "frac_bloom_eq": round(len(kept_eq) / total, 3),
        "frac_custkey_range": round(len(kept_ck) / total, 3),
        "frac_price_range": round(len(kept_pr) / total, 3),
        "pruned_scan_price": _runs(
            lambda: zonemap_scan(
                spark, table, zmap, "o_totalprice", PRICE_LO, PRICE_HI
            )
        ),
        "full_scan_price": _runs(
            lambda: spark.read.parquet(table).filter(
                F.col("o_totalprice").between(PRICE_LO, PRICE_HI)
            )
        ),
        "pruned_scan_custkey_eq": _runs(
            lambda: bloom_scan(spark, table, bloom, "o_custkey", ck)
        ),
        "full_scan_custkey_eq": _runs(
            lambda: spark.read.parquet(table).filter(F.col("o_custkey") == ck)
        ),
    }
    # identity audit on every (scale, layout): pruned == full, exact
    pruned_n = (
        zonemap_scan(spark, table, zmap, "o_totalprice", PRICE_LO, PRICE_HI)
        .count()
    )
    full_n = (
        spark.read.parquet(table)
        .filter(F.col("o_totalprice").between(PRICE_LO, PRICE_HI))
        .count()
    )
    assert pruned_n == full_n, (layout, pruned_n, full_n)
    out["identity_rows"] = pruned_n
    return out


def main() -> None:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    out: dict = {
        "skip_note": (
            "File-skipping scale evidence (VERDICT r14 #4): orders sf0.1 "
            "replicated 1x/10x/20x, n_files = 16*R, linear (custkey range "
            "clustering) vs zorder (custkey x totalprice Morton) layouts; "
            "kept fractions + pruned-vs-full scan wall, n=3 best-of, "
            "xxhash64-forced, identity audited at every cell."
        ),
        "loadavg_at_start": os.getloadavg(),
    }
    sec: dict = {}
    for replicas in (1, 10, 20):
        tmp = _build_replicated_orders(spark, replicas)
        level: dict = {
            "n_rows": spark.read.parquet(f"{tmp}/orders.parquet").count(),
            "n_files": BASE_FILES * replicas,
        }
        for layout in ("linear", "zorder"):
            level[layout] = _measure_layout(
                spark, f"{tmp}/orders.parquet", layout,
                BASE_FILES * replicas, tmp,
            )
            print(
                f"{replicas}x {layout}: fracs eq={level[layout]['frac_bloom_eq']}"
                f" ck={level[layout]['frac_custkey_range']}"
                f" pr={level[layout]['frac_price_range']}",
                flush=True,
            )
        sec[f"{replicas}x"] = level
        shutil.rmtree(tmp, ignore_errors=True)
    # headline derived numbers: kept-fraction trajectory per predicate
    for layout in ("linear", "zorder"):
        for key in ("frac_bloom_eq", "frac_custkey_range", "frac_price_range"):
            sec[f"{layout}_{key}_1x_10x_20x"] = [
                sec["1x"][layout][key],
                sec["10x"][layout][key],
                sec["20x"][layout][key],
            ]
    out["skipping_scale"] = sec
    out["loadavg_at_end"] = os.getloadavg()

    path = os.path.join(REPO, "BENCH_QUIET_r15.json")
    merged = json.load(open(path)) if os.path.exists(path) else {}
    merged.update(out)
    with open(path, "w") as fh:
        json.dump(merged, fh, indent=1)
        fh.write("\n")
    print(f"merged into {path}")
    spark.stop()


if __name__ == "__main__":
    main()

"""Quiet-host scale evidence for the r9b family (x84-x87): n>=3 runs
at 10x/20x the sf0.1 fixture, slopes per 2x data.

Design claims under measurement:
- x84 bloom prune: build aggregate and probe filter are both linear;
  bloom_prune_auto RE-SIZES the bitmap from the build count, so the
  filter keeps pruning instead of saturating as qualifying keys grow
  x replicas (a fixed bitmap would quietly degrade to a no-op).
- x85 PageRank: replicas are DISJOINT graph copies (every key space
  shifted), so |V| and |E| grow x replicas and each of the 3 rounds
  is one linear join + one linear aggregate => slope ~2.
- x86 fuzzy match: replicas are CAESAR-ROTATED part names — rotation
  is a character bijection, so within-replica edit distances (and the
  24 matching pairs) are preserved exactly while rotated q-grams are
  disjoint across replicas: the inverted gram index grows x replicas
  with NO cross-replica candidates (tag/suffix schemes would create
  genuinely quadratic cross-replica matches and measure output
  growth, not the operator).
- x87 profile: one wide aggregate over orders grown x replicas, the
  exact-distinct shuffle being the dominant linear term.

MUST run with no concurrent Spark work (bench isolation). Forcing:
agg(sum(pmod(xxhash64(*cols)))) so no output column prunes.

Writes BENCH_QUIET_r09b.json. Usage:
    python tools/quiet_bench_r9b.py
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

SCALE_QUERIES = (
    "x84_bloom_join_prune",
    "x85_pagerank_trade_graph",
    "x86_fuzzy_name_match",
    "x87_table_profile",
)
N_SCALE = 3
SHIFT = 10_000_000
ALPHA = "abcdefghijklmnopqrstuvwxyz"


def _force(df) -> float:
    from pyspark.sql import functions as F

    t0 = time.perf_counter()
    df.agg(F.sum(F.pmod(F.xxhash64(*df.columns), F.lit(1_000_003)))).collect()
    return time.perf_counter() - t0


def _build_scaled(spark, sf_dir: str, replicas: int) -> str:
    from pyspark.sql import functions as F

    tmp = tempfile.mkdtemp(prefix=f"quiet_r9b_{replicas}x_")
    reps = spark.range(replicas).select(F.col("id").alias("rep"))

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
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

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    (
        li.crossJoin(reps)
        .select(
            (F.col("l_orderkey") + F.col("rep") * SHIFT).alias("l_orderkey"),
            (F.col("l_suppkey") + F.col("rep") * SHIFT).alias("l_suppkey"),
            *[c for c in li.columns if c not in ("l_orderkey", "l_suppkey")],
        )
        .write.mode("overwrite")
        .parquet(f"{tmp}/lineitem.parquet")
    )

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    (
        cust.crossJoin(reps)
        .select(
            (F.col("c_custkey") + F.col("rep") * SHIFT).alias("c_custkey"),
            *[c for c in cust.columns if c != "c_custkey"],
        )
        .write.mode("overwrite")
        .parquet(f"{tmp}/customer.parquet")
    )

    # Caesar-rotate part names per replica: a char bijection preserves
    # every within-replica edit distance while making cross-replica
    # q-grams disjoint (see module docstring)
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    rot = F.when(F.lit(False), F.col("p_name"))
    for r in range(replicas):
        rotated = ALPHA[r % 26 :] + ALPHA[: r % 26]
        rot = rot.when(F.col("rep") == r, F.translate(F.col("p_name"), ALPHA, rotated))
    (
        part.crossJoin(reps)
        .select(
            (F.col("p_partkey") + F.col("rep") * SHIFT).alias("p_partkey"),
            rot.alias("p_name"),
            *[c for c in part.columns if c not in ("p_partkey", "p_name")],
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

    out: dict = {
        "note": (
            "Quiet-host scale evidence for the r9b family (bloom prune, "
            "fixed-point PageRank, q-gram fuzzy match, single-scan "
            "profile): no concurrent Spark work, n=3 per query per "
            "replica level, forced with agg(sum(xxhash64(*cols))). All "
            "key spaces shifted per replica (disjoint graph copies, "
            "growing qualifying-key sets); part names Caesar-rotated so "
            "the fuzzy vocabulary grows with zero cross-replica matches."
        ),
        "sf": 0.1,
        "cpus": int(CPUS),
    }

    for replicas in (10, 20):
        tmp = _build_scaled(spark, SF_DIR, replicas)
        sec: dict = {
            "replicas": replicas,
            "n_orders": spark.read.parquet(f"{tmp}/orders.parquet").count(),
            "n_lineitem": spark.read.parquet(f"{tmp}/lineitem.parquet").count(),
            "n_parts": spark.read.parquet(f"{tmp}/part.parquet").count(),
        }
        for name in SCALE_QUERIES:
            runs = []
            for _ in range(N_SCALE):
                runs.append(round(_force(specs[name].fn(spark, tmp)), 3))
                spark.catalog.clearCache()
            sec[name] = {"best": min(runs), "all": runs}
            print(f"{replicas}x {name}: {runs}", flush=True)
        out[f"scale_{replicas}x"] = sec
        shutil.rmtree(tmp, ignore_errors=True)

    slopes = {}
    for name in SCALE_QUERIES:
        b10 = out["scale_10x"][name]["best"]
        b20 = out["scale_20x"][name]["best"]
        slopes[name] = round(b20 / b10, 2) if b10 else None
    out["slope_20x_over_10x"] = slopes

    path = os.path.join(REPO, "BENCH_QUIET_r09b.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out["slope_20x_over_10x"]))
    print("wrote", path)
    spark.stop()


if __name__ == "__main__":
    main()

"""Quiet-host scale evidence for the r9 sketch/sample/index family
(x76-x83): n>=3 runs at 10x/20x the sf0.1 fixture, slopes per 2x data.

The family's design claim is that every member's shuffle is bounded
(K rows per group / D*W cells / candidate supersets / top-K+1 rows /
posting aggregates) while the scan is linear — so wall-clock slope
per 2x data should sit near 2.0, NOT the n^1.5 the IVF quantizer tier
legitimately pays (BENCH_QUIET_r08.json).

Replica construction scales the axes that matter per query:
- orders: o_orderkey AND o_custkey shifted per replica => per-year
  DISTINCT customers grow ~x replicas (x76/x77's estimated quantity)
  and the x78 sample pool grows x replicas;
- lineitem: l_orderkey shifted (identity), prices untouched => x80's
  population and subset sums grow x replicas;
- documents: the bench's token-shifted construction => vocabulary
  grows x replicas (the x79/x81 long tail) while per-token frequency
  shares stay constant (heavy hitters stay heavy).

MUST run with no concurrent Spark work (bench isolation — contention
fakes super-linear slopes). Forcing: agg(sum(pmod(xxhash64(*cols))))
so no output column prunes (count() times hollow plans).

Writes BENCH_QUIET_r{N}.json. Usage:
    python tools/quiet_bench_sketch.py --round 9
"""

from __future__ import annotations

import argparse
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
    "x76_kmv_distinct_customers",
    "x77_kmv_year_overlap",
    "x78_bottomk_sample_quantiles",
    "x79_token_heavy_hitters",
    "x80_priority_sample_revenue",
    "x81_countmin_token_freq",
    "x82_cms_merge_estimates",
    "x83_boolean_token_search",
)
N_SCALE = 3
SHIFT = 10_000_000


def _force(df) -> float:
    from pyspark.sql import functions as F

    t0 = time.perf_counter()
    df.agg(F.sum(F.pmod(F.xxhash64(*df.columns), F.lit(1_000_003)))).collect()
    return time.perf_counter() - t0


def _build_scaled(spark, sf_dir: str, replicas: int) -> str:
    from pyspark.sql import functions as F

    from etl_spark.extensions.textstats import _STOPWORDS, _sql_list

    tmp = tempfile.mkdtemp(prefix=f"quiet_sketch{replicas}x_")
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
            *[c for c in li.columns if c != "l_orderkey"],
        )
        .write.mode("overwrite")
        .parquet(f"{tmp}/lineitem.parquet")
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    (
        docs.crossJoin(reps)
        .select(
            (F.col("doc_id") + F.col("rep") * SHIFT).alias("doc_id"),
            F.concat_ws(
                " ",
                F.expr(
                    "transform(split(text, ' '), t -> "
                    f"IF(t IN ({_sql_list(_STOPWORDS)}), t, concat(t, '·', rep)))"
                ),
            ).alias("text"),
            "lang",
            "source",
            "n_chars",
        )
        .write.mode("overwrite")
        .parquet(f"{tmp}/documents.parquet")
    )
    return tmp


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, required=True)
    args = ap.parse_args()

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
            "Quiet-host scale evidence for the r9 sketch/sample/index "
            "family: no concurrent Spark work, n=3 per query per replica "
            "level, forced with agg(sum(xxhash64(*cols))). orders/lineitem "
            "replicated with shifted keys (distinct customers and sample "
            "pools grow x replicas), documents token-shifted (vocabulary "
            "grows x replicas). Design claim: bounded-state plans => slope "
            "per 2x data ~= 2.0 (linear scan term only)."
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
            "n_docs": spark.read.parquet(f"{tmp}/documents.parquet").count(),
        }
        for name in SCALE_QUERIES:
            if name == "x83_boolean_token_search":
                # the token-shift renames the registered QUERY_TOKENS,
                # so probe with the shared (unshifted) stopwords that
                # survive at scale — the search phase then does real
                # matching work instead of returning empty
                from etl_spark.extensions.textindex import boolean_search, postings

                def _run(s=spark, t=tmp):
                    docs = s.read.parquet(f"{t}/documents.parquet")
                    return boolean_search(postings(docs), ("the", "a"))

            else:

                def _run(s=spark, t=tmp, n=name):
                    return specs[n].fn(s, t)

            runs = []
            for _ in range(N_SCALE):
                runs.append(round(_force(_run()), 3))
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

    path = os.path.join(REPO, f"BENCH_QUIET_r{args.round:02d}.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out["slope_20x_over_10x"]))
    print("wrote", path)
    spark.stop()


if __name__ == "__main__":
    main()

"""Quiet-host scale evidence for x89 (substring-dup coverage) and
x90 (entity clusters): n>=3 runs at 10x/20x the sf0.1 fixture.

Axes: documents token-shifted per replica (the quiet_bench_sketch
construction — vocabulary and window space grow x replicas while
each replica keeps the original dup-span structure; a window is
shared across replicas only if all 5 tokens are stopwords, so the
window index grows linearly with no cross-replica blowup); part
names Caesar-rotated per replica (the quiet_bench_r9b construction —
edit distances preserved within a replica, q-grams disjoint across).

MUST run with no concurrent Spark work. Writes BENCH_QUIET_r09d.json.
Usage: python tools/quiet_bench_r9d.py
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
ALPHA = "abcdefghijklmnopqrstuvwxyz"


def _force(df) -> float:
    from pyspark.sql import functions as F

    t0 = time.perf_counter()
    df.agg(F.sum(F.pmod(F.xxhash64(*df.columns), F.lit(1_000_003)))).collect()
    return time.perf_counter() - t0


def _build(spark, replicas: int) -> str:
    from pyspark.sql import functions as F

    from etl_spark.extensions.textstats import _STOPWORDS, _sql_list

    tmp = tempfile.mkdtemp(prefix=f"quiet_r9d_{replicas}x_")
    reps = spark.range(replicas).select(F.col("id").alias("rep"))

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
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

    part = spark.read.parquet(f"{SF_DIR}/part.parquet")
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
    names = ("x89_substring_dup_coverage", "x90_entity_clusters")

    out: dict = {
        "note": (
            "Quiet-host scale evidence for x89/x90: n=3 per replica "
            "level, forced with agg(sum(xxhash64(*cols))). Documents "
            "token-shifted (window space grows x replicas, dup spans "
            "stay within-replica); part names Caesar-rotated (edit "
            "distances preserved, cross-replica grams disjoint)."
        ),
        "sf": 0.1,
        "cpus": int(CPUS),
    }
    for replicas in (10, 20):
        tmp = _build(spark, replicas)
        sec: dict = {
            "replicas": replicas,
            "n_docs": spark.read.parquet(f"{tmp}/documents.parquet").count(),
            "n_parts": spark.read.parquet(f"{tmp}/part.parquet").count(),
        }
        for name in names:
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
        for n in names
    }
    path = os.path.join(REPO, "BENCH_QUIET_r09d.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out["slope_20x_over_10x"]))
    print("wrote", path)
    spark.stop()


if __name__ == "__main__":
    main()

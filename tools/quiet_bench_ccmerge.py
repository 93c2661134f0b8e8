"""Quiet-host evidence for the incremental-CC claim (x88 /
cc_index_merge): absorbing a FIXED batch of edges into a stored label
index costs a near-flat scan of the label table (broadcast semi
filter, no corpus shuffle, no corpus fixpoint), while re-running the
full fixpoint — the only alternative — grows with corpus size and
round count. Synthetic corpus: N docs in 5-chains (N/5 components,
4N/5 edges); batch: 1000 deterministic cluster-fusing edges.

MUST run with no concurrent Spark work. Writes BENCH_QUIET_r09c.json.
Usage: python tools/quiet_bench_ccmerge.py
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

CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
SIZES = (2_000_000, 4_000_000)
BATCH = 1000
N_RUNS = 3


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from etl_spark.extensions.dedup import connected_components
    from etl_spark.extensions.graph import build_cc_index, cc_index_merge

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    out: dict = {
        "note": (
            "Quiet-host incremental-CC evidence: fixed 1000-edge batch "
            "merged into stored label indexes of growing size vs the "
            "full-fixpoint recompute. n=3 merges (fresh index copy per "
            "run), n=1 recompute (it is the slow path being avoided). "
            "Corpus: N docs in 5-chains; batch fuses cluster pairs."
        ),
        "cpus": int(CPUS),
        "batch_edges": BATCH,
    }

    def batch_edges(n: int):
        rows = [((5 * i * 997) % n, ((5 * i * 997) + 7) % n) for i in range(BATCH)]
        return spark.createDataFrame(
            [(a, b) for a, b in rows if a != b], "doc_a BIGINT, doc_b BIGINT"
        )

    for n in SIZES:
        labels = spark.range(n).select(
            F.col("id").alias("doc_id"),
            (F.col("id") - F.col("id") % 5).alias("lbl"),
        )
        merges = []
        for run in range(N_RUNS):
            path = tempfile.mkdtemp(prefix=f"ccq_{n}_{run}_")
            build_cc_index(labels, path)
            b = batch_edges(n)
            t0 = time.perf_counter()
            cc_index_merge(spark, path, b, 1)
            merges.append(round(time.perf_counter() - t0, 3))
            shutil.rmtree(path, ignore_errors=True)
        # the avoided alternative: full fixpoint over all edges
        chain = spark.range(n).filter(F.col("id") % 5 != 4).select(
            F.col("id").alias("doc_a"), (F.col("id") + 1).alias("doc_b")
        )
        all_edges = chain.unionByName(batch_edges(n))
        t0 = time.perf_counter()
        connected_components(all_edges).agg(
            F.sum(F.col("lbl").cast("decimal(38,0)"))
        ).collect()
        recompute = round(time.perf_counter() - t0, 3)
        out[f"n_{n}"] = {
            "merge_all": merges,
            "merge_best": min(merges),
            "full_recompute": recompute,
            "speedup": round(recompute / min(merges), 1),
        }
        print(f"{n}: merges={merges} recompute={recompute}", flush=True)

    s = [out[f"n_{n}"]["merge_best"] for n in SIZES]
    out["merge_slope_2x"] = round(s[1] / s[0], 2) if s[0] else None
    path = os.path.join(REPO, "BENCH_QUIET_r09c.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({"merge_slope_2x": out["merge_slope_2x"]}))
    print("wrote", path)
    spark.stop()


if __name__ == "__main__":
    main()

"""Phase-level profiling of the connected-components family (guide
§1: measure first). Times the x04 pair subtree, the CC loop (with
round count), and the downstream consumers, with noop-sink actions so
the computation is timed, not the collect. Run on a quiet host:

    python tools/profile_cc.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_spark.session import get_spark  # noqa: E402


def t(label, fn):
    t0 = time.perf_counter()
    out = fn()
    dt = time.perf_counter() - t0
    print(f"{dt:8.3f}s  {label}")
    return out


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="profile-cc")
    spark.sparkContext.setLogLevel("ERROR")

    from etl_spark.extensions.dedup import (
        connected_components,
        minhash_signatures,
        x04_minhash_lsh_pairs,
        x29_dup_clusters,
    )

    # warm
    t("warm: x04 pairs collect", lambda: x04_minhash_lsh_pairs(spark, sf).collect())
    spark.catalog.clearCache()

    t("sig (groupBy minhash) noop", lambda: noop(minhash_signatures(spark, sf)))
    t("x04 pairs noop", lambda: noop(x04_minhash_lsh_pairs(spark, sf)))
    t("x04 pairs noop (2nd)", lambda: noop(x04_minhash_lsh_pairs(spark, sf)))

    # CC loop with instrumented rounds
    import etl_spark.extensions.dedup as dd

    pairs = x04_minhash_lsh_pairs(spark, sf).select("doc_a", "doc_b")
    t0 = time.perf_counter()
    labels = connected_components(pairs)
    noop(labels)
    print(f"{time.perf_counter() - t0:8.3f}s  connected_components(pairs) + noop")
    spark.catalog.clearCache()

    t("x29 full collect", lambda: x29_dup_clusters(spark, sf).collect())
    spark.catalog.clearCache()
    t("x29 full collect (2nd)", lambda: x29_dup_clusters(spark, sf).collect())
    spark.catalog.clearCache()

    # planning-only cost: how long does Catalyst take to produce the
    # physical plan for the big composed queries?
    from etl_spark.extensions.pipeline import (
        x49_multimodal_curated,
    )

    df = x49_multimodal_curated(spark, sf)
    t0 = time.perf_counter()
    df.explain("formatted")
    print(f"{time.perf_counter() - t0:8.3f}s  x49 explain (plan only)")
    t("x49 collect", lambda: x49_multimodal_curated(spark, sf).collect())
    spark.catalog.clearCache()

    spark.stop()


if __name__ == "__main__":
    main()

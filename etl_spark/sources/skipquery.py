"""Registered data-skipping queries — the driver-gated face of the
file-skipping stack (sources/zonemap.py, sources/bloomindex.py).

VERDICT r14 #3: the r14 z-order/Bloom work was test-asserted only.
These queries put the skipping machinery under the driver's exact
oracle compare: the Spark side reads THROUGH ``bloom_scan`` /
``zonemap_scan`` over a z-ordered derived layout of ``orders``, and
the oracle is the plain filtered scan of the source table — the
pruned-scan == full-filtered-scan identity IS the module contract
(the same move x22 made for the sketch booleans), so a skipped file
that actually contained matching rows turns the driver row red.

The derived layout lives under the system temp dir, keyed by the
source file's identity (path + mtime + size), and is built at most
once per fixture generation: ``orders`` z-ordered on
(o_custkey, o_totalprice) into ``N_LAYOUT_FILES`` files, plus a
Bloom index on the equality column and a zone map on both. At 100 TB
the layout is the table's real partition layout and the indexes are
maintained incrementally (bloom_refresh / zonemap_refresh, exercised
in tests); file-count scaling of the pruning fraction is measured in
tools/quiet_bench_r15_skip.py.
"""

from __future__ import annotations

import hashlib
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_spark.registry import register
from etl_spark.sources.bloomindex import bloom_scan, write_bloom_index
from etl_spark.sources.zonemap import (
    write_zonemap,
    write_zordered,
    zonemap_scan,
)
from etl_spark.tables import load

N_LAYOUT_FILES = 16
ZORDER_BITS = 6
# price band the range path probes; custkey probe is MIN(o_custkey)
PRICE_LO, PRICE_HI = 1000.0, 20000.0


def _layout_root(sf: str) -> str:
    src = os.path.join(sf, "orders.parquet")
    tag = hashlib.md5(
        f"{os.path.abspath(sf)}:{os.path.getmtime(src)}:{os.path.getsize(src)}".encode()
    ).hexdigest()[:12]
    return os.path.join(tempfile.gettempdir(), f"etl_spark_skip_{tag}")


def ensure_skip_layout(spark: SparkSession, sf: str) -> tuple[str, str, str]:
    """Build (once per fixture generation) and return the z-ordered
    layout + its two file-skipping indexes:
    (table_path, bloom_index_path, zonemap_path). The marker file is
    written LAST, so a crashed build rebuilds from scratch."""
    root = _layout_root(sf)
    table = os.path.join(root, "orders_z")
    bloom = os.path.join(root, "bloom_idx")
    zmap = os.path.join(root, "zonemap")
    marker = os.path.join(root, "_LAYOUT_OK")
    # pre-r16 markers hold the bare string "ok" (no build_sec); treat
    # them as unbuilt ONCE so the rebuild records the cost the bench
    # must disclose (VERDICT r15 #8) — the marker path is mtime-keyed
    # per fixture generation, so this is a one-time migration
    rebuild = True
    if os.path.exists(marker):
        import json as _json

        try:
            with open(marker) as fh:
                rebuild = "build_sec" not in _json.load(fh)
        except Exception:
            rebuild = True
    if rebuild:
        import json
        import shutil
        import time

        shutil.rmtree(root, ignore_errors=True)
        os.makedirs(root, exist_ok=True)

        t0 = time.perf_counter()
        orders = load(spark, sf, "orders")
        write_zordered(
            orders, table, ["o_custkey", "o_totalprice"],
            N_LAYOUT_FILES, bits=ZORDER_BITS,
        )
        # m sized for the per-file row counts the sf fixtures produce
        # (<=40k rows/file at sf0.1) at ~1% fpp
        write_bloom_index(spark, table, ["o_custkey"], bloom, m_bits=1 << 19)
        write_zonemap(spark, table, ["o_custkey", "o_totalprice"], zmap)
        with open(marker, "w") as fh:
            # build cost is recorded so the bench can DISCLOSE it
            # (VERDICT r15 #8): x141's row times the pruned scans only
            # — layout+index build is declared maintenance, paid once
            # per fixture generation, reported via skip_stats
            json.dump(
                {"ok": True,
                 "build_sec": round(time.perf_counter() - t0, 3)},
                fh,
            )
    return table, bloom, zmap


def layout_build_sec(sf: str) -> float | None:
    """The one-time z-order+index build cost recorded by
    ``ensure_skip_layout`` for this fixture generation (None when the
    layout predates the marker format or is unbuilt)."""
    import json

    marker = os.path.join(_layout_root(sf), "_LAYOUT_OK")
    try:
        with open(marker) as fh:
            return json.load(fh).get("build_sec")
    except Exception:
        return None


def _path_agg(df: DataFrame, kind: str) -> DataFrame:
    return df.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.coalesce(F.sum("o_orderkey"), F.lit(0)).cast("bigint").alias("sum_okey"),
    ).select(F.lit(kind).alias("path_kind"), "n_rows", "sum_okey")


@register(
    "x141_skip_scan",
    oracle=f"""
        SELECT 'bloom_eq' AS path_kind,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(COALESCE(SUM(o_orderkey), 0) AS BIGINT) AS sum_okey
        FROM orders
        WHERE o_custkey = (SELECT MIN(o_custkey) FROM orders)
        UNION ALL
        SELECT 'zonemap_range' AS path_kind,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(COALESCE(SUM(o_orderkey), 0) AS BIGINT) AS sum_okey
        FROM orders
        WHERE o_totalprice BETWEEN {PRICE_LO} AND {PRICE_HI}
    """,
    tags=("skipping", "io"),
)
def x141_skip_scan(spark: SparkSession, sf: str) -> DataFrame:
    """Point lookup through the Bloom index + range scan through the
    zone map, both over the z-ordered layout, each reduced to
    (n_rows, sum of an exact integer column). The oracle runs the
    SAME predicates over the undistributed source table, so any
    false-negative file skip (a pruned file that held a matching row)
    breaks the value hash — the identity contract, driver-gated.

    Scale: both scans read only the files their index cannot rule
    out (z-ordering makes BOTH predicates selective at the file
    level, ~n_files^(1/2) kept per single-column predicate at d=2);
    the re-applied exact predicate keeps correctness independent of
    index quality. The probe value is one tiny min() aggregate
    (driver-side scalar, never row-scale)."""
    table, bloom, zmap = ensure_skip_layout(spark, sf)
    ck = load(spark, sf, "orders").agg(F.min("o_custkey")).first()[0]
    b = bloom_scan(spark, table, bloom, "o_custkey", int(ck))
    z = zonemap_scan(spark, table, zmap, "o_totalprice", PRICE_LO, PRICE_HI)
    return _path_agg(b, "bloom_eq").unionByName(_path_agg(z, "zonemap_range"))

"""Bloom-filter join pruning — cut a big-table shuffle down to the
rows that can possibly match BEFORE the join, with an exact join after
so semantics never change (Bloom 1970; the runtime-filter pattern in
Spark's own InjectRuntimeFilter, re-expressed as an explicit operator
so the pruning is plan-visible and testable).

Reference relevance: the reference joins a monitoring query's result
against task tables at web-app scale (web_scheduler.py:4582-4733); at
100 TB the equivalent "lineitems of the qualifying orders" join
shuffles the ENTIRE fact table even when <1% of it can match. A bloom
filter built from the small/qualifying side is a membership test with
zero false negatives: probing it before the shuffle drops the
guaranteed-non-matching rows at the scan, and the exact join that
follows removes the false positives, so the final result is
bit-identical to the plain join (which is exactly what the DuckDB
oracle runs).

Two probe forms, same bitmap:

- **Literal fold** (`bloom_member_expr`): the bitmap (``m_bits/64``
  BIGINT words) is collected once and folded into the plan as an
  array literal — membership is shift/AND arithmetic inside
  whole-stage codegen, ZERO extra joins or shuffles on the probe
  side (the x73 ADC-table convention). Right whenever the build side
  is dimension-sized: m = 2^16 bits is 1024 literals and handles
  ~6.5k keys at <1% false-positive rate with K_HASHES=3.
- **Broadcast words** (`bloom_prune_broadcast`): for build sides too
  big to literal-fold, the non-zero bitmap words stay a DataFrame and
  the probe LEFT-joins it k times on the word index — every join is
  a broadcast hash join (the words table is <= m/64 rows), still no
  shuffle of the probe. Proven row-identical to the literal form in
  tests/test_bloom.py.

Sizing: for n build keys and k=3 hashes, false-positive rate is
(1 - e^(-k*n/m))^3 — m ~ 10n bits gives ~1%. False positives only
cost wasted shuffle rows (the exact join removes them); false
negatives cannot occur because every build key sets its own k bits.

Determinism: the bitmap is built from xxhash64 which is
Spark-internal (no DuckDB twin needed — the oracle is the PLAIN
join; the bloom stage is a pure optimization, invisible to results).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_spark.registry import register
from etl_spark.tables import load

M_BITS = 1 << 16  # default bitmap size: 1024 bigint words as literals
K_HASHES = 3
LITERAL_MAX_BITS = 1 << 16  # above this, literal folding bloats the plan:
# the probe switches to the broadcast-words form
M_CAP_BITS = 1 << 26  # 1 Mi words broadcast ~ 8 MiB: the executor-memory cap


def choose_m_bits(n_build: int) -> int:
    """Bitmap size for ``n_build`` keys: the next power of two at or
    above 10 bits/key (~1% false positives at k=3), clamped to
    [2^10, 2^26]. Power-of-two keeps pmod cheap and sizes stable
    across small count drift."""
    target = max(10 * max(n_build, 1), 1 << 10)
    m = 1 << (target - 1).bit_length()
    return min(m, M_CAP_BITS)


def bloom_prune_auto(
    probe: DataFrame, probe_key: str, build: DataFrame, build_key: str, k: int = K_HASHES
) -> DataFrame:
    """Prune ``probe`` by a bloom filter over ``build[build_key]``,
    SIZED from the build count (one cheap aggregate): ~10 bits/key.
    Small builds fold the bitmap into the plan as literals (zero
    joins); large builds broadcast the (word, bits) table instead —
    the form that scales to hundreds of millions of build keys, where
    a literal array would bloat the plan and a fixed bitmap would
    saturate to all-ones and prune nothing."""
    n = build.count()
    m = choose_m_bits(n)
    if m <= LITERAL_MAX_BITS:
        return probe.filter(bloom_member_expr(probe_key, bloom_bitmap(build, build_key, m, k), m, k))
    return bloom_prune_broadcast(probe, probe_key, bloom_words(build, build_key, m, k), m, k)


def _positions(key: F.Column, m_bits: int, k: int) -> list[F.Column]:
    """k bit positions for a key: pmod(xxhash64(key, seed_i), m)."""
    return [F.pmod(F.xxhash64(key, F.lit(i)), F.lit(m_bits)) for i in range(k)]


def bloom_words(df: DataFrame, key_col: str, m_bits: int = M_BITS, k: int = K_HASHES) -> DataFrame:
    """Build the bloom bitmap as (word INT, bits BIGINT) rows — one
    aggregate over the build side with map-side combine, output
    bounded by m_bits/64 rows regardless of build cardinality.
    Duplicate keys cost nothing (bit_or is idempotent)."""
    pos = F.explode(F.array(*_positions(F.col(key_col), m_bits, k))).alias("pos")
    return (
        df.select(pos)
        .select(
            (F.col("pos") / 64).cast("int").alias("word"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").alias("bit"),
        )
        .groupBy("word")
        .agg(F.expr("bit_or(bit)").alias("bits"))
    )


def bloom_bitmap(df: DataFrame, key_col: str, m_bits: int = M_BITS, k: int = K_HASHES) -> list[int]:
    """Collect the bitmap into a dense ``m_bits/64``-long Python list
    (missing words are 0). Bounded driver artifact: 1024 ints at the
    default m — the x73 literal-table convention."""
    words = [0] * (m_bits // 64)
    for r in bloom_words(df, key_col, m_bits, k).collect():
        words[r["word"]] = r["bits"]
    return words


def bloom_member_expr(
    key_col: str, bitmap: list[int], m_bits: int = M_BITS, k: int = K_HASHES
) -> F.Column:
    """Membership test as a single whole-stage-codegen boolean over
    the literal bitmap: all k bits set. No joins, no shuffle."""
    arr = F.array(*[F.lit(int(w)).cast("long") for w in bitmap])
    cond = F.lit(True)
    for p in _positions(F.col(key_col), m_bits, k):
        word = F.element_at(arr, (p / 64).cast("int") + 1)
        cond = cond & (F.bit_get(word, p % 64) == 1)
    return cond


def bloom_prune_broadcast(
    probe: DataFrame,
    key_col: str,
    words: DataFrame,
    m_bits: int = M_BITS,
    k: int = K_HASHES,
) -> DataFrame:
    """Prune ``probe`` to rows whose key passes the bloom test,
    joining the (word, bits) table k times — each join broadcast,
    zero shuffles of the probe side. For build sides too large to
    literal-fold."""
    out = probe
    for i, p in enumerate(_positions(F.col(key_col), m_bits, k)):
        w = F.broadcast(words.withColumnRenamed("word", f"w{i}").withColumnRenamed("bits", f"b{i}"))
        out = (
            out.withColumn(f"_pos{i}", p)
            .join(w, (F.col(f"_pos{i}") / 64).cast("int") == F.col(f"w{i}"), "left")
            .filter(F.bit_get(F.coalesce(F.col(f"b{i}"), F.lit(0).cast("long")), F.col(f"_pos{i}") % 64) == 1)
            .drop(f"_pos{i}", f"w{i}", f"b{i}")
        )
    return out


def _qualifying_orders(spark: SparkSession, sf: str) -> DataFrame:
    """Orders of BUILDING-segment customers — the join's small side
    (~20% of orders). Customer is dimension-sized: broadcast."""
    cust = load(spark, sf, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    return load(spark, sf, "orders").join(
        F.broadcast(cust.select("c_custkey")), F.col("o_custkey") == F.col("c_custkey")
    )


@register(
    "x84_bloom_join_prune",
    oracle="""
        SELECT l.l_returnflag,
               CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                        * CAST(1 - l.l_discount AS DECIMAL(18,2))) AS DOUBLE)
                 AS revenue,
               COUNT(*) AS n_items
        FROM lineitem l
        JOIN orders o   ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        WHERE c.c_mktsegment = 'BUILDING'
        GROUP BY l.l_returnflag
    """,
    tags=("extension", "bloom", "join", "scale"),
    doc="Bloom-pruned fact join: revenue by returnflag for BUILDING-segment orders.",
)
def x84_bloom_join_prune(spark: SparkSession, sf: str) -> DataFrame:
    """Revenue per returnflag over lineitems of BUILDING-segment
    orders, with the lineitem scan bloom-pruned BEFORE the fact
    shuffle. The bitmap is SIZED from the qualifying-key count
    (~10 bits/key, one bit_or aggregate) and folded into the plan as
    literals while small — at growing build sizes bloom_prune_auto
    switches to the broadcast-words probe instead of letting a fixed
    bitmap saturate. It drops ~80% of lineitem rows inside
    whole-stage codegen; the exact join that follows
    removes bloom false positives, so the result — and the DuckDB
    oracle, which runs the plain 3-table join — is unchanged. At
    100 TB this is the difference between shuffling the full fact
    table and shuffling only the qualifying fifth."""
    qual = _qualifying_orders(spark, sf).select("o_orderkey").persist()
    li = bloom_prune_auto(load(spark, sf, "lineitem"), "l_orderkey", qual, "o_orderkey")
    dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    return (
        li.join(qual, li.l_orderkey == qual.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(dec("l_extendedprice") * (F.lit(1) - F.col("l_discount")).cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )

"""Graph analytics over relationship tables — PageRank in exact
fixed-point arithmetic (Brin & Page 1998; the Pregel-on-DataFrames
iteration pattern, each round one join + one aggregate).

Reference relevance: the reference's dashboards rank entities by
direct aggregates (web_scheduler.py:4582-4733 — counts per task);
a graph centrality ranks them by STRUCTURE — a supplier is important
because important customers trade with it, recursively. The dedup
family already runs one graph algorithm (x29's connected components,
dedup.py:535); PageRank is the weighted-importance sibling and the
canary for hub entities (a vendor every customer touches, a boilerplate
doc every near-dup cluster links through).

Graph: the customer<->supplier trade graph — an edge wherever a
lineitem connects a supplier to an order's customer. Node ids pack
both keys into one BIGINT space (customer -> 2k, supplier -> 2k+1) so
the rank table is a single keyed DataFrame.

Determinism (the iterative-float trap): textbook PageRank sums
double contributions, and float addition is order-dependent — a
Spark shuffle and a DuckDB hash agg would disagree in the last ulp
and the value-hash gate would flake. All arithmetic here is
FIXED-POINT BIGINT: ranks are scaled by 10^12, shares are integer
division r DIV deg, damping is (85 * x) DIV 100. Integer addition is
associative and commutative, so any execution order — 1 partition or
1000 — produces bit-identical ranks, and the DuckDB oracle (the same
three iterations unrolled as CTEs) matches exactly. Truncation loses
<1 unit per edge per round at 10^12 scale: invisible for ranking,
priceless for verification.

Scale shape: edges come from ONE distinct aggregate over the fact
join; both orientations explode from one pass (the x29 convention —
a self-union would re-evaluate the upstream plan). Each iteration is
one shuffle join (|E| rows, skinny: node+share) and one aggregate to
|V| rows; iterations are FIXED at T=3, so lineage stays bounded
without checkpointing, and edges/degrees persist across rounds. At
100 TB the rank state is |V| rows — millions, not the fact table's
billions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_spark.registry import register
from etl_spark.tables import load

SCALE = 10**12  # fixed-point scale for rank mass
T_ITERS = 3  # fixed iteration count (also unrolled in the oracle)


def pagerank_fixedpoint(edges: DataFrame, iters: int = T_ITERS) -> DataFrame:
    """PageRank over a directed edge list (src BIGINT, dst BIGINT) in
    fixed-point bigint arithmetic. Returns (node, deg, r) with r the
    scaled rank after ``iters`` rounds. ``edges`` should be persisted
    by the caller if its lineage is expensive (it is scanned once per
    round plus once for degrees)."""
    deg = edges.groupBy(F.col("src").alias("node")).agg(F.count(F.lit(1)).alias("deg")).persist()
    n = deg.count()  # scalar collect — bounded driver artifact
    r0 = SCALE // n
    teleport = (15 * r0) // 100
    ranks = deg.select("node", "deg", F.lit(r0).cast("long").alias("r"))
    for _ in range(iters):
        shares = ranks.select(F.col("node").alias("u"), F.expr("r DIV deg").alias("share"))
        inflow = (
            edges.join(shares, edges.src == shares.u)
            .groupBy("dst")
            .agg(F.sum("share").alias("inflow"))
        )
        ranks = deg.join(inflow, deg.node == inflow.dst, "left").select(
            "node",
            "deg",
            (
                F.lit(teleport).cast("long")
                + F.expr("(85 * coalesce(inflow, CAST(0 AS BIGINT))) DIV 100")
            ).alias("r"),
        )
    return ranks


def _iter_cte(prev: str, cur: str) -> str:
    """One unrolled PageRank round as a DuckDB CTE — the exact
    integer arithmetic of ``pagerank_fixedpoint``."""
    return f"""
        {cur} AS (
            SELECT d.node, d.deg,
                   CAST((15 * (1000000000000 // (SELECT n FROM cnt))) // 100
                        + (85 * CAST(COALESCE(SUM(s.r // s.deg), 0) AS BIGINT)) // 100
                        AS BIGINT) AS r
            FROM deg d
            LEFT JOIN edges e ON e.dst = d.node
            LEFT JOIN {prev} s ON s.node = e.src
            GROUP BY d.node, d.deg
        )"""


_X85_ORACLE = f"""
        WITH pairs AS (
            SELECT DISTINCT o.o_custkey * 2 AS c, l.l_suppkey * 2 + 1 AS s
            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        ),
        edges AS (
            SELECT c AS src, s AS dst FROM pairs
            UNION ALL
            SELECT s AS src, c AS dst FROM pairs
        ),
        deg AS (SELECT src AS node, COUNT(*) AS deg FROM edges GROUP BY src),
        cnt AS (SELECT COUNT(*) AS n FROM deg),
        r0 AS (
            SELECT node, deg,
                   CAST(1000000000000 // (SELECT n FROM cnt) AS BIGINT) AS r
            FROM deg
        ),{_iter_cte("r0", "r1")},{_iter_cte("r1", "r2")},{_iter_cte("r2", "r3")}
        SELECT CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END
                 AS node_type,
               node // 2 AS entity_key,
               r AS rank_scaled
        FROM r3
"""


@register(
    "x85_pagerank_trade_graph",
    oracle=_X85_ORACLE,
    tags=("extension", "graph", "iterative", "scale"),
    doc="Fixed-point PageRank over the customer<->supplier trade graph.",
)
def x85_pagerank_trade_graph(spark: SparkSession, sf: str) -> DataFrame:
    """Rank every customer and supplier by trade-graph centrality:
    3 PageRank rounds (damping 0.85) in fixed-point bigint arithmetic
    so Spark and the unrolled-CTE DuckDB oracle agree bit-for-bit —
    see the module docstring for why floats cannot survive this gate.
    Edges are one distinct aggregate over lineitem⋈orders, both
    orientations exploded from a single pass, persisted once and
    reused by all three rounds; per-round work is one skinny
    (node, share) shuffle join plus a |V|-row aggregate."""
    li = load(spark, sf, "lineitem").select("l_orderkey", "l_suppkey")
    orders = load(spark, sf, "orders").select("o_orderkey", "o_custkey")
    pairs = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("c"),
            (F.col("l_suppkey") * 2 + 1).alias("s"),
        )
        .distinct()
    )
    edges = (
        pairs.select(
            F.explode(
                F.array(
                    F.struct(F.col("c").alias("src"), F.col("s").alias("dst")),
                    F.struct(F.col("s").alias("src"), F.col("c").alias("dst")),
                )
            ).alias("e")
        )
        .select("e.src", "e.dst")
        .persist()
    )
    ranks = pagerank_fixedpoint(edges)
    return ranks.select(
        F.when(F.col("node") % 2 == 0, F.lit("customer"))
        .otherwise(F.lit("supplier"))
        .alias("node_type"),
        F.expr("node DIV 2").alias("entity_key"),
        F.col("r").alias("rank_scaled"),
    )

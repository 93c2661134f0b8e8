"""Fixed-point PageRank (extensions/graph.py). Oracle parity for the
registered x85 runs in test_oracle.py; these pin the algorithmic
properties on graphs small enough to reason about."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from etl_spark.extensions.graph import SCALE, pagerank_fixedpoint, x85_pagerank_trade_graph


def _edges(spark, pairs):
    """Undirected edge list from (a, b) tuples."""
    directed = [(a, b) for a, b in pairs] + [(b, a) for a, b in pairs]
    return spark.createDataFrame(directed, "src BIGINT, dst BIGINT")


def test_star_graph_hub_dominates(spark):
    # node 0 connected to 1..8: the hub must out-rank every leaf, and
    # all leaves tie exactly (fixed-point arithmetic has no ulp noise).
    ranks = {
        r["node"]: r["r"]
        for r in pagerank_fixedpoint(_edges(spark, [(0, i) for i in range(1, 9)])).collect()
    }
    leaf_ranks = {v for k, v in ranks.items() if k != 0}
    assert len(leaf_ranks) == 1  # exact tie
    assert ranks[0] > leaf_ranks.pop() * 3


def test_rank_mass_conserved(spark):
    # integer truncation loses <1 unit per node per round — total mass
    # stays within a hair of SCALE (here: a 6-cycle plus a chord).
    edges = _edges(spark, [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (5, 0), (0, 3)])
    total = pagerank_fixedpoint(edges).agg(F.sum("r")).collect()[0][0]
    assert abs(total - SCALE) < SCALE * 1e-6


def test_deterministic_across_partitionings(spark):
    # bit-identical ranks whatever the physical partitioning — the
    # property float PageRank cannot give (module docstring).
    pairs = [(i, (i * 7 + 1) % 23) for i in range(23)]
    one = sorted(tuple(r) for r in pagerank_fixedpoint(_edges(spark, pairs)).collect())
    two = sorted(
        tuple(r)
        for r in pagerank_fixedpoint(_edges(spark, pairs).repartition(17)).collect()
    )
    assert one == two


def test_x85_symmetric_mass_split(spark, sf_dir):
    # every edge is customer<->supplier (bipartite): each side holds
    # half the rank mass up to truncation, a structural invariant of
    # the undirected bipartite walk.
    df = x85_pagerank_trade_graph(spark, sf_dir)
    by_side = {
        r["node_type"]: r["m"]
        for r in df.groupBy("node_type").agg(F.sum("rank_scaled").alias("m")).collect()
    }
    assert set(by_side) == {"customer", "supplier"}
    # teleport mass is uniform per node, walk mass alternates sides
    # each round; after 3 rounds both sides remain within 25% of half
    total = sum(by_side.values())
    assert abs(total - SCALE) < SCALE * 1e-6
    assert 0.25 < by_side["customer"] / total < 0.75

"""Fixed-point PageRank (extensions/graph.py). Oracle parity for the
registered x85 runs in test_oracle.py; these pin the algorithmic
properties on graphs small enough to reason about."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

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


# --- incremental connected components ---------------------------------


def _cc_batch(spark, edges):
    from etl_spark.extensions.dedup import connected_components

    return {
        r["doc_id"]: r["lbl"]
        for r in connected_components(
            spark.createDataFrame(edges, "doc_a BIGINT, doc_b BIGINT")
        ).collect()
    }


def _cc_incremental(spark, seen, new):
    from etl_spark.extensions.dedup import connected_components
    from etl_spark.extensions.graph import apply_remap, cc_merge

    labels = connected_components(
        spark.createDataFrame(seen, "doc_a BIGINT, doc_b BIGINT")
    ) if seen else spark.createDataFrame([], "doc_id BIGINT, lbl BIGINT")
    remap, newdocs = cc_merge(
        labels, spark.createDataFrame(new, "doc_a BIGINT, doc_b BIGINT")
    )
    return {
        r["doc_id"]: r["lbl"]
        for r in apply_remap(labels, remap).unionByName(newdocs).collect()
    }


def test_cc_merge_equals_batch_on_adversarial_shapes(spark):
    # chain split across batches (merge must cascade through the
    # quotient), two components fused by one new edge, brand-new
    # component, and an edge inside an existing component (no-op).
    seen = [(1, 2), (3, 4), (10, 11), (20, 21)]
    new = [(2, 3), (4, 10), (30, 31), (20, 21), (1, 4)]
    assert _cc_incremental(spark, seen, new) == _cc_batch(spark, seen + new)


def test_cc_merge_from_empty_state(spark):
    new = [(5, 6), (6, 7), (1, 9)]
    assert _cc_incremental(spark, [], new) == _cc_batch(spark, new)


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 14), st.integers(0, 14)).filter(lambda e: e[0] != e[1]),
        min_size=1,
        max_size=20,
    ),
    st.integers(0, 2**31),
)
@pytest.mark.slow
def test_cc_merge_equals_batch_random(edges, seed):
    spark = _spark()
    edges = [tuple(sorted(e)) for e in edges]
    cut = seed % (len(edges) + 1)
    seen, new = edges[:cut], edges[cut:]
    if not new:
        new = edges[-1:]
    assert _cc_incremental(spark, seen, new) == _cc_batch(spark, seen + new)


def _spark():
    from etl_spark.session import get_spark

    return get_spark(app_name="etl_spark-tests")


def test_cc_index_roundtrip_compact_and_pruned_members(spark, tmp_path):
    from etl_spark.extensions.dedup import connected_components
    from etl_spark.extensions.graph import (
        build_cc_index,
        cc_index_labels,
        cc_index_merge,
        cluster_members,
        compact_cc_index,
    )

    path = str(tmp_path / "cc_index")
    seen = [(1, 2), (3, 4), (10, 11)]
    b1 = [(2, 3), (30, 31)]  # fuses {1,2}+{3,4}; new comp {30,31}
    b2 = [(4, 10)]  # fuses the fused comp with {10,11}
    build_cc_index(
        connected_components(spark.createDataFrame(seen, "doc_a BIGINT, doc_b BIGINT")),
        path,
    )
    for v, batch in ((1, b1), (2, b2)):
        assert cc_index_merge(
            spark, path, spark.createDataFrame(batch, "doc_a BIGINT, doc_b BIGINT"), v
        )
    want = _cc_batch(spark, seen + b1 + b2)
    got = {r["doc_id"]: r["lbl"] for r in cc_index_labels(spark, path).collect()}
    assert got == want

    # replay skip: committed versions return False and change nothing
    assert not cc_index_merge(
        spark, path, spark.createDataFrame(b1, "doc_a BIGINT, doc_b BIGINT"), 1
    )
    assert {r["doc_id"]: r["lbl"] for r in cc_index_labels(spark, path).collect()} == want

    # member lookup: label 1 owns {1,2,3,4,10,11}; remapped-away and
    # unknown labels return empty
    assert sorted(r["doc_id"] for r in cluster_members(spark, path, 1).collect()) == [
        1, 2, 3, 4, 10, 11,
    ]
    assert cluster_members(spark, path, 3).count() == 0  # merged into 1
    assert cluster_members(spark, path, 999).count() == 0

    # compaction folds deltas into a fresh base, labels unchanged
    compact_cc_index(spark, path)
    import glob

    assert not glob.glob(f"{path}/delta_v*")
    assert {r["doc_id"]: r["lbl"] for r in cc_index_labels(spark, path).collect()} == want
    assert sorted(r["doc_id"] for r in cluster_members(spark, path, 1).collect()) == [
        1, 2, 3, 4, 10, 11,
    ]


def test_x88_oracle_shape(spark, sf_dir):
    from etl_spark.extensions.graph import x88_incremental_dup_clusters

    df = x88_incremental_dup_clusters(spark, sf_dir)
    rows = df.collect()
    assert rows and df.columns == ["doc_id", "cluster_id", "is_canonical"]
    # every cluster id is a member doc id and is the minimum member
    by_cluster = {}
    for r in rows:
        by_cluster.setdefault(r["cluster_id"], []).append(r["doc_id"])
    for cid, docs in by_cluster.items():
        assert cid == min(docs)


def test_pagerank_rejects_dangling_sink_nodes(spark):
    # directed edge with a dst-only node: rank mass would silently
    # leak — the precondition check must refuse instead
    directed = spark.createDataFrame([(1, 2)], "src BIGINT, dst BIGINT")
    with pytest.raises(ValueError, match="outdegree 0"):
        pagerank_fixedpoint(directed)


# --- r10 kernels on seeded random graphs -----------------------------------
# The fixture's co-purchase graph is sparse and tie-light; random
# G(n, m) graphs exercise degree TIES (the orientation tiebreak) and
# hub nodes (the fan-out the orientation exists to bound).


def _random_edges(seed: int, n: int = 40, m: int = 160):
    import random

    rng = random.Random(seed)
    out = set()
    while len(out) < m:
        a, b = rng.sample(range(n), 2)
        out.add((min(a, b), max(a, b)))
    return sorted(out)


def test_triangle_kernel_matches_bruteforce_on_random_graphs(spark):
    from etl_spark.extensions.graph import triangle_clustering

    for seed in (7, 23):
        edges = _random_edges(seed)
        adj: dict = {}
        for a, b in edges:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        tri: dict = {}
        for a, b in edges:
            for c in adj[a] & adj[b]:
                for v in (a, b, c):
                    tri[v] = tri.get(v, 0) + 1
        tri = {v: k // 3 for v, k in tri.items() if k >= 3}
        assert tri, f"seed {seed}: fixture graph must contain triangles"

        df = spark.createDataFrame(edges, "a long, b long")
        got = {r["v"]: r for r in triangle_clustering(df).collect()}
        assert set(got) == set(tri), f"seed {seed}"
        for v, k in tri.items():
            d = len(adj[v])
            assert got[v]["n_triangles"] == k
            assert got[v]["degree"] == d
            assert got[v]["clustering_coeff"] == round(2 * k / (d * (d - 1)), 6)


def test_bfs_kernel_matches_queue_bfs_on_random_graphs(spark):
    from etl_spark.extensions.graph import bfs_levels

    for seed in (11, 42):
        und = _random_edges(seed, n=60, m=90)  # sparse: real level structure
        directed = [(a, b) for a, b in und] + [(b, a) for a, b in und]
        adj: dict = {}
        for s, d in directed:
            adj.setdefault(s, set()).add(d)
        source = und[0][0]
        level = {source: 0}
        frontier = [source]
        for hop in range(1, 4):
            nxt = []
            for u in frontier:
                for v in adj.get(u, ()):
                    if v not in level:
                        level[v] = hop
                        nxt.append(v)
            frontier = nxt
        df = spark.createDataFrame(directed, "src long, dst long")
        got = {r["node"]: r["level"] for r in bfs_levels(df, source, 3).collect()}
        assert got == level, f"seed {seed}"
        assert max(level.values()) >= 2, f"seed {seed}: want multi-hop levels"

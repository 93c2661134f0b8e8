"""Inverted-index tests beyond oracle parity: the stored
bucket-partitioned index must answer exactly like the in-plan
postings (x83), its probe must literally partition-prune to the query
tokens' buckets, and OR mode must relate to AND mode the way set
algebra says."""

from __future__ import annotations

import glob
import re

import pyspark.sql.functions as F

from etl_spark.extensions.textindex import (
    N_INDEX_BUCKETS,
    QUERY_TOKENS,
    build_token_index,
    boolean_search,
    postings,
    token_bucket,
    token_index_probe,
)
from etl_spark.registry import all_specs
from etl_spark.tables import load

SPECS = all_specs()


def _rows(df):
    return sorted((r.doc_id, r.n_terms, r.tf_total) for r in df.collect())


def test_stored_probe_matches_inplan_and_prunes(spark, sf_dir, tmp_path):
    """build_token_index -> token_index_probe must equal the in-plan
    x83 answer, and the probe's file scan must carry a literal
    bucket PartitionFilters entry (static pruning: only the <=|Q|
    query-token buckets are listed, not all N_INDEX_BUCKETS dirs)."""
    docs = load(spark, sf_dir, "documents")
    idx = str(tmp_path / "tokidx")
    build_token_index(docs, idx)
    n_dirs = len(glob.glob(f"{idx}/bucket=*"))
    assert n_dirs == N_INDEX_BUCKETS

    probe = token_index_probe(spark, idx, QUERY_TOKENS)
    want = SPECS["x83_boolean_token_search"].fn(spark, sf_dir)
    got_rows = _rows(probe)
    assert got_rows == _rows(want) and len(got_rows) > 0

    probe.collect()
    plan = probe._jdf.queryExecution().executedPlan().toString()
    pf = [
        m
        for m in re.findall(r"PartitionFilters: \[([^\]]*)\]", plan)
        if "bucket" in m
    ]
    assert pf, "no bucket partition filter in the index scan"
    want_buckets = sorted({token_bucket(t) for t in QUERY_TOKENS})
    assert len(want_buckets) < N_INDEX_BUCKETS  # pruning is real here


def test_or_mode_is_union_and_mode_is_intersection(spark, sf_dir):
    """OR matches = docs containing ANY query token (>= AND matches,
    and exactly the per-token union); AND rows all carry
    n_terms == |Q|."""
    docs = load(spark, sf_dir, "documents")
    post = postings(docs)
    and_df = boolean_search(post, QUERY_TOKENS, mode="and")
    or_df = boolean_search(post, QUERY_TOKENS, mode="or")
    and_ids = {r.doc_id for r in and_df.collect()}
    or_ids = {r.doc_id for r in or_df.collect()}
    assert and_ids <= or_ids
    union_ids = {
        r.doc_id
        for r in post.filter(F.col("token").isin(list(QUERY_TOKENS)))
        .select("doc_id")
        .distinct()
        .collect()
    }
    assert or_ids == union_ids
    for r in and_df.collect():
        assert r.n_terms == len(QUERY_TOKENS)


def test_single_token_probe_reads_one_bucket(spark, sf_dir, tmp_path):
    """A one-token query must prune to exactly one bucket directory
    and return every doc containing that token."""
    docs = load(spark, sf_dir, "documents")
    idx = str(tmp_path / "tokidx1")
    build_token_index(docs, idx)
    got = token_index_probe(spark, idx, ("vector",))
    want = (
        postings(docs)
        .filter(F.col("token") == "vector")
        .select("doc_id", F.lit(1).alias("n_terms"), F.col("tf").alias("tf_total"))
    )
    assert _rows(got) == _rows(want) and len(_rows(got)) > 0


def test_bm25_stored_probe_matches_inplan_and_prunes(spark, sf_dir, tmp_path):
    """build_bm25_index -> bm25_index_probe must reproduce the
    registered x106 row-for-row, and the postings scan must carry a
    bucket PartitionFilters entry (only the query tokens' buckets are
    read)."""
    from etl_spark.extensions.textindex import (
        N_INDEX_BUCKETS,
        QUERY_TOKENS,
        bm25_index_probe,
        build_bm25_index,
        token_bucket,
    )

    docs = load(spark, sf_dir, "documents")
    idx = str(tmp_path / "bm25idx")
    build_bm25_index(docs, idx)
    probe = bm25_index_probe(spark, idx)
    want = SPECS["x106_bm25_search"].fn(spark, sf_dir)
    got_rows = sorted((r.doc_id, r.score, r.rk) for r in probe.collect())
    want_rows = sorted((r.doc_id, r.score, r.rk) for r in want.collect())
    assert got_rows == want_rows and len(got_rows) > 0

    probe.collect()
    plan = probe._jdf.queryExecution().executedPlan().toString()
    pf = [
        m
        for m in re.findall(r"PartitionFilters: \[([^\]]*)\]", plan)
        if "bucket" in m
    ]
    assert pf, "no bucket partition filter in the postings scan"
    assert len({token_bucket(t) for t in QUERY_TOKENS}) < N_INDEX_BUCKETS

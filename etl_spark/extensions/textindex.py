"""Inverted token index — boolean corpus search as a data operator.

Beyond the reference's surface (the reference greps its job tables
with SQL LIKE, web_scheduler.py:2046-level filters); at 100 TB you
cannot scan the corpus per query. The retrieval-side answer is the
same one the ANN family (similarity.py) gives for vectors: build a
STORED index partitioned by a pruning key, and make every probe read
only the partitions its query can possibly touch.

- **Postings** are (token, doc_id, tf) rows — one per distinct
  (token, doc) pair, built with a single map-side-combining aggregate.
- **Stored layout**: postings written partitioned by
  ``bucket = h(token) % N_INDEX_BUCKETS``, so a probe for Q tokens
  statically prunes to <= Q of the N bucket directories
  (PartitionFilters at the file listing, the x72 IVF convention —
  similarity.py:1478).
- **Probe**: query tokens are a broadcast list; AND semantics is a
  per-doc distinct-token count equal to |Q| — the classic
  intersect-via-count plan, no self-join of posting lists.

The registered query (x83) runs the identical semantics in-plan so
the DuckDB oracle can check it; the stored build/probe pair is
asserted equal to the in-plan answer plus literally partition-pruned
in tests/test_textindex.py.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_spark.extensions.sketches import _TOKENS_DUCK, _TOKENS_SPARK
from etl_spark.registry import register
from etl_spark.tables import load

# fixed demo query for the registered/oracle-checked form: three
# mid-selectivity corpus tokens (AND of the three matches ~28% of
# docs on the fixtures — non-trivial both ways).
QUERY_TOKENS = ("agg", "stream", "window")

N_INDEX_BUCKETS = 8  # stored-index partition fan-out


def postings(docs: DataFrame) -> DataFrame:
    """(token, doc_id, tf) posting rows for a ``documents``-shaped
    DataFrame — one aggregate, partial-combined map-side."""
    toks = docs.select(
        "doc_id", F.explode(F.expr(_TOKENS_SPARK)).alias("token")
    )
    return toks.groupBy("token", "doc_id").agg(F.count("*").alias("tf"))


def boolean_search(post: DataFrame, tokens: tuple[str, ...], mode: str = "and") -> DataFrame:
    """Docs matching ``tokens`` over a postings DataFrame: (doc_id,
    n_terms, tf_total). ``and`` keeps docs containing every token,
    ``or`` any. The token list is broadcast; AND is the
    count-distinct-equals-|Q| plan (postings are already distinct per
    (token, doc), so a plain count suffices — no posting-list
    self-join)."""
    if mode not in ("and", "or"):
        raise ValueError(f"mode must be 'and' or 'or', got {mode!r}")
    spark = post.sparkSession
    q = spark.createDataFrame([(t,) for t in sorted(set(tokens))], "token string")
    hits = post.join(F.broadcast(q), "token")
    agg = hits.groupBy("doc_id").agg(
        F.count("*").alias("n_terms"),
        F.sum("tf").alias("tf_total"),
    )
    if mode == "and":
        agg = agg.filter(F.col("n_terms") == len(set(tokens)))
    return agg


@register(
    "x83_boolean_token_search",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, unnest({_TOKENS_DUCK}) AS token FROM documents
        ),
        hits AS (
            SELECT doc_id, token, count(*) AS tf
            FROM toks
            WHERE token IN ('agg', 'stream', 'window')
            GROUP BY doc_id, token
        )
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS n_terms,
               CAST(SUM(tf) AS BIGINT) AS tf_total
        FROM hits
        GROUP BY doc_id
        HAVING count(*) = 3
    """,
    tags=("text", "index"),
)
def x83_boolean_token_search(spark: SparkSession, sf: str) -> DataFrame:
    """AND-of-three boolean search over the corpus: doc_ids containing
    all of QUERY_TOKENS, with the matched-term count and the total
    term frequency (the ranking signal a retrieval layer sorts by).

    This registered form computes the postings in-plan so DuckDB can
    replay it; the deployment form is ``build_token_index`` +
    ``token_index_probe``, where the postings are STORED partitioned
    by token-hash bucket and a probe reads <= |Q| of N_INDEX_BUCKETS
    partition directories (statically pruned — asserted on the real
    file-scan plan in tests). Either way the query-token list is
    broadcast and the only shuffle past the postings aggregate is the
    per-doc count — the corpus text itself is never re-scanned per
    query in the stored form.
    """
    return boolean_search(postings(load(spark, sf, "documents")), QUERY_TOKENS)


# ---------------------------------------------------------------------------
# stored-index build / probe (the deployment path)
# ---------------------------------------------------------------------------


def token_bucket(token: str) -> int:
    """Driver-side twin of the in-plan bucket derivation: first 15 hex
    chars of md5(token) as an int, mod N_INDEX_BUCKETS — identical to
    sketches._H_SPARK's chain because the value is < 2^60 and
    nonnegative."""
    return int(hashlib.md5(token.encode("utf-8")).hexdigest()[:15], 16) % N_INDEX_BUCKETS


def build_token_index(docs: DataFrame, path: str) -> None:
    """Materialize the inverted index at ``path``, partitioned by the
    token-hash bucket (the pruning key). Static overwrite so the
    commit is atomic-per-build and carries _SUCCESS (the
    dynamic-overwrite marker trap — see sources/txlog.py note)."""
    post = postings(docs).withColumn(
        "bucket",
        F.pmod(
            F.expr(
                "CAST(conv(substring(md5(CAST(token AS STRING)), 1, 15), 16, 10) AS BIGINT)"
            ),
            F.lit(N_INDEX_BUCKETS),
        ),
    )
    (
        post.write.mode("overwrite")
        .option("partitionOverwriteMode", "static")
        .partitionBy("bucket")
        .parquet(path)
    )


def token_index_probe(
    spark: SparkSession, path: str, tokens: tuple[str, ...], mode: str = "and"
) -> DataFrame:
    """Probe the stored index: compute the query tokens' buckets
    driver-side, filter on the PARTITION column first (static pruning
    — only those bucket directories are listed/read), then on the
    token within. Semantics identical to ``boolean_search`` over the
    full postings."""
    buckets = sorted({token_bucket(t) for t in tokens})
    idx = (
        spark.read.parquet(path)
        .filter(F.col("bucket").isin(buckets))
        .select("token", "doc_id", "tf")
    )
    return boolean_search(idx, tokens, mode=mode)

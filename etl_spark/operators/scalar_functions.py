"""Scalar function inventory (SURVEY.md §2.8) — string / date / math /
hash functions, each re-expressed with native ``pyspark.sql.functions``
(JVM-side, codegen'd; no Python UDFs anywhere).

Oracle parity notes:
- Spark `round` and DuckDB `round` both round-half-away on these
  inputs; where exactness matters values go through DECIMAL.
- DuckDB `regexp_replace` needs the 'g' flag to match Spark's
  replace-all semantics.
- Date format strings differ (Spark `yyyy-MM-dd` vs DuckDB strftime
  `%Y-%m-%d`); each oracle uses the DuckDB spelling of the same format.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_spark.registry import register
from etl_spark.tables import load


@register(
    "f01_split_array_ops",
    oracle="""
        SELECT doc_id,
               CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
               string_split(text, ' ')[1] AS first_token,
               array_to_string(string_split(text, ' ')[1:3], ',') AS first3
        FROM documents
    """,
    tags=("function",),
)
def f01_split_array_ops(spark: SparkSession, sf: str) -> DataFrame:
    """F1/F2 comma-list split & re-join (dependencies.split(','),
    web_scheduler.py:1245; ','.join :4811) — ArrayType round trip."""
    toks = F.split(F.col("text"), " ")
    return load(spark, sf, "documents").select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.element_at(toks, 1).alias("first_token"),
        F.array_join(F.slice(toks, 1, 3), ",").alias("first3"),
    )


@register(
    "f02_regexp_extract",
    oracle="""
        SELECT event_id,
               CAST(regexp_extract(props, '"k": (\\d+)', 1) AS INT) AS k_val
        FROM events
        WHERE props IS NOT NULL
    """,
    tags=("function",),
)
def f02_regexp_extract(spark: SparkSession, sf: str) -> DataFrame:
    """F3 regex extraction (db.table sniffing from SQL text,
    web_scheduler.py:3216-3222) — pull the numeric field out of the
    props JSON-ish string."""
    return (
        load(spark, sf, "events")
        .filter(F.col("props").isNotNull())
        .select(
            "event_id",
            F.regexp_extract(F.col("props"), r'"k": (\d+)', 1)
            .cast("int")
            .alias("k_val"),
        )
    )


@register(
    "f03_multiformat_dates",
    oracle="""
        SELECT o_orderkey,
               COALESCE(
                   try_strptime(dstr, '%Y-%m-%d %H:%M:%S'),
                   try_strptime(dstr, '%Y/%m/%d')
               ) AS parsed_ts
        FROM (
            SELECT o_orderkey,
                   CASE WHEN o_orderkey % 2 = 0
                        THEN strftime(o_orderdate, '%Y-%m-%d %H:%M:%S')
                        ELSE strftime(o_orderdate, '%Y/%m/%d')
                   END AS dstr
            FROM orders
        ) t
    """,
    tags=("function",),
)
def f03_multiformat_dates(spark: SparkSession, sf: str) -> DataFrame:
    """F4 multi-pattern date parsing (6-regex date re-parse in the
    Excel exporter, web_scheduler.py:3674-3698) — coalesce over
    try_to_timestamp with each candidate format."""
    df = load(spark, sf, "orders").select(
        "o_orderkey",
        F.when(
            F.col("o_orderkey") % 2 == 0,
            F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss"),
        )
        .otherwise(F.date_format("o_orderdate", "yyyy/MM/dd"))
        .alias("dstr"),
    )
    return df.select(
        "o_orderkey",
        F.coalesce(
            F.try_to_timestamp(F.col("dstr"), F.lit("yyyy-MM-dd HH:mm:ss")),
            F.try_to_timestamp(F.col("dstr"), F.lit("yyyy/MM/dd")),
        ).alias("parsed_ts"),
    )


@register(
    "f04_date_format_parts",
    oracle="""
        SELECT o_orderkey,
               strftime(o_orderdate, '%Y-%m-%d') AS order_day,
               CAST(EXTRACT(year FROM o_orderdate) AS INT) AS order_year,
               CAST(EXTRACT(month FROM o_orderdate) AS INT) AS order_month
        FROM orders
    """,
    tags=("function",),
)
def f04_date_format_parts(spark: SparkSession, sf: str) -> DataFrame:
    """F5/F6 timestamp formatting & parts (strftime/isoformat,
    web_scheduler.py:1192/:3642)."""
    return load(spark, sf, "orders").select(
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_day"),
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
    )


@register(
    "f05_tz_shift_interval",
    oracle="""
        SELECT event_id,
               ts + INTERVAL 8 HOUR AS beijing_ts,
               ts + INTERVAL 300 SECOND AS next_check,
               CAST(date_diff('second', ts, TIMESTAMP '2024-06-01 00:00:00') AS BIGINT)
                 AS age_sec
        FROM events
    """,
    tags=("function",),
)
def f05_tz_shift_interval(spark: SparkSession, sf: str) -> DataFrame:
    """F7/F8 UTC→UTC+8 wall-clock shift (get_beijing_time,
    web_scheduler.py:722-733) and interval arithmetic (next_run = now +
    N seconds, :1390; elapsed-seconds compare, :1366). Fixture
    timestamps are tz-naive so the +8h shift is an interval add."""
    return load(spark, sf, "events").select(
        "event_id",
        (F.col("ts") + F.expr("INTERVAL 8 HOURS")).alias("beijing_ts"),
        (F.col("ts") + F.expr("INTERVAL 300 SECONDS")).alias("next_check"),
        # trunc-to-second first: matches the boundary-crossing count
        # semantics of the oracle's date_diff('second', …)
        F.expr(
            "timestampdiff(SECOND, date_trunc('second', ts), "
            "TIMESTAMP_NTZ '2024-06-01 00:00:00')"
        ).alias("age_sec"),
    )


@register(
    "f06_hashes",
    oracle="""
        SELECT c_custkey,
               md5(c_name) AS name_md5,
               sha256(c_name) AS name_sha256
        FROM customer
    """,
    tags=("function",),
)
def f06_hashes(spark: SparkSession, sf: str) -> DataFrame:
    """F10 SHA-256 / hashing (hashlib.sha256 token hashing,
    web_scheduler.py:4139-4144); md5 doubles as the exact-dedup
    fingerprint primitive."""
    return load(spark, sf, "customer").select(
        "c_custkey",
        F.md5(F.col("c_name")).alias("name_md5"),
        F.sha2(F.col("c_name"), 256).alias("name_sha256"),
    )


@register(
    "f07_coalesce_fallback",
    oracle="""
        SELECT c.c_custkey,
               COALESCE(lo.last_status, 'never_ordered') AS last_status,
               COALESCE(lo.n, 0) AS n_orders
        FROM customer c
        LEFT JOIN (
            SELECT o_custkey, MAX(o_orderstatus) AS last_status,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM orders GROUP BY o_custkey
        ) lo ON c.c_custkey = lo.o_custkey
    """,
    tags=("function", "join"),
)
def f07_coalesce_fallback(spark: SparkSession, sf: str) -> DataFrame:
    """F12 COALESCE fallback (mail_default_sender or mail_username,
    web_scheduler.py:3740) over left-join nulls."""
    cust = load(spark, sf, "customer")
    lo = (
        load(spark, sf, "orders")
        .groupBy("o_custkey")
        .agg(
            F.max("o_orderstatus").alias("last_status"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    return cust.join(lo, cust.c_custkey == lo.o_custkey, "left").select(
        "c_custkey",
        F.coalesce(F.col("last_status"), F.lit("never_ordered")).alias("last_status"),
        F.coalesce(F.col("n"), F.lit(0)).cast("bigint").alias("n_orders"),
    )


@register(
    "f08_string_ops",
    oracle="""
        SELECT doc_id,
               upper(substr(text, 1, 20)) AS head20,
               regexp_replace(substr(text, 1, 40), '[aeiou]', '', 'g') AS devowel,
               starts_with(text, 'key') AS starts_key,
               concat('%', lang, '%') AS like_pat,
               CAST(length(text) AS BIGINT) AS text_len
        FROM documents
    """,
    tags=("function",),
)
def f08_string_ops(spark: SparkSession, sf: str) -> DataFrame:
    """F14-F17 string toolkit: upper/prefix classification
    (web_scheduler.py:931), sanitization regex (:3637), LIKE-pattern
    wrap (:4605), preview truncation (:926)."""
    return load(spark, sf, "documents").select(
        "doc_id",
        F.upper(F.substring("text", 1, 20)).alias("head20"),
        F.regexp_replace(F.substring("text", 1, 40), "[aeiou]", "").alias("devowel"),
        F.col("text").startswith("key").alias("starts_key"),
        F.concat(F.lit("%"), F.col("lang"), F.lit("%")).alias("like_pat"),
        F.length("text").cast("bigint").alias("text_len"),
    )


@register(
    "f11_array_hof",
    oracle="""
        WITH sums AS (
            SELECT vec_id,
                   CAST(SUM(CAST(floor(CAST(v AS DOUBLE) * 1e10) AS BIGINT))
                        AS DOUBLE) / 1e10 AS comp_sum
            FROM (SELECT vec_id, unnest(embedding) AS v FROM embeddings) t
            GROUP BY vec_id
        )
        SELECT e.vec_id,
               CAST(len(list_filter(e.embedding, x -> x > 0)) AS INT) AS n_pos,
               CAST(list_max(list_transform(e.embedding, x -> abs(x)))
                    AS DOUBLE) AS max_abs,
               s.comp_sum
        FROM embeddings e JOIN sums s USING (vec_id)
    """,
    tags=("function", "array"),
)
def f11_array_hof(spark: SparkSession, sf: str) -> DataFrame:
    """Higher-order array functions over the embedding column, all
    JVM-side (no explode, no UDF): FILTER counts positive components,
    TRANSFORM+array_max finds the max magnitude, and AGGREGATE folds
    a fixed-point component sum: each float is floored to 1e-10 grid
    as a BIGINT, so the fold is exactly associative and bit-stable
    across engines (a float fold is order-dependent; even a DECIMAL
    cast differs between Spark's shortest-repr and DuckDB's
    round-half-even at the 10th digit — floor(double*1e10) is the
    deterministic form). Scan-local: zero shuffles at any scale."""
    emb = load(spark, sf, "embeddings")
    return emb.select(
        "vec_id",
        F.size(F.filter("embedding", lambda x: x > 0)).alias("n_pos"),
        F.array_max(F.transform("embedding", lambda x: F.abs(x))).cast("double").alias("max_abs"),
        (
            F.aggregate(
                "embedding",
                F.lit(0).cast("bigint"),
                lambda acc, x: acc + F.floor(x.cast("double") * F.lit(1e10)).cast("bigint"),
            ).cast("double")
            / F.lit(1e10)
        ).alias("comp_sum"),
    )

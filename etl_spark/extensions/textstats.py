"""Text-analysis operators for training-data curation: token counts,
quality scoring, language-ID heuristic, document fingerprinting.

All pure codegen'd expressions (split / filter / transform / md5) —
no Python UDFs, so they run at scan speed and the DuckDB oracle can
reproduce every value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_spark.registry import register
from etl_spark.tables import load

# tiny per-language function-word lexicons for the n-gram/stopword
# language-ID heuristic (public-knowledge function words)
_LEXICONS = {
    "en": ("the", "a", "of", "and", "to", "in", "is"),
    "fr": ("le", "la", "et", "les", "des", "un", "est"),
    "de": ("der", "die", "und", "das", "ein", "ist", "nicht"),
    "es": ("el", "la", "de", "los", "que", "es", "un"),
}
_STOPWORDS = _LEXICONS["en"]


def _sql_list(words) -> str:
    return ", ".join(f"'{w}'" for w in words)


@register(
    "x10_token_stats",
    oracle="""
        SELECT doc_id,
               CAST(len(string_split_regex(text, '\\s+')) AS INT) AS n_tokens,
               ROUND(length(text) * 1.0
                     / len(string_split_regex(text, '\\s+')), 4) AS chars_per_token,
               CAST(n_chars AS BIGINT) AS n_chars
        FROM documents
        WHERE text IS NOT NULL AND text <> ''
    """,
    tags=("textstats",),
)
def x10_token_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Token counting (whitespace tokenizer): tokens, chars/token —
    the first-pass length filter of every corpus pipeline."""
    toks = F.split("text", r"\s+")
    return (
        load(spark, sf, "documents")
        .filter(F.col("text").isNotNull() & (F.col("text") != ""))
        .select(
            "doc_id",
            F.size(toks).alias("n_tokens"),
            F.round(F.length("text") / F.size(toks), 4).alias("chars_per_token"),
            F.col("n_chars").cast("bigint").alias("n_chars"),
        )
    )


@register(
    "x11_quality_score",
    oracle=f"""
        SELECT doc_id,
               ROUND(len(list_filter(string_split(text, ' '),
                         t -> t IN ({_sql_list(_STOPWORDS)}))) * 1.0
                     / len(string_split(text, ' ')), 4) AS stop_ratio,
               ROUND(len(list_filter(string_split(text, ' '),
                         t -> length(t) > 3)) * 1.0
                     / len(string_split(text, ' ')), 4) AS long_tok_ratio,
               (length(text) BETWEEN 50 AND 10000) AS len_ok
        FROM documents
        WHERE text IS NOT NULL AND text <> ''
    """,
    tags=("textstats",),
)
def x11_quality_score(spark: SparkSession, sf: str) -> DataFrame:
    """Quality signals: stopword ratio, long-token ratio, length gate
    (Gopher/C4-style heuristic filters). Lambda filters run inside
    codegen — per-doc cost is O(tokens), no shuffle at all."""
    stoplist = _sql_list(_STOPWORDS)
    toks = F.split("text", " ")
    stop_hits = F.expr(f"size(filter(split(text, ' '), t -> t IN ({stoplist})))")
    long_toks = F.expr("size(filter(split(text, ' '), t -> length(t) > 3))")
    return (
        load(spark, sf, "documents")
        .filter(F.col("text").isNotNull() & (F.col("text") != ""))
        .select(
            "doc_id",
            F.round(stop_hits / F.size(toks), 4).alias("stop_ratio"),
            F.round(long_toks / F.size(toks), 4).alias("long_tok_ratio"),
            F.length("text").between(50, 10000).alias("len_ok"),
        )
    )


def _spark_lang_cols():
    """Per-language lexicon hit-count Columns (built lazily — F.expr
    needs an active session)."""
    return [
        F.expr(
            f"size(filter(split(text, ' '), t -> t IN ({_sql_list(lex)})))"
        ).alias(f"{lang}_hits")
        for lang, lex in _LEXICONS.items()
    ]


_DUCK_LANG_PARTS = [
    f"len(list_filter(string_split(text, ' '), t -> t IN ({_sql_list(lex)}))) AS {lang}_hits"
    for lang, lex in _LEXICONS.items()
]

_DUCK_PRED = """
        CASE WHEN en_hits >= fr_hits AND en_hits >= de_hits AND en_hits >= es_hits THEN 'en'
             WHEN fr_hits >= de_hits AND fr_hits >= es_hits THEN 'fr'
             WHEN de_hits >= es_hits THEN 'de'
             ELSE 'es' END
"""


@register(
    "x12_langid_heuristic",
    oracle=f"""
        SELECT doc_id, lang,
               CAST(en_hits AS INT) AS en_hits,
               CAST(fr_hits AS INT) AS fr_hits,
               CAST(de_hits AS INT) AS de_hits,
               CAST(es_hits AS INT) AS es_hits,
               {_DUCK_PRED} AS predicted_lang
        FROM (
            SELECT doc_id, lang, {', '.join(_DUCK_LANG_PARTS)}
            FROM documents
        ) t
    """,
    tags=("textstats",),
)
def x12_langid_heuristic(spark: SparkSession, sf: str) -> DataFrame:
    """Language-ID heuristic: function-word hit counts per language,
    argmax with a fixed tie order (en > fr > de > es). On the
    synthetic fixture the text is vocabulary-uniform so this measures
    the operator, not real-language accuracy."""
    hits = load(spark, sf, "documents").select("doc_id", "lang", "text", *_spark_lang_cols())
    pred = (
        F.when(
            (F.col("en_hits") >= F.col("fr_hits"))
            & (F.col("en_hits") >= F.col("de_hits"))
            & (F.col("en_hits") >= F.col("es_hits")),
            "en",
        )
        .when((F.col("fr_hits") >= F.col("de_hits")) & (F.col("fr_hits") >= F.col("es_hits")), "fr")
        .when(F.col("de_hits") >= F.col("es_hits"), "de")
        .otherwise("es")
    )
    return hits.select(
        "doc_id",
        "lang",
        F.col("en_hits").cast("int").alias("en_hits"),
        F.col("fr_hits").cast("int").alias("fr_hits"),
        F.col("de_hits").cast("int").alias("de_hits"),
        F.col("es_hits").cast("int").alias("es_hits"),
        pred.alias("predicted_lang"),
    )


@register(
    "x13_fingerprint",
    oracle="""
        SELECT doc_id,
               md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fp_exact,
               md5(array_to_string(list_sort(list_distinct(
                   string_split(text, ' '))), ' ')) AS fp_bow
        FROM documents
    """,
    tags=("textstats", "dedup"),
)
def x13_fingerprint(spark: SparkSession, sf: str) -> DataFrame:
    """Document fingerprints: (a) whitespace-normalized exact hash,
    (b) bag-of-words hash (sorted distinct tokens) — the cheap
    order-insensitive near-dup key."""
    norm = F.lower(F.trim(F.regexp_replace("text", r"\s+", " ")))
    bow = F.array_join(F.array_sort(F.array_distinct(F.split("text", " "))), " ")
    return load(spark, sf, "documents").select(
        "doc_id",
        F.md5(norm).alias("fp_exact"),
        F.md5(bow).alias("fp_bow"),
    )


@register(
    "x14_bow_clusters",
    oracle="""
        SELECT fp_bow,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               array_to_string(list_sort(list(doc_id)), ',') AS doc_ids
        FROM (
            SELECT doc_id,
                   md5(array_to_string(list_sort(list_distinct(
                       string_split(text, ' '))), ' ')) AS fp_bow
            FROM documents
        ) t
        GROUP BY fp_bow
        HAVING COUNT(*) > 1
    """,
    tags=("textstats", "dedup"),
)
def x14_bow_clusters(spark: SparkSession, sf: str) -> DataFrame:
    """Duplicate clusters by bag-of-words fingerprint: groups of >1
    docs sharing a token set — the grouping step of cluster-and-keep
    dedup. doc id list is sorted + stringified so the result is
    order-insensitive."""
    bow = F.md5(F.array_join(F.array_sort(F.array_distinct(F.split("text", " "))), " "))
    return (
        load(spark, sf, "documents")
        .select("doc_id", bow.alias("fp_bow"))
        .groupBy("fp_bow")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.array_join(F.array_sort(F.collect_list("doc_id")), ",").alias("doc_ids"),
        )
        .filter(F.col("n_docs") > 1)
    )

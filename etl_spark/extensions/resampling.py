"""Data-selection operators: importance resampling toward a target
domain (DSIR) and the per-source document cap.

Two selection policies the curation family (x17 quality gate, x46
dedup verdict, x51 temperature mix) does not cover (reference has no
analog — it is a per-table ETL scheduler):

- x62 DSIR importance weights: Data Selection via Importance
  Resampling (Xie et al. '23) — score every raw document by how much
  more likely its hashed n-gram features are under a TARGET domain's
  feature distribution than under the raw corpus's, then keep the
  docs that look target-like. This is the principled replacement for
  "filter by a handful of heuristics": the target corpus itself
  defines what good data looks like. Here the target is the English
  partition (the fixture's stand-in for a curated corpus such as
  Wikipedia); features are bigrams hashed into ``DSIR_BUCKETS``
  buckets exactly as the paper hashes n-grams into a fixed-width
  feature space.
- x63 per-source cap: the RefinedWeb/Gopher-style anti-concentration
  rule — no single source may contribute more than ``SOURCE_CAP``
  documents, and WHICH documents survive is content-stable (md5
  order), never rand() or arrival order, so a re-run or a backfill
  selects the identical survivor set.

Scale shapes: x62's feature-distribution model is one aggregate over
the corpus's hashed-bigram stream collapsing to ``DSIR_BUCKETS`` rows
(map-side partial aggregation absorbs the Zipf skew — buckets are a
fixed tiny key space), and scoring joins the stream to that
broadcast-sized table, then one (doc_id) aggregate: two corpus scans
total, nothing quadratic, no Python. x63 is a single shuffle on
source with a per-partition top-CAP; at web scale a scan-local
permille prefilter bounds the window input first (see the docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_spark.registry import register
from etl_spark.tables import load

# feature-space width for hashed bigrams (DSIR §2.2 hashes n-grams
# into 10k buckets at web scale; 64 keeps every bucket populated at
# fixture scale so the smoothing term never dominates)
DSIR_BUCKETS = 64
DSIR_TARGET_LANG = "en"  # the "curated corpus" stand-in

_DUCK_BIGRAM_BUCKETS = f"""
    WITH toks AS (
        SELECT doc_id, lang, string_split(text, ' ') AS t FROM documents
    ),
    feats AS (
        SELECT doc_id, lang,
               ('0x' || substr(md5(t[i] || ' ' || t[i+1]), 1, 15))::BIGINT
                   % {DSIR_BUCKETS} AS b
        FROM (SELECT doc_id, lang, t, unnest(range(1, len(t))) AS i
              FROM toks)
    ),
    mat AS (
        SELECT doc_id, lang, b, COUNT(*) AS c FROM feats
        GROUP BY doc_id, lang, b
    )
"""

# model-estimation CTE template over a SPARSE-MATRIX relation named by
# ``src`` (rows (doc_id, lang, b, c)) — the SAME count/ratio
# expressions x62 and x64 both splice in, so the batch scorer and the
# corpus scorer cannot drift. Counts sum the matrix's c column (not
# COUNT(*) over the raw stream) because the Spark side derives model
# AND scoring from one shared matrix aggregate (`_bigram_bucket_matrix`
# — its exchange is reused across both branches, one corpus scan
# total) and the oracle mirrors that expression tree.
_DUCK_DSIR_MODEL = """
    cnt AS (
        SELECT b, SUM(c) AS raw_c,
               COALESCE(SUM(c) FILTER (lang = '{target}'), 0) AS tgt_c
        FROM {src} GROUP BY b
    ),
    tot AS (
        SELECT SUM(raw_c) AS nr, SUM(tgt_c) AS nt FROM cnt
    ),
    lr AS (
        SELECT b,
               ln(CAST(tgt_c + 1 AS DOUBLE)
                  / CAST(nt + {buckets} AS DOUBLE))
               - ln(CAST(raw_c + 1 AS DOUBLE)
                    / CAST(nr + {buckets} AS DOUBLE)) AS lratio
        FROM cnt, tot
    )
"""


def _bigram_bucket_feats(docs: DataFrame) -> DataFrame:
    """(doc_id, lang, b) hashed-bigram feature stream — the unit
    shared by x62 (corpus scorer) and x64 (batch scorer)."""
    toks = docs.select("doc_id", "lang", F.split("text", " ").alias("t"))
    # sequence(1, size-1) DESCENDS for single-word docs (ADVICE r4
    # hazard class) — filter them out first; DuckDB's range() is
    # simply empty there, so both engines drop the same docs
    return (
        toks.filter(F.size("t") >= 2)
        .select(
            "doc_id",
            "lang",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(t) - 1), i -> "
                    "element_at(t, i) || ' ' || element_at(t, i + 1))"
                )
            ).alias("bg"),
        )
        .select(
            "doc_id",
            "lang",
            F.expr(
                f"CAST(conv(substring(md5(bg), 1, 15), 16, 10) AS BIGINT)"
                f" % {DSIR_BUCKETS}"
            ).alias("b"),
        )
        # b is never null in practice; making that explicit matters for
        # the PLAN: the scoring join infers isnotnull(b) on its matrix
        # subtree, and without the same filter on the model branches the
        # subtrees are not canonically equal, so AQE cannot reuse the
        # matrix exchange and the corpus is scanned three times (seen in
        # the r7 plan audit). With it, one scan + one matrix shuffle
        # feeds every branch via ReusedExchange.
        .filter(F.col("b").isNotNull())
    )


def _bigram_bucket_matrix(docs: DataFrame) -> DataFrame:
    """(doc_id, lang, b, c) — the sparse document×bucket count matrix,
    the ONE aggregate of the raw feature stream that x62/x64/x67 all
    derive from. Model estimation (SUM(c) per bucket) and per-doc
    scoring (SUM(c·lratio)) both hang off this aggregate's exchange,
    so Catalyst's ReusedExchange computes the corpus scan + matrix
    shuffle ONCE per plan — the oracle CTE ``mat`` mirrors it."""
    return _bigram_bucket_feats(docs).groupBy("doc_id", "lang", "b").agg(
        F.count(F.lit(1)).alias("c")
    )


def _dsir_model(mat: DataFrame) -> DataFrame:
    """(b, lratio) — per-bucket smoothed log importance ratios
    estimated from a sparse (doc_id, lang, b, c) matrix. One aggregate
    builds both distributions (target counts are a conditional sum in
    the raw pass — no second scan). Buckets absent from the matrix are
    absent from the model; consumers score them 0 (no evidence — see
    x64)."""
    cnt = mat.groupBy("b").agg(
        F.sum("c").alias("raw_c"),
        F.sum(
            F.when(F.col("lang") == DSIR_TARGET_LANG, F.col("c")).otherwise(
                F.lit(0)
            )
        ).alias("tgt_c"),
    )
    tot = cnt.agg(F.sum("raw_c").alias("nr"), F.sum("tgt_c").alias("nt"))
    lr = cnt.crossJoin(F.broadcast(tot)).select(
        "b",
        (
            F.ln(
                (F.col("tgt_c") + 1).cast("double")
                / (F.col("nt") + DSIR_BUCKETS).cast("double")
            )
            - F.ln(
                (F.col("raw_c") + 1).cast("double")
                / (F.col("nr") + DSIR_BUCKETS).cast("double")
            )
        ).alias("lratio"),
    )
    return lr


@register(
    "x62_dsir_importance",
    oracle=f"""
        {_DUCK_BIGRAM_BUCKETS},
        {_DUCK_DSIR_MODEL.format(target=DSIR_TARGET_LANG, src="mat",
                                 buckets=DSIR_BUCKETS)},
        scored AS (
            SELECT m.doc_id, m.lang,
                   CAST(SUM(m.c) AS BIGINT) AS n_feats,
                   ROUND(SUM(m.c * lr.lratio), 6) AS logw
            FROM mat m JOIN lr USING (b)
            GROUP BY m.doc_id, m.lang
        )
        SELECT doc_id, lang, n_feats, logw, logw > 0 AS selected
        FROM scored
    """,
    tags=("pipeline", "sampling"),
)
def x62_dsir_importance(spark: SparkSession, sf: str) -> DataFrame:
    """DSIR importance weighting (Xie et al. '23): log importance
    weight of every document under a hashed bigram bag-of-words
    model, log w(doc) = Σ_features [ln p_target(b) − ln p_raw(b)]
    with add-one smoothing over ``DSIR_BUCKETS`` hashed feature
    buckets; ``selected`` marks docs whose features are on net more
    target-like than the corpus average (log w > 0). The target
    distribution is estimated from the ``DSIR_TARGET_LANG`` partition,
    the raw distribution from the whole corpus — swap the target
    predicate for "joins the curated seed table" in production.

    Scale shape: ONE corpus scan builds the sparse (doc_id, lang, b,
    c) matrix (`_bigram_bucket_matrix`); the model collapses that
    matrix to ``DSIR_BUCKETS`` rows in one aggregate (raw and target
    counts as a conditional sum in the same pass — no second scan for
    the target); Zipf skew in bigram frequency is absorbed by
    map-side partial aggregation because the key space is the fixed
    bucket id, not the bigram. Scoring joins the SAME matrix to the
    broadcast log-ratio table and aggregates per doc_id — the matrix
    aggregate's exchange appears identically in both branches, so
    Catalyst's ReusedExchange materializes it once: one corpus scan
    total, one broadcast, one keyed shuffle — linear in corpus size,
    independent of target size. Cross-engine float discipline (x54
    convention): identical SUM(c·lratio) expression tree both
    engines, summation-order last-ulp noise absorbed by ROUND(·, 6),
    and ``selected`` compares the ROUNDED weight so the flag cannot
    flip between engines.
    """
    mat = _bigram_bucket_matrix(load(spark, sf, "documents"))
    lr = _dsir_model(mat)
    scored = (
        mat.join(F.broadcast(lr), "b")
        .groupBy("doc_id", "lang")
        .agg(
            F.sum("c").alias("n_feats"),
            F.round(F.sum(F.col("c") * F.col("lratio")), 6).alias("logw"),
        )
    )
    return scored.select(
        "doc_id",
        "lang",
        "n_feats",
        "logw",
        (F.col("logw") > 0).alias("selected"),
    )


@register(
    "x64_incremental_dsir",
    oracle=f"""
        {_DUCK_BIGRAM_BUCKETS},
        seen AS (SELECT * FROM mat WHERE doc_id % 2 = 0),
        {_DUCK_DSIR_MODEL.format(target=DSIR_TARGET_LANG, src="seen",
                                 buckets=DSIR_BUCKETS)},
        scored AS (
            SELECT m.doc_id, m.lang,
                   CAST(SUM(m.c) AS BIGINT) AS n_feats,
                   ROUND(SUM(m.c * COALESCE(lr.lratio, 0.0)), 6) AS logw
            FROM mat m LEFT JOIN lr USING (b)
            WHERE m.doc_id % 2 = 1
            GROUP BY m.doc_id, m.lang
        )
        SELECT doc_id, lang, n_feats, logw, logw > 0 AS selected
        FROM scored
    """,
    tags=("pipeline", "sampling", "incremental"),
)
def x64_incremental_dsir(spark: SparkSession, sf: str) -> DataFrame:
    """Ingestion-time DSIR — x62's scorer as a DELTA probe: the
    feature distributions are estimated ONCE from the SEEN corpus
    (even doc_id) and stored; each NEW batch (odd doc_id, standing in
    for today's crawl) is scored against that stored model without
    touching the corpus again. A feature hashing to a bucket the seen
    corpus never produced counts toward n_feats via the LEFT join (an
    inner join would silently drop it) but contributes 0 to the
    weight: a bucket NEITHER distribution has seen carries no
    evidence either way. Scoring it by the add-one smoothing artifact
    ln((nr+B)/(nt+B)) instead would ADD weight per unseen feature
    whenever the raw corpus outnumbers the target (nr > nt — i.e.
    always, in practice), so a fully-novel gibberish document would
    sail through the "looks like the curated corpus" gate with the
    HIGHEST score — fail-open, the exact opposite of the gate's
    purpose (review r5). Neutral-0 means an all-unseen doc scores
    exactly 0 and the strict logw > 0 gate rejects it.
    Completes the incremental family for data selection alongside
    dedup's x37 (MinHash) / x44 (embedding bands) / x59 (segments).

    Scale shape: per batch, ONE broadcast join of the batch's sparse
    matrix slice against the ``DSIR_BUCKETS``-row model and one
    (doc_id) aggregate — batch-sized work, corpus-independent. Model
    estimation reuses x62's one-aggregate build over the shared
    (doc_id, lang, b, c) matrix (`_bigram_bucket_matrix` →
    `_dsir_model`, the shared-helper convention of
    `_split_col`/`_mix_rates`, so batch and corpus scoring cannot
    drift); the matrix exchange feeds both the seen-model branch and
    the new-batch scoring branch, so ReusedExchange keeps it one
    corpus scan here too."""
    mat = _bigram_bucket_matrix(load(spark, sf, "documents"))
    lr = _dsir_model(mat.filter(F.col("doc_id") % 2 == 0))
    scored = (
        mat.filter(F.col("doc_id") % 2 == 1)
        .join(F.broadcast(lr), "b", "left")
        .groupBy("doc_id", "lang")
        .agg(
            F.sum("c").alias("n_feats"),
            F.round(
                F.sum(F.col("c") * F.coalesce(F.col("lratio"), F.lit(0.0))),
                6,
            ).alias("logw"),
        )
    )
    return scored.select(
        "doc_id",
        "lang",
        "n_feats",
        "logw",
        (F.col("logw") > 0).alias("selected"),
    )


# RefinedWeb-style anti-concentration: max documents one source may
# contribute. 18 < the fixture's 25-per-source, so the cap BINDS on
# every source at sf0.01 (non-vacuous both directions)
SOURCE_CAP = 18


@register(
    "x63_source_cap",
    oracle=f"""
        WITH ranked AS (
            SELECT doc_id, source,
                   ROW_NUMBER() OVER (
                       PARTITION BY source
                       ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                   ) AS rk
            FROM documents
        )
        SELECT doc_id, source, rk <= {SOURCE_CAP} AS kept
        FROM ranked
    """,
    tags=("pipeline", "sampling"),
)
def x63_source_cap(spark: SparkSession, sf: str) -> DataFrame:
    """Per-source document cap — the anti-concentration rule of
    RefinedWeb/Gopher-class pipelines (no domain may dominate the
    mix): each source keeps at most ``SOURCE_CAP`` documents, chosen
    by content-stable md5 order (doc_id tie-break), so re-runs and
    backfills select the identical survivor set — never rand(),
    never arrival order. Emits the full verdict table (x46
    convention) rather than just the survivors, so the drop volume
    is auditable.

    Scale shape: one shuffle on source, then a per-partition
    ROW_NUMBER. Sources are Zipf-skewed at web scale, so the exact
    form's sort-within-source is the cost; the production-scale
    refinement is a scan-local permille prefilter — keep only rows
    with md5-permille under ~2·CAP/n_s before the exact window —
    which bounds every partition to O(CAP) rows while provably
    containing the true top-CAP (same two-phase shape as x24's
    bucket cap). At fixture scale the direct window IS the right
    plan, so that prefilter is not wired in here.
    """
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        load(spark, sf, "documents")
        .select("doc_id", "source")
        .withColumn("rk", F.row_number().over(w))
        .select(
            "doc_id", "source", (F.col("rk") <= SOURCE_CAP).alias("kept")
        )
    )


# LLaMA-style epoch table: small curated strata repeat for >1 epoch.
# weight_s = min(CAP, sqrt(n_max / n_s)) — the α=0.5 temperature rule
# pointed UP (x51 points it down): the largest stratum stays at 1
# epoch, a 4x-smaller stratum gets 2, capped so a tiny stratum can't
# dominate through repetition
EPOCH_CAP = 3.0

# identical arithmetic TEXT on both engines (the _MIX_THR convention):
# the float tree must match operation-for-operation so the FLOOR
# boundaries cannot disagree; 1e-9 absorbs last-ulp division noise
_EPOCH_W = f"LEAST({EPOCH_CAP}, SQRT(CAST(nmax AS DOUBLE) / CAST(n AS DOUBLE)))"
_EPOCH_BASE = f"CAST(FLOOR({_EPOCH_W} + 1e-9) AS BIGINT)"
_EPOCH_FRAC_PERMILLE = (
    f"CAST(FLOOR(1000 * ({_EPOCH_W} - {_EPOCH_BASE}) + 1e-9) AS BIGINT)"
)


@register(
    "x66_epoch_upsample",
    oracle=f"""
        WITH c AS (
            SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang
        ),
        m AS (SELECT MAX(n) AS nmax FROM c),
        w AS (
            SELECT lang, {_EPOCH_BASE} AS base,
                   {_EPOCH_FRAC_PERMILLE} AS fr
            FROM c, m
        )
        SELECT d.doc_id, d.lang,
               w.base + CASE WHEN
                   ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 15))::BIGINT
                       % 1000 < w.fr
                   THEN 1 ELSE 0 END AS n_repeats
        FROM documents d JOIN w USING (lang)
    """,
    tags=("pipeline", "sampling"),
)
def x66_epoch_upsample(spark: SparkSession, sf: str) -> DataFrame:
    """The epoch table — per-document repeat counts that upsample
    small strata, the way curated sources train for >1 epoch while
    the web crawl trains for ~1 (the standard pretraining mix table;
    Rae et al. '21 table A3 lists per-subset sampling ratios above
    and below 1 for exactly this reason). Weight_s = min(EPOCH_CAP,
    sqrt(n_max/n_s)) — x51's α=0.5 temperature flattening pointed UP:
    the dominant stratum keeps 1 epoch, smaller strata repeat.
    Fractional weights round DETERMINISTICALLY per doc: a weight of
    1.7 repeats every doc once and gives a second repeat to the 70%
    of docs whose content-stable md5 permille falls under 700 — so
    the realized mix hits the target fraction exactly in expectation
    and is reproducible doc-by-doc (never rand(); a backfill
    recomputes the identical epoch table). Emitting counts instead of
    materialized copies keeps the operator corpus-sized;
    ``corpus.write_epoch_upsampled`` is where repeats become physical
    rows (via the same ``epoch_repeats`` helper, so the audit query
    and the written epoch can never disagree on the mix).

    Scale shape: one |strata|-row aggregate broadcast back onto a
    scan-local projection — the corpus never shuffles (x51's shape).
    Cross-engine float discipline: `_EPOCH_W`'s expression TEXT is
    spliced into both engines so the sqrt/division tree is identical,
    with the 1e-9 floor-guard absorbing last-ulp noise at the
    FLOOR boundaries."""
    return epoch_repeats(load(spark, sf, "documents"))


def epoch_weights(docs: DataFrame) -> DataFrame:
    """(lang, base, fr) — the |strata|-row epoch-weight table (integer
    epochs + fractional permille threshold), derived from the FULL
    corpus mix. Broadcast it onto whatever subset actually trains."""
    c = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    m = c.agg(F.max("n").alias("nmax"))
    return c.crossJoin(F.broadcast(m)).select(
        "lang",
        F.expr(_EPOCH_BASE).alias("base"),
        F.expr(_EPOCH_FRAC_PERMILLE).alias("fr"),
    )


def repeats_col():
    """n_repeats from a row carrying (doc_id, base, fr) — the
    deterministic fractional rounding shared by x66 and
    ``corpus.write_epoch_upsampled``. The permille bucket is
    ``corpus._permille_col`` itself (function-level import keeps the
    module import graph acyclic) — one definition of the x27 hashing
    convention, so the sampling predicates cannot drift."""
    from etl_spark.extensions.corpus import _permille_col

    return F.col("base") + F.when(
        _permille_col() < F.col("fr"), F.lit(1)
    ).otherwise(F.lit(0))


def epoch_repeats(docs: DataFrame) -> DataFrame:
    """(doc_id, lang, n_repeats) — core of x66 over any (doc_id,
    lang) frame, shared with ``corpus.write_epoch_upsampled``."""
    return docs.join(F.broadcast(epoch_weights(docs)), "lang").select(
        "doc_id", "lang", repeats_col().alias("n_repeats")
    )


# deterministic pseudo-random initial weights for the x67 classifier
# step — derived from md5 at import (the _BAND_PLANES convention) so
# BOTH engines receive identical literals and the oracle is exact
def _lr_w0(b: int) -> float:
    import hashlib

    h = int(hashlib.md5(f"lrw:{b}".encode()).hexdigest()[:15], 16)
    return round(h / float(1 << 60) - 0.5, 6)


_LR_W0 = [_lr_w0(b) for b in range(DSIR_BUCKETS)]
LR_RATE = 0.1  # gradient-descent step size


@register(
    "x67_quality_lr_step",
    oracle=f"""
        {_DUCK_BIGRAM_BUCKETS},
        w0(b, wt) AS (
            VALUES {", ".join(f"({b}, {w!r})" for b, w in enumerate(_LR_W0))}
        ),
        z AS (
            SELECT mat.doc_id,
                   CASE WHEN MIN(mat.lang) = '{DSIR_TARGET_LANG}'
                        THEN 1.0 ELSE 0.0 END AS y,
                   SUM(mat.c * w0.wt) AS z
            FROM mat JOIN w0 USING (b)
            GROUP BY mat.doc_id
        ),
        err AS (
            SELECT doc_id, 1.0 / (1.0 + exp(-z)) - y AS e FROM z
        ),
        n AS (SELECT COUNT(*) AS n_docs FROM z),
        grad AS (
            SELECT mat.b, SUM(err.e * mat.c) / n.n_docs AS g
            FROM mat JOIN err USING (doc_id), n
            GROUP BY mat.b, n.n_docs
        )
        SELECT grad.b, ROUND(grad.g, 6) AS grad,
               ROUND(w0.wt - {LR_RATE} * grad.g, 6) AS w_new
        FROM grad JOIN w0 USING (b)
    """,
    tags=("pipeline", "quality", "ml"),
)
def x67_quality_lr_step(spark: SparkSession, sf: str) -> DataFrame:
    """One batch gradient-descent step of a logistic-regression
    quality classifier over the hashed-bigram feature space — the
    fastText-style "train a linear classifier on bag-of-n-grams"
    primitive every production curation stack keeps beside its
    heuristics (CCNet, GPT-3's WebText-vs-crawl filter). Labels are
    target-language membership (swap for a curated seed in
    production); features are each doc's ``DSIR_BUCKETS`` bucket
    counts. Output is the full (b, grad, w_new) weight update —
    iterate by feeding w_new back, exactly the x39/x53 k-means
    assign/update pattern for the supervised case. Initial weights
    are md5-derived literals folded into both plans (the
    ``_BAND_PLANES`` convention), so the step is oracle-exact.

    Scale shape: the feature matrix is sparse (doc_id, b, count) —
    one aggregate; z is a broadcast join against the 64-row weight
    table plus a (doc_id) aggregate; the gradient re-joins per-doc
    error to the sparse matrix and collapses to ``DSIR_BUCKETS``
    rows. Nothing is ever wider than the corpus scan, the model is
    constant-size, and every shuffle is keyed — the classic
    "data-parallel GD where the model broadcasts" layout. Float
    discipline: one shared sigmoid/ln-free expression tree, noise
    absorbed by ROUND(·, 6) on the OUTPUT only (z stays unrounded on
    both engines, so the trees match exactly). The sparse matrix is
    the shared ``_bigram_bucket_matrix`` (= the oracle's ``mat`` CTE),
    so x62/x64/x67 hold ONE definition of the feature matrix."""
    cnt = _bigram_bucket_matrix(load(spark, sf, "documents"))
    w0 = spark.createDataFrame(
        list(enumerate(_LR_W0)), "b int, wt double"
    )
    z = (
        cnt.join(F.broadcast(w0), "b")
        .groupBy("doc_id")
        .agg(
            F.when(
                F.min("lang") == DSIR_TARGET_LANG, F.lit(1.0)
            ).otherwise(F.lit(0.0)).alias("y"),
            F.sum(F.col("c") * F.col("wt")).alias("z"),
        )
    )
    err = z.select(
        "doc_id",
        (F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("z"))) - F.col("y")).alias(
            "e"
        ),
    )
    n = z.agg(F.count(F.lit(1)).alias("n_docs"))
    grad = (
        cnt.join(err, "doc_id")
        .crossJoin(F.broadcast(n))
        .groupBy("b", "n_docs")
        .agg((F.sum(F.col("e") * F.col("c")) / F.first("n_docs")).alias("g"))
    )
    return grad.join(F.broadcast(w0), "b").select(
        "b",
        F.round("g", 6).alias("grad"),
        F.round(F.col("wt") - LR_RATE * F.col("g"), 6).alias("w_new"),
    )


def train_quality_lr(
    docs: DataFrame, steps: int = 5, lr: float = LR_RATE
) -> list[float]:
    """Iterate x67's gradient step ``steps`` times and return the
    trained weight vector — the x29/x39-style driver loop for the
    supervised case. Per step: the sparse (doc_id, b, count) matrix
    is scanned twice (forward z, backward gradient) against the
    broadcast weight table, and only the ``DSIR_BUCKETS`` gradients
    ever reach the driver (a 64-float collect per step — the model,
    not the data). The feature matrix is persisted once across all
    steps; at cluster scale swap the persist for a staging table and
    nothing else changes.

    Returned weights are ROUNDED to 6 per step (x67's convention), so
    a re-run — or a DuckDB re-derivation — reproduces the identical
    trajectory: training is deterministic, batch, full-data; there is
    no rand() and no row-order dependence anywhere."""
    from pyspark.storagelevel import StorageLevel

    cnt = _bigram_bucket_matrix(docs).persist(StorageLevel.MEMORY_AND_DISK)
    spark = docs.sparkSession
    w = list(_LR_W0)
    try:
        for _ in range(steps):
            w_df = spark.createDataFrame(
                list(enumerate(w)), "b int, wt double"
            )
            z = (
                cnt.join(F.broadcast(w_df), "b")
                .groupBy("doc_id")
                .agg(
                    F.when(
                        F.min("lang") == DSIR_TARGET_LANG, F.lit(1.0)
                    ).otherwise(F.lit(0.0)).alias("y"),
                    F.sum(F.col("c") * F.col("wt")).alias("z"),
                )
            )
            err = z.select(
                "doc_id",
                (
                    F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("z")))
                    - F.col("y")
                ).alias("e"),
            )
            n = z.agg(F.count(F.lit(1)).alias("n_docs"))
            grad_rows = (
                cnt.join(err, "doc_id")
                .crossJoin(F.broadcast(n))
                .groupBy("b", "n_docs")
                .agg(
                    (F.sum(F.col("e") * F.col("c")) / F.first("n_docs")).alias(
                        "g"
                    )
                )
                .collect()
            )
            for r in grad_rows:
                w[r.b] = round(w[r.b] - lr * r.g, 6)
    finally:
        cnt.unpersist()
    return w


def score_quality_lr(docs: DataFrame, weights: list[float]) -> DataFrame:
    """Apply a trained x67 weight vector: (doc_id, lang, p) where p is
    the classifier's target-likeness probability — the scoring half of
    the fastText-style gate (filter on ``p`` downstream, or sample
    with probability proportional to it the way GPT-3's WebText
    filter did). EVERY input doc gets a row: featureless (sub-2-word)
    docs score the no-evidence prior sigmoid(0) = 0.5 via the left
    join back — silently omitting them would lose docs with no
    accounting in any downstream inner join (``dsir_score_batch``'s
    fail-closed convention). Plan: one broadcast join on the bucket
    id, one (doc_id) aggregate, then a doc_id-keyed join of the
    corpus id/lang projection against the aggregate (one further
    shuffle — the price of the every-doc guarantee)."""
    spark = docs.sparkSession
    w_df = spark.createDataFrame(
        list(enumerate(weights)), "b int, wt double"
    )
    feats = _bigram_bucket_feats(docs)
    scored = (
        feats.groupBy("doc_id", "b")
        .agg(F.count(F.lit(1)).alias("c"))
        .join(F.broadcast(w_df), "b")
        .groupBy("doc_id")
        .agg(
            F.round(
                F.lit(1.0)
                / (F.lit(1.0) + F.exp(-F.sum(F.col("c") * F.col("wt")))),
                6,
            ).alias("p")
        )
    )
    return docs.select("doc_id", "lang").join(scored, "doc_id", "left").select(
        "doc_id", "lang", F.coalesce(F.col("p"), F.lit(0.5)).alias("p")
    )

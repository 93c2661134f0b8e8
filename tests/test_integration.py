"""End-to-end integration: the reference's full production workflow
(upload → auto-created staging → scheduled SQL transform → threshold
alert → styled report → email), composed entirely from this engine's
layers. A reference user's daily loop, run as one test:

  upload edge     uploads/excel_to_db.py  → read_landing + normalize
  staging load    excel_to_db auto-create → append (S7/S5)
  transform       web_scheduler task loop → Orchestrator + run_script
  monitoring      _check_sql_alert_internal → AlertEngine (T8)
  report          styled xlsx export      → xlsx_writer (S8)
  notify          SMTP send               → SMTPNotifier (S9)
"""

from __future__ import annotations

import zipfile
from datetime import datetime

import pytest


@pytest.fixture()
def idb(spark, tmp_path):
    name = f"intg_{abs(hash(str(tmp_path))) % 10**9}"
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {name}")
    yield name
    spark.sql(f"DROP DATABASE IF EXISTS {name} CASCADE")


def test_reference_workflow_end_to_end(spark, idb, tmp_path):
    from etl_spark.alerting import AlertEngine, AlertSpec, SMTPNotifier
    from etl_spark.orchestrator import Orchestrator, TaskSpec
    from etl_spark.sources import append, read_landing
    from etl_spark.sources.excel import normalize_columns
    from etl_spark.sql_runner import run_script

    # 1. upload edge: a landing CSV with messy human headers
    landing = tmp_path / "upload.csv"
    landing.write_text(
        "Order ID,Shop Name,Total Price,Order Date\n"
        "1,shopA,10.5,2024-06-01\n"
        "2,shopA,20.0,2024-06-01\n"
        "3,shopB,7.25,2024-06-02\n"
        "4,shopB,2.75,2024-06-02\n"
        "5,shopC,99.0,2024-06-03\n"
    )
    staged = normalize_columns(read_landing(spark, str(landing), fmt="csv"))
    assert staged.columns == ["order_id", "shop_name", "total_price", "order_date"]
    append(staged, f"{idb}.stage_orders")  # S7 auto-create + S5 append

    # 2. scheduled transform: the reference's INSERT..SELECT script,
    # run by the orchestrator on its cron tick
    transform_sql = f"""
        CREATE TABLE IF NOT EXISTS {idb}.dws_shop_daily (
            shop STRING, day STRING, n BIGINT, revenue DOUBLE
        ) USING parquet;
        TRUNCATE TABLE {idb}.dws_shop_daily;
        INSERT INTO {idb}.dws_shop_daily
        SELECT shop_name, order_date, COUNT(*) ,
               CAST(SUM(CAST(total_price AS DECIMAL(18,2))) AS DOUBLE)
        FROM {idb}.stage_orders GROUP BY shop_name, order_date;
    """

    def transform(s):
        results = run_script(s, transform_sql)
        assert all(r.ok for r in results), [r.error for r in results]

    orch = Orchestrator(spark, db=f"{idb}_meta")
    now = datetime(2024, 6, 4, 2, 0)
    orch.register(
        TaskSpec(1, "daily-transform", transform, cron="0 2 * * *"), now=now
    )
    # due immediately at the registered cron boundary's next fire → tick past it
    outcomes = orch.tick(datetime(2024, 6, 5, 2, 0, 30))
    assert outcomes == {1: "success"}
    assert orch.latest_statuses()[1] == "success"
    rollup = {
        (r.shop, r.day): (r.n, r.revenue)
        for r in spark.table(f"{idb}.dws_shop_daily").collect()
    }
    assert rollup[("shopA", "2024-06-01")] == (2, 30.5)
    assert len(rollup) == 3

    # 3. monitoring + styled report + email, in one alert check
    sent = []

    class FakeSMTP:
        def __init__(self, host, port):
            sent.append(self)
            self.msgs = []

        def __enter__(self):
            return self

        def __exit__(self, *a):
            pass

        def send_message(self, msg):
            self.msgs.append(msg)

    notifier = SMTPNotifier(
        host="mail.local", sender="etl@local", recipients=("ops@local",),
        smtp_factory=FakeSMTP,
    )
    engine = AlertEngine(spark, notifier=notifier, db=f"{idb}_alerts")
    report = str(tmp_path / "shop_report.xlsx")
    res = engine.check(
        AlertSpec(
            alert_id=7,
            name="daily revenue rows",
            sql=f"SELECT shop AS `店铺`, day AS `日期`, n, revenue "
            f"FROM {idb}.dws_shop_daily",
            condition="rows_gt",
            threshold=2,
            export_path=report,
        ),
        now=datetime(2024, 6, 5, 2, 1),
    )
    assert res.triggered and res.n_rows == 3

    # styled workbook on disk, attached to the email
    with zipfile.ZipFile(report) as z:
        sheet = z.read("xl/worksheets/sheet1.xml")
        assert b"customWidth" in sheet and "店铺".encode() in sheet
    (smtp,) = sent
    (msg,) = smtp.msgs
    assert msg["To"] == "ops@local"
    atts = list(msg.iter_attachments())
    assert len(atts) == 1 and atts[0].get_filename() == "shop_report.xlsx"

    # 4. audit trail exists on both sides (T10)
    assert orch.logs().count() == 1
    assert engine.alert_logs().count() == 1


def test_llm_ingest_loop_end_to_end(spark, sf_dir, tmp_path):
    """The full streaming ingest loop for a training-data pipeline,
    three stages CHAINED (each stage's accepted output is the next
    stage's stream source):

      raw batches → [validate + DLQ] → [near-dup filter vs durable
      index] → [DSIR selection gate] → accepted corpus

    Fixture: 2 micro-batches of 4 docs — one schema-invalid (NULL
    text), one near-dup of a batch-1 doc, one clearly off-target
    (non-target bigrams), and clean target-like docs. Asserts each
    row is dropped at exactly the stage that owns its defect, and the
    final corpus is exactly the clean target-like survivors."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from etl_spark.extensions.dedup import band_keys_of
    from etl_spark.extensions.resampling import DSIR_TARGET_LANG
    from etl_spark.streaming.neardup import run_neardup_ingest
    from etl_spark.streaming.selection import build_dsir_model, run_dsir_gate
    from etl_spark.streaming.sinks import run_validating_sink

    # the model's "curated corpus": the fixture docs; target-like
    # fixture texts are chosen BY THE SCORER itself (x62 selected —
    # verbatim text reproduces the same logw under the same model),
    # so the test never guesses what the model considers on-target
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    build_dsir_model(docs, str(tmp_path / "model"))
    from etl_spark.registry import all_specs

    selected_ids = [
        r.doc_id
        for r in sorted(
            all_specs()["x62_dsir_importance"].fn(spark, sf_dir).collect(),
            key=lambda r: -r.logw,
        )
        if r.selected
    ][:2]
    assert len(selected_ids) == 2, "fixture has too few selected docs"
    texts = {
        r.doc_id: r.text
        for r in docs.filter(
            docs.doc_id.isin([int(i) for i in selected_ids])
        ).collect()
    }
    tgt_text_1, tgt_text_2 = (texts[i] for i in selected_ids)
    words_1 = tgt_text_1.split(" ")
    dup_of_1 = " ".join(words_1[:-1] + ["changed"])
    off_target = " ".join(f"zz{i:02d}" for i in range(40))

    raw = tmp_path / "raw"
    raw.mkdir()

    def write_batch(name, rows, mtime):
        pq.write_table(
            pa.table({
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "lang": [r[1] for r in rows],
                "text": [r[2] for r in rows],
            }),
            raw / name,
        )
        os.utime(raw / name, (mtime, mtime))

    write_batch("b0.parquet", [
        (1, DSIR_TARGET_LANG, tgt_text_1),
        (2, DSIR_TARGET_LANG, None),          # invalid: NULL text
    ], 1000000000)
    write_batch("b1.parquet", [
        (3, DSIR_TARGET_LANG, dup_of_1),      # near-dup of doc 1
        (4, DSIR_TARGET_LANG, tgt_text_2),
        (5, "de", off_target),                # gate should reject
    ], 1000000100)

    schema = "doc_id bigint, lang string, text string"

    def stream_of(path):
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .option("recursiveFileLookup", "true")
            .parquet(str(path))
        )

    # stage 1: validation + dead-letter queue
    q = run_validating_sink(
        stream_of(raw),
        rules={"text_present": "text IS NOT NULL AND length(text) > 0"},
        out_path=str(tmp_path / "valid"),
        dlq_path=str(tmp_path / "dlq"),
        checkpoint=str(tmp_path / "ck1"),
    )
    q.awaitTermination(120)
    dlq = spark.read.option("recursiveFileLookup", "true").parquet(
        str(tmp_path / "dlq")
    )
    assert {r.doc_id for r in dlq.collect()} == {2}
    assert "_violations" in dlq.columns

    # stage 2: near-dup filter against a durable band index
    q = run_neardup_ingest(
        stream_of(tmp_path / "valid"),
        band_keys_of,
        id_col="doc_id",
        index_path=str(tmp_path / "idx"),
        out_path=str(tmp_path / "nodup"),
        checkpoint=str(tmp_path / "ck2"),
    )
    q.awaitTermination(120)
    nodup_ids = {
        r.doc_id
        for r in spark.read.option("recursiveFileLookup", "true")
        .parquet(str(tmp_path / "nodup"))
        .collect()
    }
    assert 3 not in nodup_ids, "near-dup slipped past the band index"
    assert {1, 4, 5} <= nodup_ids

    # stage 3: DSIR selection gate
    q = run_dsir_gate(
        stream_of(tmp_path / "nodup"),
        model_path=str(tmp_path / "model"),
        out_path=str(tmp_path / "corpus"),
        checkpoint=str(tmp_path / "ck3"),
    )
    q.awaitTermination(120)
    final = spark.read.option("recursiveFileLookup", "true").parquet(
        str(tmp_path / "corpus")
    )
    got = {r.doc_id for r in final.collect()}
    assert 5 not in got, "off-target doc passed the selection gate"
    assert got == {1, 4}, got
    assert "logw" in final.columns  # selection evidence rides along


def test_production_curation_pipeline_shared_cc(spark, tmp_path):
    """VERDICT r13 #5: the composed PRODUCTION pipeline — streaming
    ingest through the semantic-decontamination gate, then the
    shared-pair CC verdict feeding the curated-parquet write AND the
    budget report in one call — run at the driver's sf0.01 scale,
    asserting the files==report identity END TO END (per-(lang,
    split) counts recomputed from the written files equal the report
    rows exactly) and that every decon-flagged doc is absent from the
    files. The unit identity (write_curated_corpus vs x47) lives in
    test_r13; this exercises the composed streaming+batch run through
    the shared-pair path with an upstream exclusion."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from etl_spark.extensions.pipeline import (
        EVAL_SOURCE,
        _split_col,
        write_curated_corpus,
    )
    from etl_spark.extensions.textstats import quality_keep_col
    from etl_spark.streaming.neardup import build_decon_index, run_decon_ingest
    from etl_spark.tables import load

    sf = "/root/testdata/sf0.01"  # the driver's CORRECTNESS scale
    docs = load(spark, sf, "documents").select("doc_id", "source")
    emb = load(spark, sf, "embeddings")
    joined = emb.join(docs, emb.vec_id == docs.doc_id)

    # stage 1: static eval index for the decon gate
    build_decon_index(
        joined.filter(F.col("source") == EVAL_SOURCE).select(
            "vec_id", "embedding"
        ),
        str(tmp_path / "eval_idx"),
    )

    # stage 2: stream the train corpus through the ingest gate in two
    # micro-batches (plain files => maxFilesPerTrigger batches)
    train = (
        joined.filter(F.col("source") != EVAL_SOURCE)
        .select(F.col("vec_id").alias("doc_id"), "embedding")
        .collect()
    )
    src = tmp_path / "train_src"
    src.mkdir()
    half = len(train) // 2
    for i, chunk in enumerate((train[:half], train[half:])):
        pq.write_table(
            pa.table(
                {
                    "doc_id": [r.doc_id for r in chunk],
                    "embedding": [list(r.embedding) for r in chunk],
                }
            ),
            str(src / f"part-{i}.parquet"),
        )
        # pin strictly increasing mtimes: FileStreamSource orders by
        # mtime and back-to-back writes can tie under host load
        os.utime(str(src / f"part-{i}.parquet"), (1000000000 + i * 100,) * 2)
    stream = (
        spark.readStream.schema("doc_id bigint, embedding array<double>")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = run_decon_ingest(
        stream,
        id_col="doc_id",
        emb_col="embedding",
        index_path=str(tmp_path / "eval_idx"),
        out_path=str(tmp_path / "clean"),
        flagged_path=str(tmp_path / "flagged"),
        checkpoint=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(180)
    flagged = spark.read.option("recursiveFileLookup", "true").parquet(
        str(tmp_path / "flagged")
    )
    flagged_ids = {r.doc_id for r in flagged.select("doc_id").collect()}
    assert flagged_ids, "fixture decon gate flagged nothing — vacuous test"

    # stage 3: shared-pair CC verdict -> curated write + budget report,
    # with the decon drop list excluded upstream of BOTH
    out = str(tmp_path / "curated")
    report = write_curated_corpus(
        spark, sf, out, exclude=flagged.select("doc_id")
    )
    rep = {(r.lang, r.split): (r.n_docs, r.n_tokens) for r in report.collect()}

    written = spark.read.parquet(out)
    # files==report identity, recomputed from the FILES
    from_files = {
        (r.lang, r.split): (r.n_docs, r.n_tokens)
        for r in written.select(
            "lang",
            _split_col().alias("split"),
            F.size(F.split("text", " ")).alias("n_tok"),
        )
        .groupBy("lang", "split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("n_tokens"),
        )
        .collect()
    }
    assert from_files == rep
    # decon exclusions actually left the corpus
    written_ids = {r.doc_id for r in written.select("doc_id").collect()}
    assert not (written_ids & flagged_ids)
    # and the standing gates still hold on every written row
    assert written.filter(~quality_keep_col()).count() == 0
    assert len(written_ids) == written.count()

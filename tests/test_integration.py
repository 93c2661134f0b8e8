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

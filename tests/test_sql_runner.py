"""Multi-statement SQL runner tests (§2.9): quote-aware splitting,
SELECT classification, sequential side effects, per-statement errors."""

from __future__ import annotations

import pytest

from etl_spark.sql_runner import classify, run_script, split_statements


def test_split_basic():
    assert split_statements("SELECT 1; SELECT 2;") == ["SELECT 1", "SELECT 2"]


def test_split_quoted_semicolons():
    """The reference's splitter breaks here (web_scheduler.py:921)."""
    s = "SELECT 'a;b' AS x; INSERT INTO t VALUES (\"c;d\");"
    assert split_statements(s) == ["SELECT 'a;b' AS x", 'INSERT INTO t VALUES ("c;d")']


def test_split_comments_and_escapes():
    s = (
        "-- leading; comment\nSELECT 1; /* block; comment */ SELECT 'it''s; fine';"
        " SELECT `weird;col` FROM t"
    )
    got = split_statements(s)
    assert len(got) == 3
    assert got[1].endswith("SELECT 'it''s; fine'")
    assert got[2] == "SELECT `weird;col` FROM t"


def test_classify():
    assert classify("  select 1") == "rows"
    assert classify("WITH t AS (SELECT 1) SELECT * FROM t") == "rows"
    assert classify("SHOW TABLES") == "rows"
    assert classify("INSERT INTO t VALUES (1)") == "exec"
    assert classify("CREATE TABLE t (a INT)") == "exec"


@pytest.fixture()
def db(spark, tmp_path):
    name = f"r_{abs(hash(str(tmp_path))) % 10**9}"
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {name}")
    spark.sql(f"USE {name}")
    yield name
    spark.sql("USE default")
    spark.sql(f"DROP DATABASE IF EXISTS {name} CASCADE")


def test_run_script_pipeline(spark, db):
    """The production script-30 shape: DDL, load, truncate-refresh
    transform, monitored SELECT (SURVEY.md §0 pipeline)."""
    script = """
        CREATE TABLE stage (id INT, price DOUBLE) USING parquet;
        INSERT INTO stage VALUES (1, 10.0), (2, 20.5);
        CREATE TABLE dwd (id INT, price DOUBLE) USING parquet;
        TRUNCATE TABLE dwd;
        INSERT INTO dwd SELECT * FROM stage;
        SELECT id AS `订单号`, price AS `总价格` FROM dwd;
    """
    results = run_script(spark, script)
    assert [r.kind for r in results] == ["exec"] * 5 + ["rows"]
    assert all(r.ok for r in results)
    rows = results[-1].df.collect()
    assert len(rows) == 2
    assert results[-1].df.columns == ["订单号", "总价格"]


def test_run_script_stops_on_error(spark, db):
    results = run_script(
        spark, "CREATE TABLE ok1 (a INT) USING parquet; SELECT * FROM nope_missing; SELECT 1"
    )
    assert len(results) == 2
    assert results[0].ok and not results[1].ok
    assert "nope_missing" in results[1].error or "TABLE_OR_VIEW_NOT_FOUND" in results[1].error


def test_run_script_continue_on_error(spark, db):
    results = run_script(spark, "SELECT * FROM missing_t; SELECT 42 AS x", stop_on_error=False)
    assert len(results) == 2
    assert results[1].df.collect()[0]["x"] == 42


def test_classify_skips_leading_comments_and_parens():
    from etl_spark.sql_runner import classify

    assert classify("-- note\nSELECT 1") == "rows"
    assert classify("/* block */ SELECT 1") == "rows"
    assert classify("(SELECT 1)") == "rows"
    assert classify("WITH t AS (SELECT 1) SELECT * FROM t") == "rows"
    assert classify("-- only a comment") == "exec"
    assert classify("/* c */ INSERT INTO t VALUES (1)") == "exec"

"""M2 IO layer tests: writers (append / truncate-load / auto-create /
upsert / delete / update), records source, Excel bridge gating,
landing reader, catalog resolution."""

from __future__ import annotations

import pytest
from pyspark.sql import Row, functions as F

from etl_spark.sources import (
    append,
    ensure_table,
    excel_available,
    read_landing,
    records_to_df,
    truncate_load,
    upsert,
)
from etl_spark.sources.excel import normalize_columns, read_excel, write_report_csv
from etl_spark.sources.writers import delete_where, update_set
from etl_spark import catalog as cat


@pytest.fixture()
def db(spark, tmp_path):
    """Isolated database per test so managed-table names don't collide."""
    name = f"t_{abs(hash(str(tmp_path))) % 10**9}"
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {name}")
    yield name
    spark.sql(f"DROP DATABASE IF EXISTS {name} CASCADE")


def _sample(spark, n=5, offset=0):
    return spark.createDataFrame(
        [Row(id=i + offset, name=f"n{i + offset}", val=float(i)) for i in range(n)]
    )


def test_auto_create_and_append(spark, db):
    df = _sample(spark)
    t = f"{db}.loads"
    assert ensure_table(df, t) is True
    assert ensure_table(df, t) is False
    append(df, t)
    append(df, t)
    assert spark.table(t).count() == 10


def test_append_aligns_columns_by_name(spark, db):
    t = f"{db}.aligned"
    append(_sample(spark), t)
    shuffled = _sample(spark, offset=100).select("val", "id", "name")
    append(shuffled, t)
    got = spark.table(t).filter(F.col("id") == 100).collect()
    assert got[0]["name"] == "n100"


def test_truncate_load_replaces(spark, db):
    t = f"{db}.fullref"
    append(_sample(spark, 7), t)
    truncate_load(_sample(spark, 3, offset=50), t)
    rows = spark.table(t).collect()
    assert len(rows) == 3
    assert all(r.id >= 50 for r in rows)


def test_upsert_replaces_matching_keys(spark, db):
    t = f"{db}.ups"
    append(_sample(spark, 5), t)  # ids 0..4
    updates = spark.createDataFrame(
        [Row(id=3, name="updated", val=99.0), Row(id=10, name="new", val=1.0)]
    )
    upsert(updates, t, keys=["id"])
    got = {r.id: r for r in spark.table(t).collect()}
    assert len(got) == 6
    assert got[3]["name"] == "updated"
    assert got[10]["name"] == "new"
    assert got[2]["name"] == "n2"


def test_delete_where(spark, db):
    t = f"{db}.dels"
    append(_sample(spark, 6), t)
    n = delete_where(spark, t, "id >= 4")
    assert n == 2
    assert spark.table(t).count() == 4


def test_update_set_computed(spark, db):
    """The reference's `SET is_active = NOT is_active` computed update
    (web_scheduler.py:4954-4958)."""
    t = f"{db}.upd"
    append(_sample(spark, 4), t)
    n = update_set(spark, t, {"val": "val * 2", "name": "upper(name)"}, "id < 2")
    assert n == 2
    got = {r.id: r for r in spark.table(t).collect()}
    assert got[0]["val"] == 0.0 and got[1]["val"] == 2.0 and got[1]["name"] == "N1"
    assert got[2]["val"] == 2.0 and got[2]["name"] == "n2"


def test_records_source_infers_and_respects_schema(spark):
    recs = [{"a": 1, "b": "x"}, {"a": 2, "b": "y"}]
    df = records_to_df(spark, recs)
    assert df.count() == 2 and set(df.columns) == {"a", "b"}
    typed = records_to_df(spark, recs, schema="a INT, b STRING")
    assert dict(typed.dtypes)["a"] == "int"


def test_landing_csv_roundtrip(spark, tmp_path):
    p = str(tmp_path / "land.csv")
    _sample(spark, 4).toPandas().to_csv(p, index=False)
    df = read_landing(spark, p, fmt="csv")
    assert df.count() == 4
    assert dict(df.dtypes)["id"] in ("int", "bigint")


def test_excel_gating(spark, tmp_path):
    """openpyxl is absent in this container: the xlsx paths must fail
    loudly, the CSV report fallback must work."""
    if excel_available():
        pytest.skip("openpyxl installed; gating path not applicable")
    with pytest.raises(RuntimeError, match="openpyxl"):
        read_excel(spark, str(tmp_path / "x.xlsx"))
    out = str(tmp_path / "report.csv")
    n = write_report_csv(_sample(spark, 3), out)
    assert n == 3
    with open(out) as fh:
        assert fh.readline().strip() == "id,name,val"


def test_normalize_columns(spark):
    df = spark.createDataFrame([Row(**{"Order Number": 1, "总价/Total": 2.0})])
    out = normalize_columns(df)
    assert out.columns == ["order_number", "总价_total"]


def test_catalog_resolution(spark, db):
    append(_sample(spark, 2), f"{db}.findme")
    sql = "SELECT * FROM wrongdb.findme JOIN other.missing ON 1=1"
    assert cat.extract_tables(sql) == [("wrongdb", "findme"), ("other", "missing")]
    resolved = cat.resolve_sql(spark, sql)
    assert f"{db}.findme" in resolved
    assert "other.missing" in resolved  # unfound names left alone


# ---------- S2: JDBC source/sink configuration ----------


def test_jdbc_read_options_partitioned():
    from etl_spark.sources.jdbc import jdbc_read_options

    opts = jdbc_read_options(
        url="jdbc:mysql://192.0.2.1:9030/erp_system",
        table="dwd_sale_shopify_order_di",
        partition_column="id",
        lower_bound=0,
        upper_bound=1_000_000,
        num_partitions=32,
    )
    assert opts["dbtable"] == "dwd_sale_shopify_order_di"
    assert opts["partitionColumn"] == "id"
    assert (opts["lowerBound"], opts["upperBound"], opts["numPartitions"]) == (
        "0",
        "1000000",
        "32",
    )
    assert opts["fetchsize"] == "10000"


def test_jdbc_read_options_validation():
    import pytest as _pytest

    from etl_spark.sources.jdbc import jdbc_read_options

    with _pytest.raises(ValueError):
        jdbc_read_options(url="jdbc:x", table="t", query="SELECT 1")
    with _pytest.raises(ValueError):
        jdbc_read_options(url="jdbc:x")
    with _pytest.raises(ValueError):
        jdbc_read_options(url="jdbc:x", table="t", partition_column="id")
    with _pytest.raises(ValueError):
        jdbc_read_options(
            url="jdbc:x",
            query="SELECT 1",
            partition_column="id",
            lower_bound=0,
            upper_bound=10,
            num_partitions=2,
        )


def test_jdbc_reader_writer_construct(spark, sf_dir):
    from etl_spark.sources.jdbc import jdbc_reader, jdbc_writer
    from etl_spark.tables import load

    reader = jdbc_reader(spark, url="jdbc:postgresql://h/db", query="SELECT 1 AS x")
    assert reader is not None  # configured; .load() needs a driver jar
    writer = jdbc_writer(
        load(spark, sf_dir, "region"),
        url="jdbc:mysql://h/db",
        table="t",
        mode="overwrite",
        truncate="true",
    )
    assert writer is not None


# ---------- O4/O5/A8: pagination + preview ----------


def test_paginate_math_and_stability(spark, sf_dir):
    from pyspark.sql import functions as F

    from etl_spark.operators.pagination import paginate
    from etl_spark.tables import load

    orders = load(spark, sf_dir, "orders")
    pg = paginate(orders, [F.desc("o_orderdate"), F.asc("o_orderkey")], page=3, per_page=25)
    assert pg.total == orders.count()
    assert pg.pages == -(-pg.total // 25)
    rows = pg.rows.collect()
    assert len(rows) == 25
    # page 3 == rows 50..74 of the full stable ordering
    full = orders.orderBy(F.desc("o_orderdate"), F.asc("o_orderkey")).collect()
    assert [r.o_orderkey for r in rows] == [r.o_orderkey for r in full[50:75]]


def test_paginate_clamps_per_page(spark, sf_dir):
    from etl_spark.operators.pagination import paginate
    from etl_spark.tables import load

    pg = paginate(load(spark, sf_dir, "nation"), ["n_nationkey"], per_page=5000)
    assert pg.per_page == 100  # web_scheduler.py:5239 clamp


def test_head_preview(spark, sf_dir):
    from etl_spark.operators.pagination import head_preview
    from etl_spark.tables import load

    rows = head_preview(load(spark, sf_dir, "region"), n=3)
    assert len(rows) == 3
    assert set(rows[0]) == {"r_regionkey", "r_name"}


# ---- partition-scoped DML (VERDICT r1 fix #2) -------------------------


def _table_files(spark, table):
    """{relative_path: mtime} for every data file of a managed table."""
    import os

    loc = next(
        r.data_type
        for r in spark.sql(f"DESCRIBE FORMATTED {table}").collect()
        if r.col_name.strip() == "Location"
    ).removeprefix("file:")
    out = {}
    for root, _, files in os.walk(loc):
        for f in files:
            if f.endswith(".parquet"):
                p = os.path.join(root, f)
                out[os.path.relpath(p, loc)] = os.path.getmtime(p)
    return out


def _part_table(spark, db, name="pdml"):
    from etl_spark.sources.writers import partitioned_save

    t = f"{db}.{name}"
    df = spark.createDataFrame(
        [Row(id=i, day=f"d{i % 3}", val=float(i)) for i in range(12)]
    )
    partitioned_save(df, t, ["day"])
    return t


def test_upsert_partitioned_rewrites_only_touched_partition(spark, db):
    t = _part_table(spark, db)
    before = _table_files(spark, t)
    delta = spark.createDataFrame([Row(id=0, day="d0", val=999.0)])
    upsert(delta, t, keys=["id"])
    after = _table_files(spark, t)
    untouched_before = {p: m for p, m in before.items() if "day=d0" not in p}
    untouched_after = {p: m for p, m in after.items() if "day=d0" not in p}
    # d1/d2 partitions: identical files, identical mtimes — never rewritten
    assert untouched_before == untouched_after
    # d0 was rewritten
    assert {p for p in before if "day=d0" in p} != {p for p in after if "day=d0" in p}
    got = {r.id: r for r in spark.table(t).collect()}
    assert len(got) == 12 and got[0]["val"] == 999.0 and got[1]["val"] == 1.0


def test_upsert_partitioned_key_moves_partition(spark, db):
    """A merged key whose new row lands in a DIFFERENT partition must
    vanish from the old one (both partitions are touched)."""
    t = _part_table(spark, db)
    delta = spark.createDataFrame([Row(id=3, day="d2", val=42.0)])  # was day=d0
    upsert(delta, t, keys=["id"])
    rows = spark.table(t).filter("id = 3").collect()
    assert len(rows) == 1 and rows[0]["day"] == "d2" and rows[0]["val"] == 42.0
    assert spark.table(t).count() == 12


def test_delete_where_partitioned_scoped_and_drops_empty(spark, db):
    t = _part_table(spark, db)
    before = _table_files(spark, t)
    n = delete_where(spark, t, "day = 'd2'")  # empties the whole partition
    assert n == 4
    after = _table_files(spark, t)
    kept_before = {p: m for p, m in before.items() if "day=d2" not in p}
    kept_after = {p: m for p, m in after.items() if "day=d2" not in p}
    assert kept_before == kept_after  # d0/d1 untouched on disk
    assert spark.table(t).count() == 8
    assert not any("day=d2" in p for p in after)
    parts = {r[0] for r in spark.sql(f"SHOW PARTITIONS {t}").collect()}
    assert parts == {"day=d0", "day=d1"}


def test_delete_where_null_predicate_keeps_row(spark, db):
    """SQL DELETE semantics: a NULL predicate is not TRUE — the row
    stays (ADVICE r1: bare NOT(cond) deleted NULL rows)."""
    t = f"{db}.delnull"
    spark.createDataFrame(
        [Row(id=1, val=5.0), Row(id=2, val=None), Row(id=3, val=20.0)],
        schema="id INT, val DOUBLE",
    ).write.saveAsTable(t)
    n = delete_where(spark, t, "val > 10")
    assert n == 1
    ids = {r.id for r in spark.table(t).collect()}
    assert ids == {1, 2}  # NULL-val row survives


def test_update_set_partitioned_scoped(spark, db):
    t = _part_table(spark, db)
    before = _table_files(spark, t)
    n = update_set(spark, t, {"val": "val + 100"}, "day = 'd1'")
    assert n == 4
    after = _table_files(spark, t)
    kept_before = {p: m for p, m in before.items() if "day=d1" not in p}
    kept_after = {p: m for p, m in after.items() if "day=d1" not in p}
    assert kept_before == kept_after
    assert spark.table(t).filter("day = 'd1'").agg(F.min("val")).collect()[0][0] >= 100.0
    assert spark.table(t).filter("day = 'd0'").agg(F.max("val")).collect()[0][0] < 100.0


def test_update_set_partition_column_falls_back_to_full_rewrite(spark, db):
    t = _part_table(spark, db)
    n = update_set(spark, t, {"day": "'d9'"}, "id = 0")
    assert n == 1
    assert spark.table(t).filter("day = 'd9'").count() == 1
    assert spark.table(t).count() == 12


def test_staging_name_qualified_and_unique():
    from etl_spark.sources.writers import _staging_name

    a = _staging_name("mydb.tbl")
    b = _staging_name("mydb.tbl")
    assert a != b  # collision-proof across concurrent runs
    assert a.startswith("mydb.__stage_tbl_")
    assert _staging_name("bare").startswith("__stage_bare_")

"""JSON-records source (SURVEY.md §2.1 S4) — the reference accepts
REST bodies shaped ``{"records": [{col: val, ...}, ...]}`` and inserts
them row-wise (web_scheduler.py:4312-4373). Spark-first: the records
become a DataFrame in one hop; string payloads go through
``from_json`` with an explicit schema so parsing is JVM-side."""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def records_to_df(
    spark: SparkSession,
    records: Sequence[Mapping[str, object]],
    schema: StructType | str | None = None,
) -> DataFrame:
    """Rows-as-dicts → DataFrame (S4). With no ``schema`` the types are
    inferred from the data (the reference's pandas-dtype behavior,
    uploads/excel_to_db.py:74); pass an explicit StructType/DDL string
    for production loads."""
    if schema is not None:
        return spark.createDataFrame(list(records), schema=schema)
    return spark.createDataFrame(list(records))


def parse_json_records(
    df: DataFrame, json_col: str, schema: StructType | str, keep: bool = False
) -> DataFrame:
    """Parse a JSON-string column into typed columns with
    ``from_json`` (the S4 edge for string payloads, e.g. the `props`
    column of the events table). JVM-side Jackson parse — never a
    Python json.loads loop."""
    parsed = df.withColumn("__parsed", F.from_json(F.col(json_col), schema))
    cols = [c for c in df.columns if keep or c != json_col]
    return parsed.select(*cols, "__parsed.*")


def read_csv_dlq(
    spark: SparkSession,
    path: str,
    schema: str,
    **options: str,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """CSV ingest with a dead-letter queue: returns ``(good, bad,
    parsed)``
    where ``bad`` carries the RAW line of every row the schema could
    not parse (the `_corrupt_record` PERMISSIVE-mode column) — the
    file-landing twin of ``quality.split_by_rules`` and the streaming
    validating sink. The reference's Excel/CSV upload path aborts the
    whole load on one bad row (uploads/excel_to_db.py); at 100 TB one
    typo'd line must not kill a shard — route it, count it, keep
    going.

    The parsed frame is persisted before the corrupt-column split:
    Spark disallows filtering a CSV frame on only the corrupt column
    without materializing it first (the parser would otherwise prune
    away the evidence), and persisting also guarantees both halves
    see the SAME parse. ``parsed`` is that cached frame — call
    ``parsed.unpersist()`` once both halves are materialized."""
    full = (
        spark.read.schema(schema + ", _corrupt_record STRING")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .options(**options)
        .csv(path)
        .persist()
    )
    good = full.filter(F.col("_corrupt_record").isNull()).drop("_corrupt_record")
    bad = full.filter(F.col("_corrupt_record").isNotNull()).select(
        F.col("_corrupt_record").alias("raw_line")
    )
    # the cache handle is returned EXPLICITLY (an instance-attribute
    # hack silently no-ops the moment a caller derives a new frame —
    # second review finding): unpersist it after materializing both
    # halves
    return good, bad, full

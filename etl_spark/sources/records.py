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

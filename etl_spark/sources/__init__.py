"""Sources & sinks (SURVEY.md §2.1, S1–S11): readers (Excel bridge,
JSON-records, landing files) and writers (append, truncate-and-load,
auto-create, upsert)."""

from etl_spark.sources.records import records_to_df, parse_json_records
from etl_spark.sources.writers import (
    append,
    truncate_load,
    ensure_table,
    upsert,
)
from etl_spark.sources.excel import (
    excel_available,
    read_excel,
    write_excel,
    read_landing,
)

__all__ = [
    "records_to_df",
    "parse_json_records",
    "append",
    "truncate_load",
    "ensure_table",
    "upsert",
    "excel_available",
    "read_excel",
    "write_excel",
    "read_landing",
]

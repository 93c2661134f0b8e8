"""etl_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference ETL/scheduling platform (``1246930439/ETL-``, surveyed in
``SURVEY.md``): batch ETL (load / truncate-refresh transforms), ad-hoc
multi-statement SQL, threshold-monitoring queries, metadata analytics,
report export, cron/interval orchestration — plus the large-scale
training-data-pipeline operators (dedup, similarity search, text
analysis, multimodal plumbing) the reference lacks.

Everything is declared through the DataFrame / Spark SQL API so that
Catalyst + Tungsten own planning and execution; Python never sits in
the per-row hot path.
"""

from etl_spark.session import get_spark
from etl_spark.registry import all_specs, queries, oracle_sql

__all__ = ["get_spark", "all_specs", "queries", "oracle_sql"]

__version__ = "0.1.0"

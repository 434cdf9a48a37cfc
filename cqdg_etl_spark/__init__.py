"""cqdg_etl_spark — a PySpark-native analytics/ETL engine.

A from-scratch engine with the query and data-processing capabilities of
Ferlab-Ste-Justine/cqdg-etl (a Scala Spark 3.1 clinical-metadata ETL),
re-expressed idiomatically for PySpark 4.x, plus the large-scale
training-data-pipeline operators (dedup, similarity search, multimodal
columns, text analysis) that a 100 TB corpus pipeline needs.

Layout:
  session    — SparkSession factory tuned for the target cluster shape
  sources    — readers/writers (TSV, NDJSON, multiline JSON, parquet, JSON sinks)
  functions  — column-level helpers (hashing, truthy bools, dates, text, vectors)
  operators  — reusable frame-level operators (nesting, dedup, similarity, summaries)
  pipeline   — the CQDG clinical ETL (pre-process + process + 3 index builders)
  queries    — named query registry exposed through __spark_entry__.py
  streaming  — structured-streaming counterparts for the events table
  plans      — physical-plan audit helpers (pushdown/broadcast/codegen checks)
"""

from cqdg_etl_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"

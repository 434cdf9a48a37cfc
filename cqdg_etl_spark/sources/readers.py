"""Source connectors (SURVEY.md §2.1, S1-S5).

Reference semantics being reproduced:
- S1 TSV scan: all-string schema, tab separator, header row, NO schema
  inference (reference: processes/processes.scala:18).
- S2 multiline JSON: a JSON array in one file
  (reference: processes/processes.scala:19).
- S3 NDJSON ontology scan, gzip-transparent
  (reference: processes/ProcessETLConfig.scala:30-33).
- S4 parquet scan (reference: processes/ProcessETLConfig.scala:17-28).
- S5 JSON-literal scan: parse an in-memory JSON string (e.g. an HTTP
  response body) into a DataFrame
  (reference: processes/PreProcessUtils.scala:96).

All readers return lazy logical plans; Catalyst applies column pruning
and (for parquet) predicate pushdown downstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_tsv(spark: SparkSession, path: str) -> DataFrame:
    """Tab-separated file with a header; every column read as string.

    Matching the reference exactly matters: ages, dates and booleans stay
    strings until a downstream operator derives a typed value
    (reference: processes/processes.scala:18).
    """
    return spark.read.options(sep="\t", header=True).csv(path)


def read_multiline_json(spark: SparkSession, path: str) -> DataFrame:
    """A whole-file JSON array (study_version_metadata.json shape)."""
    return spark.read.option("multiLine", True).json(path)


def read_ndjson(
    spark: SparkSession, path: str, schema: T.StructType | str | None = None
) -> DataFrame:
    """Newline-delimited JSON (ontology term tables); gzip is transparent.

    Pass an explicit schema at scale — inference reads the data twice.
    """
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def read_json_literal(spark: SparkSession, json_str: str) -> DataFrame:
    """Parse a driver-side JSON string (HTTP response body) into a frame.

    PySpark 4 equivalent of ``spark.read.json(Seq(s).toDS())``
    (reference: processes/PreProcessUtils.scala:96).
    """
    return spark.read.json(spark.sparkContext.parallelize([json_str]))


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan — same pushdown/pruning properties as parquet (ORC
    carries stripe-level min/max + bloom indexes; Spark's vectorized
    ORC reader applies predicate pushdown and column pruning)."""
    return spark.read.orc(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str | None = None,
    sep: str = ",",
    header: bool = True,
) -> DataFrame:
    """General CSV scan with an EXPLICIT schema (typed columns, single
    pass). ``inferSchema`` is deliberately not exposed: at 100 TB,
    inference reads the whole input once before the real scan —
    callers must declare the schema (the all-string reference-parity
    shape lives in ``read_tsv``)."""
    reader = spark.read.options(sep=sep, header=header)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.csv(path)


def read_xml(
    spark: SparkSession,
    path: str,
    row_tag: str,
    schema: T.StructType | str | None = None,
) -> DataFrame:
    """XML scan via Spark 4's NATIVE xml data source (the spark-xml
    donation — no external package): one row per ``row_tag`` element,
    attributes surfaced as ``_attr`` columns. Same explicit-schema
    policy as ``read_csv`` — without one, inference parses the input
    twice, which is disqualifying at scale."""
    reader = spark.read.format("xml").option("rowTag", row_tag)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.load(path)


def read_text(
    spark: SparkSession, path: str, whole_file: bool = False
) -> DataFrame:
    """Raw text scan: one string row per line (``value`` column), or one
    row per FILE with ``wholetext`` — the ingestion shape for
    unstructured training-corpus documents before any parsing."""
    return spark.read.text(path, wholetext=whole_file)


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one of the harness testdata tables from an sf directory."""
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")

from cqdg_etl_spark.sources.readers import (
    read_json_literal,
    read_multiline_json,
    read_ndjson,
    read_parquet,
    read_table,
    read_tsv,
)
from cqdg_etl_spark.sources.writers import (
    write_parquet,
    write_partitioned_json,
    write_single_json,
    write_single_tsv,
)

__all__ = [
    "read_tsv",
    "read_multiline_json",
    "read_ndjson",
    "read_parquet",
    "read_json_literal",
    "read_table",
    "write_parquet",
    "write_partitioned_json",
    "write_single_json",
    "write_single_tsv",
]

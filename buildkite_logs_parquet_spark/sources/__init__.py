from buildkite_logs_parquet_spark.sources.jsonl import read_jsonl, write_jsonl
from buildkite_logs_parquet_spark.sources.logs import read_log_lines
from buildkite_logs_parquet_spark.sources.parquet_io import (
    file_info,
    read_entries,
    write_entries,
)

__all__ = [
    "read_log_lines",
    "file_info",
    "read_entries",
    "write_entries",
    "read_jsonl",
    "write_jsonl",
]

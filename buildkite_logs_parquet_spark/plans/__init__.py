from buildkite_logs_parquet_spark.plans.checks import (
    explain_str,
    has_broadcast_join,
    pushed_filters,
    read_schema_columns,
)

__all__ = [
    "explain_str",
    "has_broadcast_join",
    "pushed_filters",
    "read_schema_columns",
]

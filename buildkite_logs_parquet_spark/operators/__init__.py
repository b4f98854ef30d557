from buildkite_logs_parquet_spark.operators.ingest import (
    CANONICAL_COLUMNS,
    entries_view,
    parse_log_lines,
    propagate_groups,
)
from buildkite_logs_parquet_spark.operators.queries import (
    filter_by_group,
    filter_by_type,
    list_groups,
    processing_summary,
    seek,
    tail,
)

__all__ = [
    "CANONICAL_COLUMNS",
    "entries_view",
    "parse_log_lines",
    "propagate_groups",
    "filter_by_group",
    "filter_by_type",
    "list_groups",
    "processing_summary",
    "seek",
    "tail",
]

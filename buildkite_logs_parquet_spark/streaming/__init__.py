from buildkite_logs_parquet_spark.streaming.follow import (
    follow_log_dir,
    follow_with_groups,
    stream_to_lake,
    windowed_counts,
)

__all__ = [
    "follow_log_dir",
    "follow_with_groups",
    "stream_to_lake",
    "windowed_counts",
]

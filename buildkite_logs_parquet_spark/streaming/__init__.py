from buildkite_logs_parquet_spark.streaming.follow import follow_log_dir

__all__ = ["follow_log_dir"]

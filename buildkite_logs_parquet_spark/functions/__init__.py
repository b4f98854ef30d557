from buildkite_logs_parquet_spark.functions.log_text import (
    ANSI_PATTERN,
    OSC_PREFIX_PATTERN,
    TS_DIGITS_PATTERN,
    is_command,
    is_group_header,
    is_osc_line,
    is_progress,
    osc_content,
    osc_timestamp_str,
    strip_ansi,
    truncate_string,
)

__all__ = [
    "ANSI_PATTERN",
    "OSC_PREFIX_PATTERN",
    "TS_DIGITS_PATTERN",
    "is_command",
    "is_group_header",
    "is_osc_line",
    "is_progress",
    "osc_content",
    "osc_timestamp_str",
    "strip_ansi",
    "truncate_string",
]

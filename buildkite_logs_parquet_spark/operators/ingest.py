"""Ingest pipeline: raw log lines → canonical entries DataFrame.

Reference pipeline (parser.go:41-56 + scanner.go + parquet.go:61-69): per
line, extract the OSC timestamp and content, strip ANSI for classification,
classify (command / group header / progress), and propagate a running
"current group" — the last group header seen at or before the line.

Divergence from the reference (documented, deliberate): an OSC line whose
timestamp span is non-numeric is a *hard error* that aborts the reference's
export (scanner.go:55-58, parquet.go:262-264).  A distributed engine must
not abort a 100 TB ingest on one bad line, so such lines are quarantined via
a non-null ``parse_error`` column and excluded from the canonical entries
view; callers can count/inspect them.

Scale design: group propagation is a running ``last(..., ignorenulls)``.
State never crosses file boundaries (the reference runs one parser per
file), so the window partitions by source file — files parallelize across
executors.  For a *single* giant file, the window degenerates to one task;
``propagate_groups(strategy="broadcast")`` instead extracts the (tiny)
header set, turns it into [start, next_start) ranges, and bucket-joins lines
to ranges — a broadcast hash join with no global sort and no single-task
stage.  Both strategies are equivalence-tested.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from buildkite_logs_parquet_spark.functions.log_text import (
    is_command,
    is_group_header,
    is_osc_line,
    is_progress,
    osc_content,
    osc_timestamp_str,
    strip_ansi,
    TS_DIGITS_PATTERN,
)

#: At-rest timestamp for lines without an OSC timestamp: the reference
#: writes ``entry.Timestamp.UnixMilli()`` (parquet.go:63) and a non-OSC
#: line leaves ``Timestamp`` as Go's zero ``time.Time`` — January 1 of
#: year 1 — whose UnixMilli is this value.  A literal ``t=0`` OSC line is
#: NOT sentinel: ``time.Unix(0,0)`` (epoch 1970) is a real instant, so it
#: stores 0 with ``has_timestamp = true``.  ``has_timestamp`` therefore
#: equals ``timestamp != sentinel`` — the exact image of the reference's
#: ``!Timestamp.IsZero()`` (parser.go:138-140), including the pathological
#: ``t=-62135596800000`` line which Go would also classify timestamp-less.
NO_TIMESTAMP_SENTINEL_MS = -62135596800000

#: Canonical at-rest schema, reference parquet.go:17-27 (7 columns), plus the
#: engine's stable ordering column ``row_id`` (required for tail/seek — the
#: reference gets positional order implicitly from single-file row order).
CANONICAL_COLUMNS = [
    "timestamp",
    "content",
    "group",
    "has_timestamp",
    "is_command",
    "is_group",
    "is_progress",
]


def parse_log_lines(
    lines: DataFrame,
    raw_col: str = "raw",
    order_col: str = "line_no",
    file_col: str | None = None,
    group_strategy: str = "window",
) -> DataFrame:
    """Parse ordered raw lines into the canonical entries shape.

    ``lines`` must carry ``raw_col`` (the raw line, ``\\n`` removed, one
    trailing ``\\r`` removed by the line reader — bufio.ScanLines parity) and
    ``order_col`` (0-based position within the file).  ``file_col`` marks
    per-file boundaries for multi-file ingest.

    Output columns: ``line_no``(= order_col), canonical 7 (CANONICAL_COLUMNS),
    plus ``clean_content`` and nullable ``parse_error``.  All expressions are
    built-in (whole-stage codegen); no Python UDFs.
    """
    raw = F.col(raw_col)
    osc = is_osc_line(raw)
    ts_str = osc_timestamp_str(raw)
    ts_numeric = ts_str.rlike(TS_DIGITS_PATTERN)
    ts_val = ts_str.try_cast("long")  # null on int64 overflow / malformed

    parsed = (
        lines.withColumn("_osc", osc)
        .withColumn(
            "parse_error",
            F.when(
                F.col("_osc") & (~ts_numeric | ts_val.isNull()),
                F.concat(F.lit("invalid timestamp: "), ts_str),
            ),
        )
        .withColumn(
            "timestamp",
            F.when(F.col("_osc") & F.col("parse_error").isNull(), ts_val).otherwise(
                F.lit(NO_TIMESTAMP_SENTINEL_MS).cast("long")
            ),
        )
        .withColumn("content", osc_content(raw, F.col("_osc")))
        .withColumn("clean_content", strip_ansi(F.col("content")))
        .withColumn(
            "has_timestamp", F.col("timestamp") != NO_TIMESTAMP_SENTINEL_MS
        )
        .withColumn("is_command", is_command(F.col("clean_content")))
        .withColumn("is_group", is_group_header(F.col("clean_content")))
        .withColumn("is_progress", is_progress(F.col("content"), F.col("clean_content")))
        .drop("_osc")
    )
    return propagate_groups(
        parsed, order_col=order_col, file_col=file_col, strategy=group_strategy
    )


def propagate_groups(
    parsed: DataFrame,
    order_col: str = "line_no",
    file_col: str | None = None,
    strategy: str = "window",
    bucket_size: int = 8192,
) -> DataFrame:
    """Assign the running group (parser.go:41-56) to every row.

    A row's group is the ``clean_content`` of the last *valid* group-header
    row at or before it (the header row itself included); ``""`` before any
    header.  Quarantined rows never update group state (the reference drops
    them before its group logic runs).
    """
    header = F.when(
        F.col("is_group") & F.col("parse_error").isNull(), F.col("clean_content")
    )
    if strategy == "window":
        w = (
            Window.partitionBy(*( [file_col] if file_col else [] ))
            .orderBy(order_col)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return parsed.withColumn(
            "group", F.coalesce(F.last(header, ignorenulls=True).over(w), F.lit(""))
        )
    if strategy == "broadcast":
        return _propagate_groups_broadcast(
            parsed, header, order_col, file_col, bucket_size
        )
    raise ValueError(f"unknown group propagation strategy: {strategy}")


def _propagate_groups_broadcast(
    parsed: DataFrame,
    header: Column,
    order_col: str,
    file_col: str | None,
    bucket_size: int,
) -> DataFrame:
    """Scale path for a single giant file: no global-order window.

    Group headers are characteristically rare (hundreds per multi-million-
    line CI log), so the header set is tiny.  Build [start, next_start)
    ranges with a window *over headers only* (cheap), explode each range to
    the coarse buckets it covers, and broadcast-hash-join lines on
    ``(file, bucket)`` with a residual range predicate.  Lines before the
    first header fall out of the left join as NULL → ``""``.

    Cost: exploded header rows ≈ total_lines / bucket_size + n_headers —
    thousands of rows even at 10^9 lines — vs. a single-task global window.
    """
    file_cols = [file_col] if file_col else []
    lines = parsed
    headers = (
        lines.withColumn("_rhdr", header)
        .where(F.col("_rhdr").isNotNull())
        .select(
            *[F.col(c).alias(f"_r_{c}") for c in file_cols],
            F.col(order_col).alias("_start"),
            F.col("_rhdr"),
        )
    )
    r_file_cols = [f"_r_{c}" for c in file_cols]
    hw = Window.partitionBy(*r_file_cols).orderBy("_start")
    max_order = lines.groupBy(*file_cols).agg(F.max(order_col).alias("_max_ord"))
    max_order = max_order.select(
        *[F.col(c).alias(f"_r_{c}") for c in file_cols], "_max_ord"
    )
    ranges = headers.withColumn(
        "_end", F.lead("_start").over(hw)  # next header start; null for the last
    )
    if r_file_cols:
        ranges = ranges.join(max_order, on=r_file_cols, how="left")
    else:
        ranges = ranges.crossJoin(max_order)
    ranges = ranges.withColumn("_end", F.coalesce(F.col("_end") - 1, F.col("_max_ord")))
    # explode to the coarse buckets covered by [start, end] (end inclusive)
    ranges = ranges.withColumn(
        "_rbucket",
        F.explode(
            F.sequence(
                F.floor(F.col("_start") / bucket_size),
                F.floor(F.col("_end") / bucket_size),
            )
        ),
    ).select(*r_file_cols, "_rbucket", "_start", "_end", "_rhdr")

    keyed = lines.withColumn("_bucket", F.floor(F.col(order_col) / bucket_size))
    cond = F.col("_bucket") == F.col("_rbucket")
    for c in file_cols:
        cond = cond & (F.col(c) == F.col(f"_r_{c}"))
    cond = cond & (F.col(order_col) >= F.col("_start"))
    cond = cond & (F.col(order_col) <= F.col("_end"))
    joined = keyed.join(F.broadcast(ranges), on=cond, how="left")
    return joined.select(
        *parsed.columns,
        F.coalesce(F.col("_rhdr"), F.lit("")).alias("group"),
    )


def entries_view(parsed: DataFrame, row_id_col: str = "line_no") -> DataFrame:
    """Canonical entries projection: quarantined rows dropped, 7 canonical
    columns + ``row_id`` (stable file position, feeds tail/seek)."""
    return parsed.where(F.col("parse_error").isNull()).select(
        F.col(row_id_col).cast("long").alias("row_id"), *CANONICAL_COLUMNS
    )

"""Hypertable-style multi-granularity time rollups over event tables.

The continuous-aggregate shape every event/metrics pipeline wants:
per-type totals at hour, day, and grand-total granularity, maintained
from ONE pass over the fact table.  Re-expressed Spark-first with the
native ``ROLLUP`` grouping-set operator instead of N separate
groupBy jobs.

Reference parity note: the reference engine (wolfeidau/
buildkite-logs-parquet) has no time-series rollup surface — this module
is part of the analytics extension tier (SURVEY.md §2.7) alongside the
event-time aggregations already registered under ``events_agg``.

100 TB shape: Spark plans a ROLLUP as ``Expand`` (each input row
replicated once per grouping set) feeding ONE hash aggregate — so an
L-level rollup is one scan + one shuffle of map-side-combined partials,
where the naive UNION-of-groupBys is L scans + L shuffles.  The expand
factor multiplies *pre-combine* rows, not shuffle bytes: partials are
bounded by the distinct-key cardinality per level, which for time
buckets is tiny relative to the fact table.  All sums run in DECIMAL so
every level is order-independent and engine-exact.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def time_bucket(ts_ms: Column, width_ms: int) -> Column:
    """Floor an epoch-ms column to a ``width_ms`` bucket boundary —
    integer arithmetic, timezone-free (the TimescaleDB ``time_bucket``
    primitive)."""
    w = F.lit(int(width_ms))
    return (ts_ms.cast("long") - (ts_ms.cast("long") % w)).cast("long")


def time_rollup(
    df: DataFrame,
    ts_ms_col: str,
    dims: list[str],
    aggs: list[Column],
    day_col: str = "day",
    hour_col: str = "hour",
) -> DataFrame:
    """ONE-pass rollup over ``(day, hour, *dims)`` prefixes.

    Produces one row per grouping-set key at every granularity:
    ``()`` (grand total), ``(day)``, ``(day, hour)``, then one level per
    extra dim — with rolled-up columns NULL (standard SQL semantics) and
    a ``level`` column counting the non-rolled-up key columns (0 =
    grand total, 1 = day, 2 = hour, 2+i = through dims[i-1]).

    Day/hour strings are derived in the session timezone (UTC in this
    repo's sessions) from ``timestamp_millis`` — identical to the
    registered ``events_agg`` hourly leg, so the two agree row-for-row
    at hour granularity.
    """
    ts = F.timestamp_millis(F.col(ts_ms_col).cast("long"))
    base = df.withColumn(day_col, F.date_format(ts, "yyyy-MM-dd")).withColumn(
        hour_col, F.date_format(ts, "yyyy-MM-dd HH:00:00")
    )
    keys = [day_col, hour_col, *dims]
    depth = F.lit(len(keys))
    for k in keys:
        depth = depth - F.grouping(k)
    # grouping() is only resolvable inside the rollup's own aggregate
    # projection — it reads the grouping-set bitmask, not a data column
    return base.rollup(*keys).agg(depth.cast("int").alias("level"), *aggs)

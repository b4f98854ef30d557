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


def lttb_downsample(
    df: DataFrame,
    series_cols: list[str],
    ts_col: str,
    val_col: str,
    n_out: int = 200,
) -> DataFrame:
    """Largest-Triangle-Three-Buckets downsampling per series — the
    dashboard-grade reduction (the algorithm Grafana/observability
    stacks use): keep ``n_out`` points per series that preserve the
    visual shape (peaks, troughs) far better than striding or bucket
    means.

    LTTB is inherently sequential WITHIN a series (each pick depends on
    the previous), but series are independent — so this is
    ``applyInPandas`` keyed by ``series_cols``: one shuffle to co-locate
    each series, then a numpy pass per group.  Series at or under
    ``n_out`` points pass through unchanged.  State per task is one
    series — bounded by the longest series, the operator's documented
    skew axis (split pathological series by time range first if one
    series dominates the corpus).
    """

    def run(pdf):
        import numpy as np
        import pandas as pd

        pdf = pdf.sort_values(ts_col, kind="mergesort")
        n = len(pdf)
        if n <= n_out:
            return pdf
        x = pdf[ts_col].to_numpy(dtype=np.float64)
        y = pdf[val_col].to_numpy(dtype=np.float64)
        # classic LTTB: first/last pinned; n_out-2 interior buckets
        idx = [0]
        n_buckets = n_out - 2
        edges = np.linspace(1, n - 1, n_buckets + 1).astype(np.int64)
        a = 0
        for b in range(n_buckets):
            lo, hi = edges[b], edges[b + 1]
            nlo, nhi = (edges[b + 1], edges[b + 2]) if b + 1 < n_buckets else (
                n - 1,
                n,
            )
            avg_x = x[nlo:nhi].mean() if nhi > nlo else x[n - 1]
            avg_y = y[nlo:nhi].mean() if nhi > nlo else y[n - 1]
            seg_x, seg_y = x[lo:hi], y[lo:hi]
            area = np.abs(
                (x[a] - avg_x) * (seg_y - y[a]) - (x[a] - seg_x) * (avg_y - y[a])
            )
            pick = lo + int(area.argmax())
            idx.append(pick)
            a = pick
        idx.append(n - 1)
        return pdf.iloc[idx]

    # round-11: AQE coalesces the grouping shuffle by BYTES, which
    # under-parallelizes this compute-bound Python stage (measured: a
    # few-MB input coalesced to 3 tasks, serializing the numpy passes
    # on 3 of 32 cores).  An explicit-N keyed repartition is respected
    # by AQE (user-specified), satisfies applyInPandas' clustering (no
    # second exchange), and stays scale-adaptive because N is the
    # session's configured shuffle parallelism, not a constant.
    n_part = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    return (
        df.repartition(n_part, *series_cols)
        .groupBy(*series_cols)
        .applyInPandas(run, schema=df.schema)
    )


def fill_gaps(
    df: DataFrame,
    ts_ms_col: str,
    key_cols: list[str],
    step_ms: int,
    value_cols: list[str],
    strategy: str = "ffill",
) -> DataFrame:
    """Densify a per-key time series onto a regular ``step_ms`` grid and
    fill the holes — TimescaleDB's ``time_bucket_gapfill`` +
    ``locf``/zero-fill, the step every downstream window/rollup needs
    before it can assume one row per tick.

    Semantics: per key, the grid spans the key's OWN observed min..max
    bucket (``time_bucket`` flooring).  Buckets with multiple raw rows
    keep the LAST observation (max ``(ts, values…)`` struct — a rule-6
    total order, so the survivor never depends on layout).  Missing
    buckets materialize with ``is_filled = true`` and values filled by

    * ``"ffill"`` — last observation carried forward (leading holes
      before a key's first observation stay NULL, standard locf);
    * ``"zero"`` — literal 0;
    * ``"null"`` — left NULL (shape-only densification).

    100 TB shape: one per-key bounds aggregate (map-side combined) →
    ``sequence()`` explode materializes ONLY the grid (span/step rows
    per key — the semantic output size, nothing quadratic), one
    (key, bucket) left join against the deduped observations, and for
    ffill one key-partitioned window (`last(ignorenulls)`) — no global
    sort anywhere.  Keys are independent, so skew equals a key's own
    grid length.
    """
    if strategy not in ("ffill", "zero", "null"):
        raise ValueError("strategy must be ffill | zero | null")
    if step_ms < 1:
        raise ValueError("step_ms must be >= 1")
    from pyspark.sql import Window as W

    bucket = time_bucket(F.col(ts_ms_col), step_ms)
    # last observation per (key, bucket): rule-6 struct max on (ts, vals)
    packed = F.struct(
        F.col(ts_ms_col).cast("long").alias("_t"),
        *[F.col(c).alias(c) for c in value_cols],
    )
    obs = (
        df.select(*key_cols, bucket.alias("_bucket"), packed.alias("_p"))
        .groupBy(*key_cols, "_bucket")
        .agg(F.max("_p").alias("_p"))
        .select(
            *key_cols,
            "_bucket",
            *[F.col(f"_p.{c}").alias(c) for c in value_cols],
            # observation marker: is_filled must mean "no raw row in
            # this bucket", never "the observed value happened to be
            # NULL" — a real NULL observation is data, not a gap
            F.lit(True).alias("_obs"),
        )
    )
    grid = (
        df.select(*key_cols, bucket.alias("_b"))
        .groupBy(*key_cols)
        .agg(F.min("_b").alias("_lo"), F.max("_b").alias("_hi"))
        .select(
            *key_cols,
            F.explode(
                F.sequence(F.col("_lo"), F.col("_hi"), F.lit(int(step_ms)))
            ).alias("_bucket"),
        )
    )
    out = grid.join(obs, on=[*key_cols, "_bucket"], how="left")
    out = out.withColumn("is_filled", F.col("_obs").isNull()).drop("_obs")
    if strategy == "ffill":
        w = (
            W.partitionBy(*key_cols)
            .orderBy("_bucket")
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        )
        for c in value_cols:
            out = out.withColumn(
                c, F.last(F.col(c), ignorenulls=True).over(w)
            )
    elif strategy == "zero":
        for c in value_cols:
            out = out.withColumn(c, F.coalesce(F.col(c), F.lit(0)))
    return out.withColumnRenamed("_bucket", "bucket_ms")

"""As-of (point-in-time) join — an operator Spark's DataFrame API lacks.

For every left row, attach the single right row with the greatest
``right_ts <= left_ts`` (direction="backward", the default), the
smallest ``right_ts >= left_ts`` (direction="forward"), or whichever of
the two is closer (direction="nearest", ties preferring backward —
pandas ``merge_asof`` parity, equivalence-tested) within the same key
group.  The nearest variant runs both sweeps inside ONE hash shuffle
(two window frames over the same partitioning — plan-asserted).  This is the classic time-series enrichment primitive (trade
→ most recent quote; purchase → last prior click) that engines like
DuckDB/kdb expose as ``ASOF JOIN``.

Spark-first design — the **union-tag sweep**, not a range join:

* A naive implementation joins on key with ``right_ts <= left_ts`` and
  ranks — Catalyst plans that as a range join whose per-key cost is
  O(|L|·|R|): quadratic blow-up on hot keys, a non-starter at 100 TB.
* Instead both sides are projected to a common shape, tagged, unioned,
  and sorted per key by ``(ts, side)``; the right row's payload is then
  propagated to subsequent left rows with ``last(ignorenulls=True)``
  over a running window.  ONE shuffle (hash by key), per-key cost
  O((|L|+|R|)·log) for the sort — the same work a merge-asof does, but
  expressed declaratively so AQE still handles key skew.
* Ordering right rows (side=0) before left rows (side=1) at equal
  timestamps makes the match inclusive (``<=``), matching DuckDB's
  ``ASOF JOIN ... ON l.ts >= r.ts`` semantics.

Ties: if several right rows share the same (key, ts) the propagated one
is the **last in (ts, side, order within the union)** — physically
nondeterministic.  Callers that need engine-exact output must pre-reduce
the right side to one row per (key, ts) (e.g. ``max_by`` a tiebreaker),
which is also what makes DuckDB's ASOF well-defined.  ``asof_join``
asserts nothing about it; ``q_events_asof`` in ``__spark_entry__`` shows
the canonical pre-reduction.

No reference counterpart (the reference is a single-log tool —
wolfeidau/buildkite-logs-parquet has no cross-stream ops); this is part
of the training-data/analytics extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: suffix applied to right-side payload columns that collide with left names
RIGHT_SUFFIX = "_right"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    left_ts: str,
    right_ts: str,
    payload_cols: list[str] | None = None,
    direction: str = "backward",
    tolerance: int | None = None,
) -> DataFrame:
    """Point-in-time left join of ``right`` onto ``left``.

    Returns every ``left`` row with ``matched_ts`` (the matched right
    timestamp, null when no right row qualifies) and each payload column
    (null when unmatched).  ``tolerance`` (same unit as the ts columns)
    drops matches farther than the given distance, like pandas
    ``merge_asof(tolerance=...)``.

    Plan shape: union → single hash-partition by ``on`` → per-key sort →
    running ``last(ignorenulls)`` → filter left rows.  No range join, no
    per-key quadratic work; scales horizontally with the number of keys.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward|forward|nearest, got {direction!r}"
        )
    keys = [on] if isinstance(on, str) else list(on)
    if payload_cols is None:
        payload_cols = [
            c for c in right.columns if c not in keys and c != right_ts
        ]

    out_payload = [
        c + RIGHT_SUFFIX if c in left.columns else c for c in payload_cols
    ]

    l_proj = left.select(
        *[F.col(c) for c in left.columns],
        F.lit(1).alias("_side"),
        F.col(left_ts).cast("long").alias("_ts"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(o)
          for c, o in zip(payload_cols, out_payload)],
        F.lit(None).cast("long").alias("_r_ts"),
    )
    null_left = [c for c in left.columns if c not in keys]
    r_proj = right.select(
        *[F.col(c) for c in keys],
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in null_left],
        F.lit(0).alias("_side"),
        F.col(right_ts).cast("long").alias("_ts"),
        *[F.col(c).alias(o) for c, o in zip(payload_cols, out_payload)],
        F.col(right_ts).cast("long").alias("_r_ts"),
    )
    unioned = l_proj.unionByName(r_proj)

    if direction == "nearest":
        # BOTH sweeps in one hash shuffle: two window frames over the same
        # partitioning (Catalyst plans one Exchange, two Sort+Window).
        # Backward: running last over (ts asc, right-before-left at ties);
        # forward: first following over (ts asc, left-before-right at
        # ties) so an equal-ts right row is inclusive in both directions.
        wb = (
            Window.partitionBy(*keys)
            .orderBy(F.col("_ts").asc(), F.col("_side").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        wf = (
            Window.partitionBy(*keys)
            .orderBy(F.col("_ts").asc(), F.col("_side").desc())
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        both = unioned.select(
            *[F.col(c) for c in left.columns],
            F.col("_side"),
            F.col("_ts"),
            *[F.last(o, ignorenulls=True).over(wb).alias(f"_b_{o}") for o in out_payload],
            F.last("_r_ts", ignorenulls=True).over(wb).alias("_b_ts"),
            *[F.first(o, ignorenulls=True).over(wf).alias(f"_f_{o}") for o in out_payload],
            F.first("_r_ts", ignorenulls=True).over(wf).alias("_f_ts"),
        ).where(F.col("_side") == 1)
        b_dist = F.col("_ts") - F.col("_b_ts")
        f_dist = F.col("_f_ts") - F.col("_ts")
        if tolerance is not None:
            b_ok = F.col("_b_ts").isNotNull() & (b_dist <= tolerance)
            f_ok = F.col("_f_ts").isNotNull() & (f_dist <= tolerance)
        else:
            b_ok = F.col("_b_ts").isNotNull()
            f_ok = F.col("_f_ts").isNotNull()
        # ties prefer backward (pandas merge_asof(direction="nearest"))
        use_b = b_ok & (~f_ok | (b_dist <= f_dist))
        return both.select(
            *[F.col(c) for c in left.columns],
            *[
                F.when(use_b, F.col(f"_b_{o}"))
                .when(f_ok, F.col(f"_f_{o}"))
                .alias(o)
                for o in out_payload
            ],
            F.when(use_b, F.col("_b_ts"))
            .when(f_ok, F.col("_f_ts"))
            .alias("matched_ts"),
        )

    asc = direction == "backward"
    order = [F.col("_ts").asc() if asc else F.col("_ts").desc(), F.col("_side").asc()]
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        *[F.col(c) for c in left.columns],
        F.col("_side"),
        F.col("_ts"),
        *[F.last(o, ignorenulls=True).over(w).alias(o) for o in out_payload],
        F.last("_r_ts", ignorenulls=True).over(w).alias("matched_ts"),
    )

    result = filled.where(F.col("_side") == 1)
    if tolerance is not None:
        dist = (
            F.col("_ts") - F.col("matched_ts")
            if asc
            else F.col("matched_ts") - F.col("_ts")
        )
        in_range = F.col("matched_ts").isNotNull() & (dist <= tolerance)
        result = result.select(
            *[F.col(c) for c in left.columns],
            *[F.when(in_range, F.col(o)).alias(o) for o in out_payload],
            F.when(in_range, F.col("matched_ts")).alias("matched_ts"),
        )
    else:
        result = result.drop("_side", "_ts")
    return result


def interval_join(
    left: DataFrame,
    right: DataFrame,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    bin_width: int,
    keys: list[str] | None = None,
) -> DataFrame:
    """Overlap (range) join — pairs whose intervals intersect
    (``l_start <= r_end AND r_start <= l_end``, closed bounds) — as an
    EQUI-join, the primitive Spark lacks natively (a naive range join
    plans as BroadcastNestedLoopJoin / CartesianProduct and dies at
    scale; cf. the bin-based range-join optimization in commercial Spark
    runtimes).

    Both sides explode to the fixed-width bins their interval covers; the
    join is keyed on (``keys``…, bin) with the exact overlap predicate as
    a residual filter.  A pair overlapping many shared bins would match
    once PER bin, so the match is emitted only in the FIRST shared bin
    (``bin == greatest(floor(l_start/W), floor(r_start/W))``) — exact
    dedup by construction, no ``distinct()`` over the pair stream.

    A point table joins as zero-length intervals (start == end).
    ``bin_width`` tunes fan-out: explode factor is interval_len/W + 1 per
    row, candidate quality is ~W/selectivity — pick W near the typical
    interval length.

    100 TB shape: ONE hash shuffle keyed (keys…, bin); per-bin skew is
    bounded by interval density per bin (long intervals fan out instead
    of hot-keying one reducer); plan-asserted free of CartesianProduct /
    BroadcastNestedLoopJoin.
    """
    keys = keys or []
    w = int(bin_width)
    if w <= 0:
        raise ValueError("bin_width must be positive")

    def binned(df: DataFrame, start: str, end: str, tag: str) -> DataFrame:
        lo = F.floor(F.col(start) / w).cast("long")
        hi = F.floor(F.col(end) / w).cast("long")
        return df.withColumn(f"_{tag}_lo", lo).withColumn(
            "_bin", F.explode(F.sequence(lo, hi))
        )

    lb = binned(left, left_start, left_end, "l")
    rb = binned(right, right_start, right_end, "r")
    overlap = (F.col(left_start) <= F.col(right_end)) & (
        F.col(right_start) <= F.col(left_end)
    )
    first_shared = F.col("_bin") == F.greatest(F.col("_l_lo"), F.col("_r_lo"))
    out = lb.join(rb, on=keys + ["_bin"]).where(overlap & first_shared)
    return out.drop("_bin", "_l_lo", "_r_lo")

"""Ordered-funnel conversion and cohort-retention analytics over event
tables.

The two queries every product/event warehouse runs daily, re-expressed
Spark-first.  Reference parity note: the reference engine (wolfeidau/
buildkite-logs-parquet) has no behavioral-analytics surface — this module
is part of the analytics extension tier alongside the time rollups
(``operators/timeseries.py``) already registered under ``events_agg``.

Determinism: every output value is an exact integer (BIGINT counts and
parts-per-million ratios via integer division), so the operators are
oracle-gated bit-exactly (DETERMINISM.md rules 4/6/15).

100 TB shape
------------
``funnel_steps`` runs one user-keyed aggregate per step plus one
user-keyed equi-join per step transition — each join's probe side is the
events of ONE step type (a filtered slice, pushed to the parquet scan),
and the build side shrinks monotonically (users surviving the funnel so
far).  No window over the full event stream, no per-user event
collection: state per user is a single BIGINT timestamp.  Skew equals
the hottest user's per-type event count, never the corpus.

``cohort_retention`` is two user-keyed shuffles (first-activity
aggregate, co-partitioned activity join) and one tiny
(cohort × offset) aggregate whose cardinality is bounded by the square
of the observation window in periods — metadata-sized at any corpus
scale.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def funnel_steps(
    df: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts_ms",
    window_ms: int | None = None,
) -> DataFrame:
    """Strict ordered-funnel conversion: a user completes step ``i`` iff
    an event of type ``steps[i]`` exists at-or-after the user's
    *earliest completion* of step ``i-1`` (classic earliest-completion
    semantics).  With ``window_ms`` set, later steps must also land
    within ``window_ms`` of the user's step-1 time.  Note the window is
    anchored at the user's EARLIEST step-1 completion by definition —
    an any-anchor funnel (any step-1 occurrence may open the window)
    would count more windowed conversions; these are deliberately
    earliest-anchor semantics, shared by the oracle and tests.

    Output: one row per step —

    - ``step_idx`` (1-based BIGINT), ``step`` (the event type),
    - ``n_users`` — users whose chain reaches this step,
    - ``conv_from_first_pm`` — ``n_users·10⁶ div n_users(step 1)``,
    - ``conv_from_prev_pm`` — ``n_users·10⁶ div n_users(prev step)``,

    both exact integer parts-per-million (rule 15: BIGINT only).  Steps
    nobody reaches still emit a row with ``n_users = 0`` so the funnel
    shape is stable for dashboards and the oracle.
    """
    if len(steps) < 1:
        raise ValueError("steps must name at least one event type")
    u, t, ts = F.col(user_col), F.col(type_col), F.col(ts_col).cast("long")

    # step 1: earliest event of the first type per user
    cur = (
        df.where(t == steps[0])
        .groupBy(u.alias("_u"))
        .agg(F.min(ts).alias("_t"))
    )
    if window_ms is not None:
        cur = cur.withColumn("_dl", F.col("_t") + int(window_ms))
    levels = [cur]
    for step in steps[1:]:
        ev = df.where(t == step).select(u.alias("_u"), ts.alias("_ts"))
        cond = F.col("_ts") >= F.col("_t")
        if window_ms is not None:
            cond = cond & (F.col("_ts") <= F.col("_dl"))
        nxt = (
            levels[-1]
            .join(ev, on="_u")
            .where(cond)
            .groupBy("_u")
            .agg(
                F.min("_ts").alias("_t"),
                # _dl is functionally dependent on _u; min is just the
                # deterministic way to carry it through the aggregate
                *([F.min("_dl").alias("_dl")] if window_ms is not None else []),
            )
        )
        levels.append(nxt)

    tagged = [
        lv.select(
            F.lit(i + 1).cast("long").alias("step_idx"),
            F.lit(steps[i]).alias("step"),
            "_u",
        )
        for i, lv in enumerate(levels)
    ]
    counts = (
        reduce(DataFrame.unionByName, tagged)
        .groupBy("step_idx", "step")
        .agg(F.count("*").alias("n_users"))
    )
    # steps with zero survivors still get a row (outer join against the
    # static step list — a literal relation, broadcast by construction)
    spark = df.sparkSession
    shape = spark.createDataFrame(
        [(i + 1, s) for i, s in enumerate(steps)], "step_idx long, step string"
    )
    counts = (
        shape.join(F.broadcast(counts), on=["step_idx", "step"], how="left")
        .select(
            "step_idx",
            "step",
            F.coalesce("n_users", F.lit(0)).cast("long").alias("n_users"),
        )
    )
    w = Window.orderBy("step_idx")  # ≤ len(steps) rows: single-task window is fine
    first_n = F.first("n_users").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    prev_n = F.lag("n_users", 1).over(w)
    # exact integer ppm: BIGINT `div`, never a double division (rule 15)
    return counts.select(
        "step_idx", "step", "n_users", first_n.alias("_f"), prev_n.alias("_p")
    ).select(
        "step_idx",
        "step",
        "n_users",
        F.when(
            F.col("_f") > 0, F.expr("n_users * 1000000L div _f")
        ).alias("conv_from_first_pm"),
        F.when(
            F.col("_p") > 0, F.expr("n_users * 1000000L div _p")
        ).alias("conv_from_prev_pm"),
    )


def cohort_retention(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts_ms",
    period_ms: int = 86_400_000,
) -> DataFrame:
    """Cohort-retention matrix: users are cohorted by the period of their
    FIRST activity; each later active period counts them once at offset
    ``period − cohort``.

    Output: one row per observed (cohort, offset) —

    - ``cohort_period`` — epoch-period index (``min_ts div period_ms``),
    - ``offset`` — periods since the cohort period (0 = the cohort
      period itself, always present and equal to the cohort size),
    - ``n_users`` — distinct users from the cohort active at the offset,
    - ``cohort_size`` — the cohort's offset-0 population,
    - ``retention_pm`` — ``n_users·10⁶ div cohort_size``.

    All BIGINT (rule 15); "active" is any event, layout-independent.
    """
    if period_ms < 1:
        raise ValueError("period_ms must be >= 1")
    u = F.col(user_col)
    ts = F.col(ts_col).cast("long")
    # exact floor-div: subtract the modulo first so the double division's
    # true quotient is an integer (IEEE returns representable results
    # exactly) — never a raw double divide truncated (rule 15 spirit)
    w = F.lit(int(period_ms))
    p = ((ts - ts % w) / w).cast("long")

    act = df.select(u.alias("_u"), p.alias("_p")).distinct()
    first = act.groupBy("_u").agg(F.min("_p").alias("_cohort"))
    cells = (
        act.join(first, on="_u")  # co-partitioned: both sides keyed on _u
        .groupBy(
            F.col("_cohort").alias("cohort_period"),
            (F.col("_p") - F.col("_cohort")).alias("offset"),
        )
        .agg(F.count("*").alias("n_users"))  # (_u,_p) distinct ⇒ exact users
    )
    size = cells.where(F.col("offset") == 0).select(
        "cohort_period", F.col("n_users").alias("cohort_size")
    )
    return cells.join(F.broadcast(size), on="cohort_period").select(
        "cohort_period",
        "offset",
        F.col("n_users").cast("long").alias("n_users"),
        F.col("cohort_size").cast("long").alias("cohort_size"),
        F.expr("n_users * 1000000L div cohort_size").alias("retention_pm"),
    )


def funnel_user_times(
    df: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts_ms",
    window_ms: int | None = None,
) -> DataFrame:
    """Per-user funnel completion detail: one row per user who entered
    the funnel, with the earliest-completion timestamp of every step
    reached (NULL beyond the drop-off point), the furthest step index,
    and the total conversion latency.

    The row-level companion to :func:`funnel_steps` (same semantics,
    same join chain) — feeds time-to-convert distributions through the
    existing percentile machinery and step-level drop-off cohorts.

    Output: ``(user, furthest_step, t_1 .. t_k, convert_ms)`` where
    ``t_i`` is step ``i``'s completion epoch-ms and ``convert_ms`` is
    ``t_k − t_1`` for full converters (NULL otherwise).  Integer-only.

    Same 100 TB shape as :func:`funnel_steps`: per-step filtered join on
    the shrinking survivor set; the final assembly is k−1 left joins of
    (user, BIGINT) relations co-partitioned on the user key.
    """
    if len(steps) < 1:
        raise ValueError("steps must name at least one event type")
    u, t, ts = F.col(user_col), F.col(type_col), F.col(ts_col).cast("long")

    cur = (
        df.where(t == steps[0])
        .groupBy(u.alias("_u"))
        .agg(F.min(ts).alias("t_1"))
    )
    if window_ms is not None:
        cur = cur.withColumn("_dl", F.col("t_1") + int(window_ms))
    levels = [cur]
    prev_t = "t_1"
    for i, step in enumerate(steps[1:], start=2):
        ev = df.where(t == step).select(u.alias("_u"), ts.alias("_ts"))
        cond = F.col("_ts") >= F.col(prev_t)
        if window_ms is not None:
            cond = cond & (F.col("_ts") <= F.col("_dl"))
        nxt = (
            levels[-1]
            .join(ev, on="_u")
            .where(cond)
            .groupBy("_u")
            .agg(
                F.min("_ts").alias(f"t_{i}"),
                *(
                    [F.min("_dl").alias("_dl")]
                    if window_ms is not None
                    else []
                ),
            )
        )
        levels.append(nxt)
        prev_t = f"t_{i}"

    out = levels[0].select("_u", "t_1")
    for i, lv in enumerate(levels[1:], start=2):
        out = out.join(lv.select("_u", f"t_{i}"), on="_u", how="left")
    k = len(steps)
    furthest = F.lit(1)
    for i in range(2, k + 1):
        furthest = F.when(F.col(f"t_{i}").isNotNull(), i).otherwise(furthest)
    return out.select(
        F.col("_u").alias(user_col),
        furthest.cast("long").alias("furthest_step"),
        *[F.col(f"t_{i}") for i in range(1, k + 1)],
        (F.col(f"t_{k}") - F.col("t_1")).alias("convert_ms"),
    )


def event_transitions(
    df: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts_ms",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """First-order event-transition matrix (the Markov view of user
    paths): per user, consecutive event pairs under the total order
    ``(ts, tiebreak)``, counted into ``(from_type, to_type)`` cells with
    each cell's integer-ppm share of its from-type's outgoing edges —
    the path-analysis companion to :func:`funnel_steps` (which fixes the
    step order; this discovers it).

    A ``tiebreak_col`` (e.g. the event id) makes same-millisecond
    neighbors deterministic (rule 6); without one, same-ts ties fall
    back to the type string.

    Output: ``(from_type, to_type, n_transitions, out_pm)`` — all
    BIGINT (rule 15), ``out_pm = n·10⁶ div Σ n over from_type``.

    100 TB shape: ONE user-keyed window (lag) over ``(user, ts)`` — the
    shuffle carries (user, ts, type) triples only — then a
    types²-bounded aggregate and a broadcast share join.  Per-user
    state is the sort of that user's own events; skew equals the
    hottest user's event count.
    """
    from pyspark.sql import Window as W

    order = [F.col(ts_col).cast("long")]
    # the projection below renames type_col to to_type, so the default
    # same-ts tiebreak must reference the RENAMED column
    order.append(
        F.col(tiebreak_col) if tiebreak_col is not None else F.col("to_type")
    )
    w = W.partitionBy(user_col).orderBy(*order)
    pairs = (
        df.select(
            F.col(user_col),
            F.col(type_col).alias("to_type"),
            F.col(ts_col),
            *( [F.col(tiebreak_col)] if tiebreak_col is not None else [] ),
        )
        .withColumn("from_type", F.lag("to_type", 1).over(w))
        .where(F.col("from_type").isNotNull())
    )
    cells = pairs.groupBy("from_type", "to_type").agg(
        F.count("*").cast("long").alias("n_transitions")
    )
    outs = cells.groupBy("from_type").agg(
        F.sum("n_transitions").alias("_out")
    )
    return cells.join(F.broadcast(outs), "from_type").select(
        "from_type",
        "to_type",
        "n_transitions",
        F.expr("n_transitions * 1000000L div _out").alias("out_pm"),
    )


def attribute_conversions(
    df: DataFrame,
    conversion_type: str,
    channel_types: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts_ms",
    id_col: str = "event_id",
    mode: str = "last_touch",
) -> DataFrame:
    """Marketing-style conversion attribution: each conversion event is
    credited to one channel touch — the user's most recent channel
    event at-or-before the conversion (``last_touch``) or their
    earliest channel event overall, provided it precedes the
    conversion (``first_touch``).

    Output: one row per conversion —
    ``(conversion_id, user, conv_ts_ms, channel, touch_ts_ms)`` with
    ``channel``/``touch_ts_ms`` NULL for unattributed conversions (no
    prior touch).

    100 TB shape: last-touch is the as-of sweep
    (``operators/asof.py::asof_join`` — ONE user-keyed hash shuffle,
    per-key sort, no range join); first-touch is one user-keyed min
    aggregate over the channel slice joined back — both sides filtered
    to their type slices at the scan.
    """
    if mode not in ("last_touch", "first_touch"):
        raise ValueError("mode must be last_touch | first_touch")
    u, t = F.col(user_col), F.col(type_col)
    conv = df.where(t == conversion_type).select(
        F.col(id_col).alias("conversion_id"),
        u.alias(user_col),
        F.col(ts_col).cast("long").alias("conv_ts_ms"),
    )
    touches = df.where(t.isin(list(channel_types)))
    if mode == "last_touch":
        from buildkite_logs_parquet_spark.operators.asof import asof_join

        # one row per (user, ms): latest-id channel wins the tie (rule 6)
        slots = touches.groupBy(
            u.alias(user_col), F.col(ts_col).cast("long").alias("_tts")
        ).agg(F.max_by(type_col, F.col(id_col)).alias("channel"))
        out = asof_join(
            conv, slots, on=user_col, left_ts="conv_ts_ms", right_ts="_tts"
        )
        return out.select(
            "conversion_id",
            user_col,
            "conv_ts_ms",
            "channel",
            F.col("matched_ts").alias("touch_ts_ms"),
        )
    first = touches.groupBy(u.alias(user_col)).agg(
        F.min(
            F.struct(
                F.col(ts_col).cast("long").alias("_tts"),
                F.col(id_col).alias("_tid"),
                F.col(type_col).alias("_tch"),
            )
        ).alias("_f")
    )
    joined = conv.join(first, user_col, "left")
    valid = F.col("_f._tts") <= F.col("conv_ts_ms")
    return joined.select(
        "conversion_id",
        user_col,
        "conv_ts_ms",
        F.when(valid, F.col("_f._tch")).alias("channel"),
        F.when(valid, F.col("_f._tts")).alias("touch_ts_ms"),
    )


def top_paths(
    df: DataFrame,
    depth: int = 3,
    top_k: int = 20,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts_ms",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Most-travelled event paths: consecutive ``depth``-grams of event
    types per user (the n-step generalization of
    :func:`event_transitions`), counted and ranked.

    Output: ``(step_1 .. step_{depth}, n_paths, rank)`` — top_k rows
    under the (count desc, lexicographic path) rule-6 total order.

    100 TB shape: ONE user-keyed window produces all depth−1 lags in a
    single pass (Catalyst collapses same-window lags into one
    WindowExec); the path aggregate is vocabulary^depth-bounded, and
    the rank is a TakeOrderedAndProject over that bounded relation.
    """
    if depth < 2:
        raise ValueError("depth must be >= 2")
    from pyspark.sql import Window as W

    order = [F.col(ts_col).cast("long")]
    order.append(
        F.col(tiebreak_col) if tiebreak_col is not None else F.col(type_col)
    )
    w = W.partitionBy(user_col).orderBy(*order)
    cols = {f"step_{depth}": F.col(type_col)}
    for i in range(1, depth):
        cols[f"step_{depth - i}"] = F.lag(type_col, i).over(w)
    path = df.select(
        *[c.alias(n) for n, c in cols.items()]
    ).where(F.col("step_1").isNotNull())
    names = [f"step_{i}" for i in range(1, depth + 1)]
    counts = path.groupBy(*names).agg(
        F.count("*").cast("long").alias("n_paths")
    )
    ranked = (
        counts.orderBy(F.col("n_paths").desc(), *[F.col(n) for n in names])
        .limit(int(top_k))
        .withColumn(
            "rank",
            F.row_number().over(
                W.orderBy(F.col("n_paths").desc(), *[F.col(n) for n in names])
            ).cast("long"),
        )
    )
    return ranked.select(*names, "n_paths", "rank")

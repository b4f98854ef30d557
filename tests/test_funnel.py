"""Ordered-funnel conversion and cohort retention (operators/funnel.py)."""

from collections import defaultdict

from pyspark.sql import functions as F

from buildkite_logs_parquet_spark.operators.funnel import (
    cohort_retention,
    funnel_steps,
)

SF = "/root/testdata/sf0.001"

DAY = 86_400_000


def _frame(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, event_type string, ts_ms long"
    )


def _events(spark):
    # schema-adaptive ts→epoch-ms (the testdata has shipped both
    # TIMESTAMP(NANOS)-as-long and TIMESTAMP(MICROS) — same branch as
    # __spark_entry__._events)
    ev = spark.read.parquet(f"{SF}/events.parquet")
    ts_dtype = dict(ev.dtypes)["ts"]
    if ts_dtype in ("bigint", "long", "int"):
        ts_ms = F.expr("CAST(ts DIV 1000000 AS BIGINT)")
    elif ts_dtype == "timestamp_ntz":
        ts_ms = F.expr(
            "timestampdiff(MILLISECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', ts)"
        )
    else:
        ts_ms = F.unix_millis(F.col("ts").cast("timestamp"))
    return ev.select("user_id", "event_type", ts_ms.alias("ts_ms"))


def _events_with_id(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    ts_dtype = dict(ev.dtypes)["ts"]
    if ts_dtype in ("bigint", "long", "int"):
        ts_ms = F.expr("CAST(ts DIV 1000000 AS BIGINT)")
    elif ts_dtype == "timestamp_ntz":
        ts_ms = F.expr(
            "timestampdiff(MILLISECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', ts)"
        )
    else:
        ts_ms = F.unix_millis(F.col("ts").cast("timestamp"))
    return ev.select("user_id", "event_id", "event_type", ts_ms.alias("ts_ms"))


def test_funnel_strict_ordering(spark):
    # u1 completes in order; u2's click PRECEDES its view (no conversion);
    # u3 views only; u4 never appears in step 1 (click without view)
    df = _frame(
        spark,
        [
            (1, "view", 100), (1, "click", 200), (1, "buy", 300),
            (2, "click", 50), (2, "view", 100), (2, "buy", 400),
            (3, "view", 10),
            (4, "click", 5), (4, "buy", 6),
        ],
    )
    out = {
        r["step"]: r
        for r in funnel_steps(df, ["view", "click", "buy"]).collect()
    }
    assert out["view"]["n_users"] == 3
    assert out["click"]["n_users"] == 1  # only u1 clicks after viewing
    assert out["buy"]["n_users"] == 1
    assert out["view"]["conv_from_first_pm"] == 1_000_000
    assert out["view"]["conv_from_prev_pm"] is None
    assert out["click"]["conv_from_first_pm"] == 1_000_000 // 3
    assert out["click"]["conv_from_prev_pm"] == 1_000_000 // 3
    assert out["buy"]["conv_from_prev_pm"] == 1_000_000


def test_funnel_same_timestamp_counts(spark):
    # at-or-after semantics: a step landing at the SAME ms converts
    df = _frame(spark, [(1, "view", 100), (1, "click", 100)])
    out = {r["step"]: r["n_users"] for r in funnel_steps(df, ["view", "click"]).collect()}
    assert out == {"view": 1, "click": 1}


def test_funnel_window_cutoff(spark):
    # u1 clicks inside the window, u2 outside it
    df = _frame(
        spark,
        [
            (1, "view", 0), (1, "click", 500),
            (2, "view", 0), (2, "click", 2_000),
        ],
    )
    out = {
        r["step"]: r["n_users"]
        for r in funnel_steps(df, ["view", "click"], window_ms=1_000).collect()
    }
    assert out == {"view": 2, "click": 1}


def test_funnel_earliest_completion_chain(spark):
    # earliest completion is greedy-optimal: u1's first click (t=200)
    # gates the buy, and a buy at t=250 counts even though a LATER click
    # (t=300) also exists
    df = _frame(
        spark,
        [(1, "view", 100), (1, "click", 200), (1, "click", 300), (1, "buy", 250)],
    )
    out = {r["step"]: r["n_users"] for r in funnel_steps(df, ["view", "click", "buy"]).collect()}
    assert out["buy"] == 1


def test_funnel_zero_survivor_steps_still_emit(spark):
    df = _frame(spark, [(1, "view", 100)])
    out = funnel_steps(df, ["view", "click", "buy"]).orderBy("step_idx").collect()
    assert [r["step_idx"] for r in out] == [1, 2, 3]
    assert [r["n_users"] for r in out] == [1, 0, 0]
    assert out[1]["conv_from_prev_pm"] == 0
    assert out[2]["conv_from_prev_pm"] is None  # prev step had 0 users


def _python_funnel(rows, steps, window_ms=None):
    by_user = defaultdict(list)
    for u, t, ts in rows:
        by_user[u].append((t, ts))
    counts = [0] * len(steps)
    for evs in by_user.values():
        cur, deadline = None, None
        for i, s in enumerate(steps):
            cand = [
                ts
                for t, ts in evs
                if t == s
                and (cur is None or ts >= cur)
                and (deadline is None or ts <= deadline)
            ]
            if not cand:
                break
            cur = min(cand)
            if i == 0 and window_ms is not None:
                deadline = cur + window_ms
            counts[i] += 1
    return counts


def test_funnel_matches_python_twin_on_real_events(spark):
    ev = _events(spark)
    rows = [(r["user_id"], r["event_type"], r["ts_ms"]) for r in ev.collect()]
    steps = ["view", "click", "purchase"]
    want = _python_funnel(rows, steps)
    got = {
        r["step_idx"]: r["n_users"]
        for r in funnel_steps(ev, steps).collect()
    }
    assert [got[i + 1] for i in range(3)] == want
    # windowed variant agrees with the twin too
    want_w = _python_funnel(rows, steps, window_ms=6 * 3_600_000)
    got_w = {
        r["step_idx"]: r["n_users"]
        for r in funnel_steps(ev, steps, window_ms=6 * 3_600_000).collect()
    }
    assert [got_w[i + 1] for i in range(3)] == want_w


def test_funnel_layout_independent(spark):
    ev = _events(spark)
    steps = ["signup", "view", "purchase"]
    a = sorted(map(tuple, funnel_steps(ev, steps).collect()))
    b = sorted(map(tuple, funnel_steps(ev.repartition(7, "event_type"), steps).collect()))
    assert a == b


def test_cohort_offsets_and_ppm(spark):
    # cohort 0: u1 active days 0,1,3; u2 active day 0 only
    # cohort 1: u3 active days 1,3
    df = _frame(
        spark,
        [
            (1, "e", 0), (1, "e", DAY + 5), (1, "e", 3 * DAY),
            (2, "e", 10),
            (3, "e", DAY), (3, "e", 3 * DAY + 1),
        ],
    )
    out = {
        (r["cohort_period"], r["offset"]): (r["n_users"], r["cohort_size"], r["retention_pm"])
        for r in cohort_retention(df, period_ms=DAY).collect()
    }
    assert out[(0, 0)] == (2, 2, 1_000_000)
    assert out[(0, 1)] == (1, 2, 500_000)
    assert out[(0, 3)] == (1, 2, 500_000)
    assert out[(1, 0)] == (1, 1, 1_000_000)
    assert out[(1, 2)] == (1, 1, 1_000_000)
    assert (0, 2) not in out  # nobody from cohort 0 active on day 2


def test_cohort_matches_python_twin_on_real_events(spark):
    ev = _events(spark).select("user_id", "ts_ms")
    rows = [(r["user_id"], r["ts_ms"]) for r in ev.collect()]
    periods = defaultdict(set)
    for u, ts in rows:
        periods[u].add(ts // DAY)
    cells = defaultdict(set)
    for u, ps in periods.items():
        c = min(ps)
        for p in ps:
            cells[(c, p - c)].add(u)
    want = {k: len(v) for k, v in cells.items()}
    got = {
        (r["cohort_period"], r["offset"]): r["n_users"]
        for r in cohort_retention(ev, user_col="user_id", period_ms=DAY).collect()
    }
    assert got == want
    # offset-0 row is the cohort size everywhere
    for r in cohort_retention(ev, period_ms=DAY).where("offset = 0").collect():
        assert r["n_users"] == r["cohort_size"]
        assert r["retention_pm"] == 1_000_000


def test_funnel_user_times_detail(spark):
    from buildkite_logs_parquet_spark.operators.funnel import funnel_user_times

    df = _frame(
        spark,
        [
            (1, "view", 100), (1, "click", 200), (1, "buy", 300),
            (2, "view", 50), (2, "click", 80),
            (3, "view", 10),
            (4, "click", 5),  # never enters the funnel
        ],
    )
    out = {
        r["user_id"]: r
        for r in funnel_user_times(df, ["view", "click", "buy"]).collect()
    }
    assert set(out) == {1, 2, 3}
    assert (out[1]["t_1"], out[1]["t_2"], out[1]["t_3"]) == (100, 200, 300)
    assert out[1]["furthest_step"] == 3 and out[1]["convert_ms"] == 200
    assert out[2]["furthest_step"] == 2 and out[2]["t_3"] is None
    assert out[2]["convert_ms"] is None
    assert out[3]["furthest_step"] == 1 and out[3]["t_2"] is None


def test_funnel_user_times_agrees_with_funnel_steps(spark):
    from buildkite_logs_parquet_spark.operators.funnel import funnel_user_times

    ev = _events(spark)
    steps = ["view", "click", "purchase"]
    detail = funnel_user_times(ev, steps)
    per_step = {
        i: detail.where(F.col("furthest_step") >= i).count()
        for i in range(1, 4)
    }
    agg = {
        r["step_idx"]: r["n_users"]
        for r in funnel_steps(ev, steps).collect()
    }
    assert per_step == agg


def test_event_transitions_hand_computed(spark):
    from buildkite_logs_parquet_spark.operators.funnel import event_transitions

    df = spark.createDataFrame(
        [
            (1, 1, "view", 100), (1, 2, "click", 200), (1, 3, "view", 300),
            (2, 4, "view", 10), (2, 5, "click", 20),
            (3, 6, "error", 5),  # single event: no transition
        ],
        "user_id long, event_id long, event_type string, ts_ms long",
    )
    out = {
        (r["from_type"], r["to_type"]): (r["n_transitions"], r["out_pm"])
        for r in event_transitions(df, tiebreak_col="event_id").collect()
    }
    assert out == {
        ("view", "click"): (2, 1_000_000),
        ("click", "view"): (1, 1_000_000),
    }


def test_event_transitions_python_twin_on_real_events(spark):
    from collections import Counter, defaultdict

    from buildkite_logs_parquet_spark.operators.funnel import event_transitions

    rows = [
        (r["user_id"], r["event_id"], r["event_type"], r["ts_ms"])
        for r in _events_with_id(spark).collect()
    ]
    by_user = defaultdict(list)
    for u, eid, t, ts in rows:
        by_user[u].append((ts, eid, t))
    want = Counter()
    for evs in by_user.values():
        evs.sort()
        for (_, _, a), (_, _, b) in zip(evs, evs[1:]):
            want[(a, b)] += 1
    got = {
        (r["from_type"], r["to_type"]): r["n_transitions"]
        for r in event_transitions(
            _events_with_id(spark), tiebreak_col="event_id"
        ).collect()
    }
    assert got == dict(want)
    # shares sum to ~1e6 per from_type (integer-div remainder allowed)
    from_totals = defaultdict(list)
    for r in event_transitions(
        _events_with_id(spark), tiebreak_col="event_id"
    ).collect():
        from_totals[r["from_type"]].append(r["out_pm"])
    for fr, pms in from_totals.items():
        assert 1_000_000 - len(pms) < sum(pms) <= 1_000_000, fr


def test_last_touch_attribution(spark):
    from buildkite_logs_parquet_spark.operators.funnel import (
        attribute_conversions,
    )

    df = spark.createDataFrame(
        [
            (1, 1, "view", 100), (1, 2, "click", 200), (1, 3, "purchase", 300),
            (2, 4, "view", 50), (2, 5, "purchase", 40),   # touch AFTER conv
            (3, 6, "purchase", 10),                        # no touch at all
            (4, 7, "click", 90), (4, 8, "view", 90), (4, 9, "purchase", 95),
        ],
        "user_id long, event_id long, event_type string, ts_ms long",
    )
    out = {
        r["conversion_id"]: (r["channel"], r["touch_ts_ms"])
        for r in attribute_conversions(
            df, "purchase", ["view", "click"]
        ).collect()
    }
    assert out[3] == ("click", 200)       # latest touch before conv
    assert out[5] == (None, None)         # only future touches
    assert out[6] == (None, None)
    # same-ms tie: highest event id wins (rule-6 max_by on the id)
    assert out[9] == ("view", 90)


def test_first_touch_attribution(spark):
    from buildkite_logs_parquet_spark.operators.funnel import (
        attribute_conversions,
    )

    df = spark.createDataFrame(
        [
            (1, 1, "click", 100), (1, 2, "view", 200), (1, 3, "purchase", 300),
            (2, 4, "purchase", 10), (2, 5, "view", 20), (2, 6, "purchase", 30),
        ],
        "user_id long, event_id long, event_type string, ts_ms long",
    )
    out = {
        r["conversion_id"]: (r["channel"], r["touch_ts_ms"])
        for r in attribute_conversions(
            df, "purchase", ["view", "click"], mode="first_touch"
        ).collect()
    }
    assert out[3] == ("click", 100)  # earliest touch, not latest
    assert out[4] == (None, None)    # conv precedes the first touch
    assert out[6] == ("view", 20)


def test_top_paths_counts_and_rank_order(spark):
    from buildkite_logs_parquet_spark.operators.funnel import top_paths

    df = spark.createDataFrame(
        [
            (1, 1, "a", 1), (1, 2, "b", 2), (1, 3, "c", 3),
            (2, 4, "a", 1), (2, 5, "b", 2), (2, 6, "c", 3),
            (3, 7, "a", 1), (3, 8, "b", 2), (3, 9, "x", 3),
            (4, 10, "a", 1),  # too short for a 3-path
        ],
        "user_id long, event_id long, event_type string, ts_ms long",
    )
    out = top_paths(df, depth=3, top_k=5, tiebreak_col="event_id").collect()
    got = [((r["step_1"], r["step_2"], r["step_3"]), r["n_paths"], r["rank"]) for r in out]
    assert got[0] == (("a", "b", "c"), 2, 1)
    assert got[1] == (("a", "b", "x"), 1, 2)
    assert len(got) == 2
    # depth=2 equals event_transitions counts
    from buildkite_logs_parquet_spark.operators.funnel import event_transitions

    p2 = {
        (r["step_1"], r["step_2"]): r["n_paths"]
        for r in top_paths(df, depth=2, top_k=100, tiebreak_col="event_id").collect()
    }
    tr = {
        (r["from_type"], r["to_type"]): r["n_transitions"]
        for r in event_transitions(df, tiebreak_col="event_id").collect()
    }
    assert p2 == tr


# ------------------------------------------------------ hypothesis suites

from hypothesis import given, settings, strategies as st

_event_lists = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=6),        # user
        st.sampled_from(["view", "click", "buy"]),    # type
        st.integers(min_value=0, max_value=50),       # ts
    ),
    min_size=1,
    max_size=40,
)


@settings(max_examples=8, deadline=None)
@given(rows=_event_lists)
def test_funnel_counts_monotone_and_match_twin(spark, rows):
    """For ANY event set: per-step survivor counts are non-increasing and
    equal the pure-python greedy twin."""
    df = spark.createDataFrame(
        [(u, t, ts) for u, t, ts in rows],
        "user_id long, event_type string, ts_ms long",
    )
    steps = ["view", "click", "buy"]
    out = {
        r["step_idx"]: r["n_users"]
        for r in funnel_steps(df, steps).collect()
    }
    counts = [out[i] for i in (1, 2, 3)]
    assert counts[0] >= counts[1] >= counts[2]
    assert counts == _python_funnel(rows, steps)


@settings(max_examples=6, deadline=None)
@given(rows=_event_lists)
def test_transitions_total_equals_events_minus_users(spark, rows):
    """Σ transitions == Σ(per-user events − 1): every event except each
    user's first is exactly one transition's target."""
    from collections import Counter

    from buildkite_logs_parquet_spark.operators.funnel import (
        event_transitions,
    )

    df = spark.createDataFrame(
        [(u, i, t, ts) for i, (u, t, ts) in enumerate(rows)],
        "user_id long, event_id long, event_type string, ts_ms long",
    )
    total = sum(
        r["n_transitions"]
        for r in event_transitions(df, tiebreak_col="event_id").collect()
    )
    per_user = Counter(u for u, _, _ in rows)
    assert total == sum(n - 1 for n in per_user.values())

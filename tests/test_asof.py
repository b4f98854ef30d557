"""asof_join: semantics vs pandas.merge_asof, directions, tolerance, plan."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from buildkite_logs_parquet_spark.operators.asof import asof_join


@pytest.fixture(scope="module")
def trades_quotes(spark):
    # deterministic interleaved series: 3 keys, quotes every 7 ticks,
    # trades every 5 — includes equal-ts collisions (ts=35, 70, ...)
    trades = [(k, t, float(100 * k + t)) for k in range(3) for t in range(0, 100, 5)]
    quotes = [(k, t, float(1000 * k + t)) for k in range(3) for t in range(0, 100, 7)]
    tdf = spark.createDataFrame(trades, "key int, ts long, price double")
    qdf = spark.createDataFrame(quotes, "key int, ts long, quote double")
    return tdf, qdf


def _expected(tdf, qdf, direction, tolerance=None):
    t = tdf.toPandas().sort_values("ts").reset_index(drop=True)
    q = qdf.toPandas().sort_values("ts").reset_index(drop=True)
    m = pd.merge_asof(
        t, q, on="ts", by="key", direction=direction, tolerance=tolerance,
        suffixes=("", "_q"),
    )
    return {
        (r.key, r.ts): (None if pd.isna(r.quote) else r.quote)
        for r in m.itertuples()
    }


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_matches_pandas_merge_asof(spark, trades_quotes, direction):
    tdf, qdf = trades_quotes
    out = asof_join(
        tdf, qdf, on="key", left_ts="ts", right_ts="ts", direction=direction
    ).collect()
    exp = _expected(tdf, qdf, direction)
    assert len(out) == tdf.count()
    for r in out:
        assert exp[(r.key, r.ts)] == r.quote, (r.key, r.ts)


def test_inclusive_at_equal_ts(spark):
    left = spark.createDataFrame([(1, 10)], "key int, ts long")
    right = spark.createDataFrame([(1, 10, "hit")], "key int, ts long, v string")
    row = asof_join(left, right, on="key", left_ts="ts", right_ts="ts").first()
    assert row.v == "hit" and row.matched_ts == 10


def test_no_match_is_null(spark):
    left = spark.createDataFrame([(1, 5)], "key int, ts long")
    right = spark.createDataFrame([(1, 10, "late")], "key int, ts long, v string")
    row = asof_join(left, right, on="key", left_ts="ts", right_ts="ts").first()
    assert row.v is None and row.matched_ts is None


def test_tolerance_nulls_stale_matches(spark, trades_quotes):
    tdf, qdf = trades_quotes
    out = asof_join(
        tdf, qdf, on="key", left_ts="ts", right_ts="ts", tolerance=2
    ).collect()
    exp = _expected(tdf, qdf, "backward", tolerance=2)
    for r in out:
        assert exp[(r.key, r.ts)] == r.quote, (r.key, r.ts)
    # sanity: tolerance actually nulled something the plain join matched
    assert any(r.quote is None for r in out)


def test_name_collision_gets_suffix(spark):
    left = spark.createDataFrame([(1, 10, 1.0)], "key int, ts long, v double")
    right = spark.createDataFrame([(1, 9, 2.0)], "key int, ts long, v double")
    row = asof_join(left, right, on="key", left_ts="ts", right_ts="ts").first()
    assert row.v == 1.0 and row.v_right == 2.0


def test_plan_is_single_shuffle_no_join(spark, trades_quotes):
    """The sweep must plan as union + one window — not a join node at all
    (a range/theta join would be per-key quadratic at scale)."""
    tdf, qdf = trades_quotes
    plan = asof_join(
        tdf, qdf, on="key", left_ts="ts", right_ts="ts"
    )._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_asof_nearest_matches_pandas(spark):
    """direction='nearest' equals pandas merge_asof(nearest) incl. the
    tie-prefers-backward rule and tolerance."""
    import pandas as pd

    left_rows = [(1, t) for t in (5, 10, 14, 30)] + [(2, t) for t in (3, 8)]
    right_rows = [(1, t, float(t)) for t in (4, 12, 20)] + [(2, 6, 6.0)]
    left = spark.createDataFrame(left_rows, "k long, ts long")
    right = spark.createDataFrame(right_rows, "k long, ts long, px double")

    from buildkite_logs_parquet_spark.operators.asof import asof_join

    for tol in (None, 3):
        got = {
            (r["k"], r["ts"]): (r["matched_ts"], r["px"])
            for r in asof_join(
                left, right, on="k", left_ts="ts", right_ts="ts",
                direction="nearest", tolerance=tol,
            ).collect()
        }
        lp = pd.DataFrame(left_rows, columns=["k", "ts"]).sort_values("ts")
        rp = pd.DataFrame(right_rows, columns=["k", "ts", "px"]).sort_values("ts")
        merged = pd.merge_asof(
            lp, rp, on="ts", by="k", direction="nearest",
            tolerance=tol, suffixes=("", "_r"),
        )
        for _, row in merged.iterrows():
            want_px = None if pd.isna(row["px"]) else row["px"]
            got_ts, got_px = got[(row["k"], row["ts"])]
            assert got_px == want_px, (row["k"], row["ts"], got_px, want_px)
            if want_px is not None:
                assert got_ts == int(want_px)  # right ts == px by construction


def test_asof_nearest_equal_ts_is_inclusive_both_ways(spark):
    from buildkite_logs_parquet_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, 10)], "k long, ts long")
    right = spark.createDataFrame([(1, 10, 99.0)], "k long, ts long, px double")
    r = asof_join(
        left, right, on="k", left_ts="ts", right_ts="ts", direction="nearest"
    ).first()
    assert r["matched_ts"] == 10 and r["px"] == 99.0


def test_asof_nearest_single_shuffle(spark):
    """The nearest variant must still be ONE hash exchange (two sorts over
    the same partitioning, no second shuffle, no range join)."""
    from buildkite_logs_parquet_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, 10)], "k long, ts long")
    right = spark.createDataFrame([(1, 9, 1.0)], "k long, ts long, px double")
    df = asof_join(
        left, right, on="k", left_ts="ts", right_ts="ts", direction="nearest"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    n_hash_exchanges = sum(
        1 for l in plan.splitlines() if "Exchange hashpartitioning" in l
    )
    assert n_hash_exchanges == 1, plan[:1500]
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


# ------------------------------------------------------- interval join


def _naive_overlap(lrows, rrows, keys=False):
    out = set()
    for li, (lk, ls, le) in enumerate(lrows):
        for ri, (rk, rs, re_) in enumerate(rrows):
            if keys and lk != rk:
                continue
            if ls <= re_ and rs <= le:
                out.add((li, ri))
    return out


def test_interval_join_matches_naive_cross_filter(spark):
    import random

    from buildkite_logs_parquet_spark.operators.asof import interval_join

    rng = random.Random(41)
    lrows = [
        ("k%d" % rng.randint(0, 2), s, s + rng.randint(0, 50))
        for s in (rng.randint(0, 500) for _ in range(60))
    ]
    rrows = [
        ("k%d" % rng.randint(0, 2), s, s + rng.randint(0, 50))
        for s in (rng.randint(0, 500) for _ in range(60))
    ]
    left = spark.createDataFrame(
        [(i, k, s, e) for i, (k, s, e) in enumerate(lrows)],
        "lid long, lk string, ls long, le long",
    )
    right = spark.createDataFrame(
        [(i, k, s, e) for i, (k, s, e) in enumerate(rrows)],
        "rid long, rk string, rs long, re long",
    )
    for width in (7, 32, 1000):  # width far below / near / above lengths
        got = {
            (r["lid"], r["rid"])
            for r in interval_join(
                left, right, "ls", "le", "rs", "re", bin_width=width
            ).collect()
        }
        assert got == _naive_overlap(lrows, rrows), width
    # keyed variant: only same-key overlaps
    lk = left.withColumnRenamed("lk", "k")
    rk = right.withColumnRenamed("rk", "k")
    got = {
        (r["lid"], r["rid"])
        for r in interval_join(
            lk, rk, "ls", "le", "rs", "re", bin_width=16, keys=["k"]
        ).collect()
    }
    assert got == _naive_overlap(lrows, rrows, keys=True)


def test_interval_join_no_duplicates_and_no_cartesian(spark):
    from buildkite_logs_parquet_spark.operators.asof import interval_join
    from buildkite_logs_parquet_spark.plans.checks import explain_str

    # two long intervals sharing MANY bins must still match exactly once
    left = spark.createDataFrame([(1, 0, 1000)], "lid long, ls long, le long")
    right = spark.createDataFrame([(2, 500, 1500)], "rid long, rs long, re long")
    out = interval_join(left, right, "ls", "le", "rs", "re", bin_width=10)
    rows = out.collect()
    assert len(rows) == 1 and (rows[0]["lid"], rows[0]["rid"]) == (1, 2)
    plan = explain_str(out)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_interval_join_points_in_intervals(spark):
    from buildkite_logs_parquet_spark.operators.asof import interval_join

    points = spark.createDataFrame(
        [(i, t, t) for i, t in enumerate([5, 15, 25, 99])],
        "pid long, ps long, pe long",
    )
    ivals = spark.createDataFrame(
        [(0, 0, 10), (1, 10, 20)], "iid long, s long, e long"
    )
    got = sorted(
        (r["pid"], r["iid"])
        for r in interval_join(
            points, ivals, "ps", "pe", "s", "e", bin_width=8
        ).collect()
    )
    # closed bounds: t=5 in [0,10]; t=15 in [10,20]; t=25, 99 nowhere
    assert got == [(0, 0), (1, 1)]

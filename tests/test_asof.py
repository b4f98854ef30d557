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

"""Sketch-backed table profiling: bounded-error guarantees vs exact answers."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from buildkite_logs_parquet_spark.operators.profiling import table_profile


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet("/root/testdata/sf0.01/events.parquet").cache()


def test_profile_shape_and_exact_fields(spark, events):
    prof = {r["column"]: r for r in table_profile(events).collect()}
    assert set(prof) == set(events.columns)
    n = events.count()
    for c, r in prof.items():
        assert r["n_rows"] == n
        exact_nulls = events.where(F.col(c).isNull()).count()
        assert r["n_nulls"] == exact_nulls, c


def test_profile_distinct_within_rsd(spark, events):
    prof = {r["column"]: r for r in table_profile(events, rsd=0.05).collect()}
    for c in ("event_id", "user_id", "event_type"):
        exact = events.select(c).distinct().count()
        approx = prof[c]["approx_distinct"]
        assert abs(approx - exact) <= max(0.15 * exact, 2), (c, approx, exact)


def test_profile_numeric_bounds_and_quantiles(spark, events):
    prof = {r["column"]: r for r in table_profile(events).collect()}
    r = prof["value"]
    exact = events.agg(
        F.min("value"), F.max("value"), F.expr("percentile(value, 0.5)")
    ).first()
    assert r["min"] == exact[0] and r["max"] == exact[1]
    # percentile_approx with accuracy 10k on ~50k rows is near-exact
    spread = (exact[1] - exact[0]) or 1.0
    assert abs(r["approx_p50"] - exact[2]) < 0.05 * spread
    # non-numeric columns carry null numeric stats
    assert prof["event_type"]["min"] is None


def test_profile_is_one_job_one_aggregate(spark, events):
    """The scale contract: N-column profiling is ONE aggregate over one
    scan — the plan has exactly one pair of partial/final HashAggregates
    (or ObjectHashAggregates for sketches) and no join."""
    df = table_profile(events)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    aggs = [l for l in plan.splitlines() if "Aggregate" in l]
    # partial + final of the single global aggregate
    assert 1 <= len(aggs) <= 3, plan[:1200]

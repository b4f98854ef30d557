"""Guards for bench.py's measurement plumbing (not the timings
themselves): the dedup_keep_best phase plans must stay consistent with
the registered key, and the host-calibration probes must return the
fields cross-round comparisons read.

These exist because bench.py is the round-over-round evidence trail —
a silently-broken phase plan or calibration probe would erase the
attribution instrumentation added for the round-9 verdict #3 drift
question without failing anything."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import bench as B  # noqa: E402

SF = "/root/testdata/sf0.001"


def test_dedup_keep_best_phases_align_with_registered_key(spark):
    phases = B.PHASE_FNS["dedup_keep_best"](spark, SF)
    assert set(phases) == {"pairs_cc", "full"}
    full = phases["full"]
    import __spark_entry__ as E

    registered = E.queries()["dedup_keep_best"](spark, SF)
    # the 'full' phase IS the registered pipeline: same rows, same schema
    assert full.columns == registered.columns
    assert full.count() == registered.count()
    # pairs_cc is the CC stage: (doc_id, cluster) for clustered docs only
    cc = phases["pairs_cc"]
    assert {"doc_id", "cluster"} <= set(cc.columns)
    assert 0 < cc.count() <= full.count()


def test_host_calibration_shape(spark):
    cal = B._host_calibration(
        spark, py_iters=10_000, scan_rows=100_000, shuffle_rows=10_000
    )
    assert set(cal) == {"py_loop_s", "jvm_hash_sum_s", "jvm_shuffle_s"}
    for v in cal.values():
        assert isinstance(v, float) and v >= 0.0


def test_host_drift_suspects_heuristic():
    """The automated §20 attribution (round-10 verdict #4): flag a key
    only when its wall AND the median probe ratio move >25% / ≥15% the
    same direction; never flag reshaped keys or when calibration is
    missing."""
    cal_slow = {"py_loop_s": 0.6, "jvm_hash_sum_s": 0.5, "jvm_shuffle_s": 0.58}
    cal_ref = {"py_loop_s": 0.3, "jvm_hash_sum_s": 0.29, "jvm_shuffle_s": 0.3}
    timings = {"a": 2.6, "b": 1.0, "c": 3.0, "d": 2.6}
    round_ref = {"a": 2.0, "b": 1.0, "c": 2.0}
    # host 2x slower: 'a' (+30%) flagged, 'b' (flat) not, 'c' reshaped
    # not, 'd' has no reference so not
    got = B._host_drift_suspects(timings, round_ref, cal_slow, cal_ref, ["c"])
    assert got == ["a"]
    # probes flat -> same key deltas are PLAN drift, nothing flagged
    assert B._host_drift_suspects(timings, round_ref, cal_ref, cal_ref, []) == []
    # faster host + faster key flags the downward direction too
    cal_fast = {"py_loop_s": 0.2, "jvm_hash_sum_s": 0.2, "jvm_shuffle_s": 0.2}
    got = B._host_drift_suspects({"a": 1.4}, {"a": 2.0}, cal_fast, cal_ref, [])
    assert got == ["a"]
    # missing calibration on either side -> empty, never invent suspects
    assert B._host_drift_suspects(timings, round_ref, {}, cal_ref, []) == []
    assert B._host_drift_suspects(timings, round_ref, cal_slow, {}, []) == []


def test_funnel_steps_usr_rows_equal_standalone_funnel_user_times(spark):
    """The round-10 rule-14b consolidation must be an identity: the
    'usr' rows riding the funnel_steps key are the standalone
    funnel_user_times relation, column-for-column (user id through the
    integer→VARCHAR device) — if the carrier's mapping drifts, this
    fails before the oracle does."""
    import __spark_entry__ as E
    from pyspark.sql import functions as F

    merged = (
        E.queries()["funnel_steps"](spark, SF)
        .where(F.col("side") == "usr")
        .select(
            F.col("step").cast("long").alias("user_id"),
            F.col("a").alias("furthest_step"),
            F.col("b").alias("t_1"),
            F.col("c").alias("t_2"),
            F.col("d").alias("t_3"),
            F.col("e").alias("convert_ms"),
        )
    )
    standalone = E.q_funnel_user_times(spark, SF)
    assert merged.count() == standalone.count() > 0
    assert merged.exceptAll(standalone).count() == 0
    assert standalone.exceptAll(merged).count() == 0


def test_tokenizer_fertility_plan_is_one_partial_aggregate(spark):
    """The registered tokenizer_fertility key's 100 TB shape: ONE
    map-side-combined aggregate (partial then final HashAggregate), no
    Python UDF stage, scan reads only (source, text)."""
    import __spark_entry__ as E
    from buildkite_logs_parquet_spark.plans.checks import (
        explain_str,
        read_schema_columns,
    )

    import re

    df = E.queries()["tokenizer_fertility"](spark, SF)
    plan = explain_str(df)
    # one shuffle: the group-by (formatted mode names each node twice —
    # tree line + detail header — so count the detail headers)
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1
    assert "partial_sum" in plan  # map-side combine materialized
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    cols = read_schema_columns(df)
    assert cols and all(set(c) <= {"source", "text"} for c in cols)


def test_overlap_legs_value_identical(spark):
    """The §2.6 overlap (round 12) must not change any query's rows: the
    eager localCheckpoint path and the lazy single-plan path are the
    same relation.  Checked on the two most leg-heavy touched keys at
    sf0.001 (events_agg: 8 legs incl. the driver-side percentile
    bisection; webgraph_rank: 4 legs over a shared persist)."""
    import __spark_entry__ as E

    for key in ("events_agg", "webgraph_rank"):
        rows = {}
        for flag in (True, False):
            E._OVERLAP_LEGS = flag
            E.release_query_caches()
            spark.catalog.clearCache()
            df = E.queries()[key](spark, SF)
            rows[flag] = sorted(map(tuple, df.collect()))
        E._OVERLAP_LEGS = True
        assert rows[True] == rows[False], key


def test_time_legs_rebuilds_lazy_shape(spark):
    """bench._time_legs must measure the LAZY plan (per-leg diagnostics)
    even while the headline path overlaps: the rebuild inside it toggles
    __spark_entry__._OVERLAP_LEGS off and restores it."""
    import __spark_entry__ as E

    assert E._OVERLAP_LEGS is True
    legs = B._time_legs(spark, E.queries()["events_agg"], SF, ("side", "|"))
    assert E._OVERLAP_LEGS is True
    assert set(legs) >= {"hourly", "pctl", "rollup"}

"""Regression tests for the events-table read path (``_events``).

The driver's testdata generator has shipped ``events.parquet`` with ``ts``
stored BOTH ways across rounds:

- parquet TIMESTAMP(NANOS) — Spark reads it as a raw int64 under
  ``spark.sql.legacy.parquet.nanosAsLong`` (set in session.py);
- parquet TIMESTAMP(MICROS) — Spark reads it as TIMESTAMP_NTZ.

Round 2 lost five correctness queries and the whole bench run to a
hard-coded nanos assumption; this file writes BOTH schemas and asserts
``_events`` produces identical epoch-ms values from each, so the read
path can never silently regress to single-schema again.
"""

import datetime

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

# epoch-ms instants used for both physical encodings
_TS_MS = [1_700_000_000_123, 1_700_000_050_456, 1_700_003_600_789]


def _write_events(path: str, unit: str) -> None:
    """Write a tiny events table with ts in the given physical unit.

    parquet version='2.6' is required for TIMESTAMP(NANOS); '2.4' would
    silently coerce ns → µs and the test would stop testing anything.
    """
    scale = {"ns": 1_000_000, "us": 1_000}[unit]
    table = pa.table(
        {
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "ts": pa.array([m * scale for m in _TS_MS], pa.timestamp(unit)),
            "user_id": pa.array([10, 10, 11], pa.int64()),
            "event_type": pa.array(["click", "purchase", "click"]),
            "value": pa.array([1.5, 2.5, 3.5], pa.float64()),
            "props": pa.array(['{"k": 1}', '{"k": 2}', '{"k": 3}']),
        }
    )
    pq.write_table(table, path, version="2.6")


@pytest.fixture(scope="module")
def two_schema_dirs(tmp_path_factory):
    dirs = {}
    for unit in ("ns", "us"):
        d = tmp_path_factory.mktemp(f"events_{unit}")
        _write_events(str(d / "events.parquet"), unit)
        dirs[unit] = str(d)
    return dirs


def _physical_type(path: str) -> str:
    return str(pq.read_schema(path).field("ts").type)


def test_fixture_preserves_physical_units(two_schema_dirs):
    # guard the guard: if pyarrow ever coerces ns → µs the two-schema test
    # degenerates into one schema tested twice
    assert _physical_type(two_schema_dirs["ns"] + "/events.parquet") == "timestamp[ns]"
    assert _physical_type(two_schema_dirs["us"] + "/events.parquet") == "timestamp[us]"


def test_events_reads_both_schemas_identically(spark, two_schema_dirs):
    import __spark_entry__ as E

    out = {}
    for unit, d in two_schema_dirs.items():
        rows = (
            E._events(spark, d)
            .select("event_id", "ts_ms")
            .orderBy("event_id")
            .collect()
        )
        out[unit] = [(r.event_id, r.ts_ms) for r in rows]
    assert out["ns"] == out["us"]
    assert [ms for _, ms in out["us"]] == _TS_MS


def test_events_nanos_reads_as_long(spark, two_schema_dirs):
    df = spark.read.parquet(two_schema_dirs["ns"] + "/events.parquet")
    assert dict(df.dtypes)["ts"] == "bigint"


def test_events_micros_reads_as_timestamp(spark, two_schema_dirs):
    df = spark.read.parquet(two_schema_dirs["us"] + "/events.parquet")
    assert dict(df.dtypes)["ts"] in ("timestamp", "timestamp_ntz")


def test_events_queries_run_on_both_schemas(spark, two_schema_dirs):
    """Every _events-derived registry query must at least ANALYZE cleanly on
    both physical schemas (the round-2 failure mode was an
    AnalysisException at plan time, before any row moved)."""
    import __spark_entry__ as E

    event_queries = {
        # events_agg includes the former events_percentiles, sessions,
        # native_ts, AND asof/interval sides (round-4/7/8 consolidations);
        # q_events_asof is exercised directly as the merged leg builder
        "events_agg": E.q_events_agg,
        "events_asof_leg": E.q_events_asof,
        "funnel_steps": E.q_funnel_steps,
        "cohort_retention": E.q_cohort_retention,
    }
    for unit, d in two_schema_dirs.items():
        for name, fn in event_queries.items():
            df = fn(spark, d)
            df.schema  # forces analysis
            assert df.count() >= 0, f"{name} on {unit}"


def test_native_ts_canary_runs(spark, two_schema_dirs):
    """The canary intentionally has NO nanos branch — it must run on the
    current (µs) schema; on a nanos regeneration it alone goes red."""
    import __spark_entry__ as E

    df = E.q_events_native_ts(spark, two_schema_dirs["us"])
    rows = df.orderBy("day").collect()
    assert rows[0].n_events == 3 or len(rows) >= 1

"""Multi-granularity time rollups (operators/timeseries.py)."""

from decimal import Decimal

from pyspark.sql import functions as F

from buildkite_logs_parquet_spark.operators.timeseries import (
    time_bucket,
    time_rollup,
)

SF = "/root/testdata/sf0.001"

HOUR_MS = 3_600_000


def test_time_bucket_floors_to_boundary(spark):
    df = spark.createDataFrame(
        [(0,), (HOUR_MS - 1,), (HOUR_MS,), (3 * HOUR_MS + 17,)], "ts_ms long"
    )
    out = [r["b"] for r in df.select(time_bucket(F.col("ts_ms"), HOUR_MS).alias("b")).collect()]
    assert out == [0, 0, HOUR_MS, 3 * HOUR_MS]


def _events(spark):
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
    return ev.withColumn("ts_ms", ts_ms)


def _aggs():
    return [
        F.count("*").alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,2)")).alias("total_value"),
    ]


def test_rollup_levels_match_independent_groupbys(spark):
    ev = _events(spark)
    out = time_rollup(ev, "ts_ms", ["event_type"], _aggs())
    got = {
        (r["level"], r["day"], r["hour"], r["event_type"]): (
            r["n_events"],
            r["total_value"],
        )
        for r in out.collect()
    }
    ts = F.timestamp_millis(F.col("ts_ms"))
    base = ev.withColumn("_d", F.date_format(ts, "yyyy-MM-dd")).withColumn(
        "_h", F.date_format(ts, "yyyy-MM-dd HH:00:00")
    )
    # level 3: (day, hour, type) — plain groupBy must agree exactly
    lvl3 = base.groupBy("_d", "_h", "event_type").agg(*_aggs()).collect()
    for r in lvl3:
        assert got[(3, r["_d"], r["_h"], r["event_type"])] == (
            r["n_events"],
            r["total_value"],
        )
    # level 1: per-day totals
    lvl1 = base.groupBy("_d").agg(*_aggs()).collect()
    for r in lvl1:
        assert got[(1, r["_d"], None, None)] == (r["n_events"], r["total_value"])
    # level 0: grand total
    tot = base.agg(*_aggs()).first()
    assert got[(0, None, None, None)] == (tot["n_events"], tot["total_value"])
    # every level present, and level-0 value equals the sum of any level
    lvl2_sum = sum(
        (v[1] for k, v in got.items() if k[0] == 2), Decimal("0")
    )
    assert lvl2_sum == tot["total_value"]


def test_rollup_is_one_pass(spark):
    ev = _events(spark)
    out = time_rollup(ev, "ts_ms", ["event_type"], _aggs())
    plan = out._jdf.queryExecution().executedPlan().toString()
    # native grouping sets: ONE Expand, ONE shuffle — not L scans/joins
    assert plan.count("Expand") == 1
    assert plan.count("Exchange") == 1


def test_lttb_downsample_shape_preserving(spark):
    import math

    from buildkite_logs_parquet_spark.operators.timeseries import (
        lttb_downsample,
    )

    # two series: a sine with one sharp spike, and a short passthrough
    rows = []
    for i in range(1000):
        v = math.sin(i / 25.0)
        if i == 500:
            v = 40.0  # spike LTTB must keep
        rows.append(("s1", i * 1000, v))
    rows += [("s2", i * 1000, float(i)) for i in range(20)]
    df = spark.createDataFrame(rows, "series string, ts long, value double")

    out = lttb_downsample(df, ["series"], "ts", "value", n_out=50)
    by = {}
    for r in out.collect():
        by.setdefault(r["series"], []).append((r["ts"], r["value"]))
    s1 = sorted(by["s1"])
    assert len(s1) == 50
    # endpoints pinned, spike preserved
    assert s1[0][0] == 0 and s1[-1][0] == 999000
    assert any(v == 40.0 for _, v in s1)
    # short series passes through untouched
    assert len(by["s2"]) == 20

    # deterministic under repartition
    again = lttb_downsample(
        df.repartition(7), ["series"], "ts", "value", n_out=50
    )
    a1 = sorted(
        (r["ts"], r["value"]) for r in again.collect() if r["series"] == "s1"
    )
    assert a1 == s1


class TestFillGaps:
    def _df(self, spark):
        rows = [
            ("a", 1000, 1.0), ("a", 1100, 2.0),  # same bucket at 500ms? no: 1000,1000
            ("a", 2500, 5.0),                     # gap at 1500/2000
            ("b", 0, 7.0),
        ]
        return spark.createDataFrame(rows, "k string, ts long, v double")

    def test_ffill_fills_holes_and_flags_them(self, spark):
        from buildkite_logs_parquet_spark.operators.timeseries import fill_gaps

        out = fill_gaps(
            self._df(spark), "ts", ["k"], 500, ["v"], strategy="ffill"
        )
        got = {
            (r["k"], r["bucket_ms"]): (r["v"], r["is_filled"])
            for r in out.collect()
        }
        # bucket 1000 keeps the LAST raw row (ts 1100 -> v 2.0)
        assert got[("a", 1000)] == (2.0, False)
        assert got[("a", 1500)] == (2.0, True)
        assert got[("a", 2000)] == (2.0, True)
        assert got[("a", 2500)] == (5.0, False)
        assert got[("b", 0)] == (7.0, False)
        assert len(got) == 5  # per-key spans, not the global span

    def test_zero_and_null_strategies(self, spark):
        from buildkite_logs_parquet_spark.operators.timeseries import fill_gaps

        df = self._df(spark)
        z = {
            (r["k"], r["bucket_ms"]): r["v"]
            for r in fill_gaps(df, "ts", ["k"], 500, ["v"], "zero").collect()
        }
        assert z[("a", 1500)] == 0.0 and z[("a", 1000)] == 2.0
        n = {
            (r["k"], r["bucket_ms"]): r["v"]
            for r in fill_gaps(df, "ts", ["k"], 500, ["v"], "null").collect()
        }
        assert n[("a", 1500)] is None

    def test_leading_holes_stay_null_under_ffill(self, spark):
        from buildkite_logs_parquet_spark.operators.timeseries import fill_gaps

        # key with a NULL-valued first observation: nothing to carry
        df = spark.createDataFrame(
            [("a", 0, None), ("a", 1000, 3.0)], "k string, ts long, v double"
        )
        out = {
            r["bucket_ms"]: (r["v"], r["is_filled"])
            for r in fill_gaps(df, "ts", ["k"], 500, ["v"]).collect()
        }
        # bucket 0 HAS an observation (whose value is NULL) — data, not
        # a gap; bucket 500 is a genuine gap with nothing to carry
        assert out[0] == (None, False)
        assert out[500] == (None, True)
        assert out[1000] == (3.0, False)

    def test_validation(self, spark):
        import pytest as _pytest

        from buildkite_logs_parquet_spark.operators.timeseries import fill_gaps

        df = self._df(spark)
        with _pytest.raises(ValueError):
            fill_gaps(df, "ts", ["k"], 500, ["v"], "bogus")
        with _pytest.raises(ValueError):
            fill_gaps(df, "ts", ["k"], 0, ["v"])

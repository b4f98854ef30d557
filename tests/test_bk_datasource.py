"""Spark 4 Python DataSource for Buildkite job logs — distributed
per-job fetch, exercised against file:// fixtures (no network)."""

import pytest


@pytest.fixture()
def api_fixture(tmp_path):
    base = tmp_path / "v2"
    for job, body in (
        ("j1", "line one\nline two\r\nline three\n"),
        ("j2", "only line"),
    ):
        d = base / "organizations" / "org" / "pipelines" / "pipe" / "builds" / "7" / "jobs" / job
        d.mkdir(parents=True)
        (d / "log").write_text(body)
    return f"file://{base}"


def _load(spark, api_fixture, jobs):
    from buildkite_logs_parquet_spark.sources import bk_datasource

    bk_datasource.register(spark)
    return (
        spark.read.format("buildkite_log")
        .option("organization", "org")
        .option("pipeline", "pipe")
        .option("build", "7")
        .option("jobs", jobs)
        .option("base_url", api_fixture)
        .load()
    )


def test_datasource_reads_jobs_in_parallel_partitions(spark, api_fixture):
    df = _load(spark, api_fixture, "j1,j2")
    assert df.columns == ["file", "line_no", "raw"]
    assert df.rdd.getNumPartitions() == 2  # one partition per job
    rows = sorted(
        ((r["file"], r["line_no"], r["raw"]) for r in df.collect())
    )
    assert rows == [
        ("bk://org/pipe/7/j1", 0, "line one"),
        ("bk://org/pipe/7/j1", 1, "line two"),  # \r stripped
        ("bk://org/pipe/7/j1", 2, "line three"),
        ("bk://org/pipe/7/j2", 0, "only line"),
    ]


def test_datasource_composes_with_parse_pipeline(spark, api_fixture):
    from buildkite_logs_parquet_spark.operators import (
        entries_view,
        parse_log_lines,
    )

    df = _load(spark, api_fixture, "j1")
    entries = entries_view(parse_log_lines(df, file_col="file"))
    assert entries.count() == 3
    assert entries.where("clean_content = 'line two'").count() == 1


def test_datasource_missing_options_raise(spark, api_fixture):
    from pyspark.errors.exceptions.captured import AnalysisException

    from buildkite_logs_parquet_spark.sources import bk_datasource

    bk_datasource.register(spark)
    with pytest.raises((AnalysisException, Exception)) as ei:
        (
            spark.read.format("buildkite_log")
            .option("organization", "org")
            .option("base_url", api_fixture)
            .load()
            .collect()
        )
    assert "required" in str(ei.value)

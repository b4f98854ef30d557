"""End-to-end parity: our Spark ingest of the reference's committed raw log
must reproduce the reference's own committed Parquet output value-for-value.

This is the strongest parity evidence available: bash-example.parquet was
produced by the reference engine from bash-example.log (212 rows, CRLF line
endings, embedded multi-OSC progress lines, ANSI-wrapped commands).
"""

import os

import pytest
from pyspark.sql import functions as F

from buildkite_logs_parquet_spark.operators.ingest import entries_view, parse_log_lines
from buildkite_logs_parquet_spark.sources.logs import read_log_lines
from buildkite_logs_parquet_spark.sources.parquet_io import read_entries

LOG = "/root/reference/testdata/bash-example.log"
PARQUET = "/root/reference/testdata/bash-example.parquet"

pytestmark = pytest.mark.skipif(
    not (os.path.exists(LOG) and os.path.exists(PARQUET)),
    reason="reference testdata not present",
)

CANON = [
    "timestamp",
    "content",
    "group",
    "has_timestamp",
    "is_command",
    "is_group",
    "is_progress",
]


@pytest.mark.parametrize("strategy", ["window", "broadcast"])
def test_ingest_matches_reference_output(spark, strategy):
    lines = read_log_lines(spark, LOG)
    parsed = parse_log_lines(lines, file_col="file", group_strategy=strategy)
    ours = entries_view(parsed).orderBy("row_id").select(*CANON).collect()

    theirs = (
        read_entries(spark, PARQUET).select(*CANON).collect()
    )  # reference file is single row-group, written in line order

    assert len(ours) == len(theirs) == 212
    for i, (a, b) in enumerate(zip(ours, theirs)):
        assert tuple(a) == tuple(b), f"row {i}: {tuple(a)} != {tuple(b)}"


BAZEL = "/root/reference/testdata/bazel-bazel_build_32517_rocky-rocky-linux-8.parquet"


@pytest.mark.skipif(not os.path.exists(BAZEL), reason="reference testdata absent")
def test_query_ops_on_reference_bazel_file(spark):
    """The reference's larger committed file: 11,029 rows / 12 row groups —
    exercises multi-row-group reads, tolerant schema, and the query ops on
    real data we didn't produce."""
    from buildkite_logs_parquet_spark.operators.queries import (
        filter_by_group,
        list_groups,
        processing_summary,
        tail,
    )
    from buildkite_logs_parquet_spark.sources.parquet_io import file_info, read_entries

    info = file_info(BAZEL)
    assert info["row_count"] == 11029 and info["num_row_groups"] == 12

    entries = read_entries(spark, BAZEL)
    assert entries.count() == 11029
    s = processing_summary(entries).first()
    assert s["total_entries"] == 11029
    assert 0 < s["sections"] < 100

    groups = list_groups(entries).collect()
    # distinct group names ≤ header rows (+1 for <no group>); names repeat
    assert 1 <= len(groups) <= s["sections"] + 1
    assert sum(g["entry_count"] for g in groups) == 11029

    # positional ops need an order column; synthesize like the CLI does
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    ordered = entries.withColumn(
        "row_id", F.row_number().over(W.orderBy(F.monotonically_increasing_id())) - 1
    )
    last3 = tail(ordered, 3).collect()
    assert [r["row_id"] for r in last3] == [11026, 11027, 11028]

    assert filter_by_group(entries, "bazel").count() >= 0  # runs tolerantly


def test_read_log_dir_multi_file(spark, tmp_path):
    from buildkite_logs_parquet_spark.sources.logs import read_log_dir

    a = tmp_path / "a.log"
    b = tmp_path / "b.log"
    a.write_text("a0\na1\n")
    b.write_text("b0\n")
    df = read_log_dir(spark, [str(a), str(b)])
    rows = sorted(
        (r["file"].split("/")[-1], r["line_no"], r["raw"])
        for r in df.select("file", "line_no", "raw").collect()
    )
    assert rows == [
        ("a.log", 0, "a0"),
        ("a.log", 1, "a1"),
        ("b.log", 0, "b0"),
    ]


def test_line_reader_scanlines_semantics(spark, tmp_path):
    # split on \n, drop exactly one trailing \r, keep interior \r
    p = tmp_path / "crlf.log"
    p.write_bytes(b"one\r\ntwo\rstill two\r\nthree\n")
    rows = (
        read_log_lines(spark, str(p)).orderBy("line_no").select("raw").collect()
    )
    assert [r["raw"] for r in rows] == ["one", "two\rstill two", "three"]

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

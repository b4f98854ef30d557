"""Reference query operator tests (list-groups, filters, tail/seek, summary)."""

import pytest
from pyspark.sql import functions as F

from buildkite_logs_parquet_spark.operators.ingest import entries_view, parse_log_lines
from buildkite_logs_parquet_spark.operators import queries as Q

OSC = "\x1b_bk;t="
BEL = "\x07"

LINES = [
    f"{OSC}1000{BEL}before any group",
    f"{OSC}2000{BEL}~~~ Running tests",
    f"{OSC}3000{BEL}$ make test",
    f"{OSC}4000{BEL}remote: Counting objects: 50% (1/2)[K",
    f"{OSC}5000{BEL}--- Environment",
    f"{OSC}6000{BEL}$ env",
    f"{OSC}7000{BEL}plain output",
]


@pytest.fixture(scope="module")
def entries(spark):
    lines = spark.createDataFrame(
        [("f", i, l) for i, l in enumerate(LINES)],
        "file string, line_no long, raw string",
    )
    return entries_view(parse_log_lines(lines, file_col="file")).cache()


def test_list_groups(spark, entries):
    rows = Q.list_groups(entries).collect()
    assert [r["name"] for r in rows] == [
        "<no group>",
        "~~~ Running tests",
        "--- Environment",
    ]
    by_name = {r["name"]: r for r in rows}
    ng = by_name["<no group>"]
    assert ng["entry_count"] == 1 and ng["commands"] == 0 and ng["progress"] == 0
    rt = by_name["~~~ Running tests"]
    assert rt["entry_count"] == 3 and rt["commands"] == 1 and rt["progress"] == 1
    assert rt["first_seen"].timestamp() == 2.0 and rt["last_seen"].timestamp() == 4.0
    env = by_name["--- Environment"]
    assert env["entry_count"] == 3 and env["commands"] == 1 and env["progress"] == 0


def test_filter_by_group(spark, entries):
    # case-insensitive substring
    assert Q.filter_by_group(entries, "running TESTS").count() == 3
    # the <no group> placeholder quirk: pattern "no group" matches unlabeled rows
    assert Q.filter_by_group(entries, "no group").count() == 1
    assert Q.filter_by_group(entries, "absent").count() == 0


def test_filter_by_type(spark, entries):
    assert Q.filter_by_type(entries, "command").count() == 2
    assert Q.filter_by_type(entries, "group").count() == 2
    assert Q.filter_by_type(entries, "section").count() == 2  # legacy alias
    assert Q.filter_by_type(entries, "progress").count() == 1
    assert Q.filter_by_type(entries, "unknown").count() == 7  # keeps all
    assert Q.filter_by_type(entries, "").count() == 7


def test_processing_summary(spark, entries):
    row = Q.processing_summary(entries).first()
    assert row["total_entries"] == 7
    assert row["entries_with_time"] == 7
    assert row["commands"] == 2
    assert row["sections"] == 2
    assert row["progress"] == 1
    assert row["regular"] == 7 - 2 - 2 - 1


def test_seek(spark, entries):
    got = Q.seek(entries, 5).orderBy("row_id").collect()
    assert [r["row_id"] for r in got] == [5, 6]
    with pytest.raises(ValueError, match="exceeds total rows"):
        Q.seek(entries, 7)
    with pytest.raises(ValueError):
        Q.seek(entries, 107)
    assert Q.seek(entries, 0).count() == 7


def test_tail(spark, entries):
    got = Q.tail(entries, 3).orderBy("row_id").collect()
    assert [r["row_id"] for r in got] == [4, 5, 6]
    assert Q.tail(entries, 100).count() == 7  # clamped to full file
    assert Q.tail(entries, 0).count() == 7  # default 10, clamped


def test_by_group_stats_limit(spark, entries):
    assert Q.by_group_stats(entries, "environment", limit=2).count() == 2
    assert Q.by_group_stats(entries, "environment").count() == 3

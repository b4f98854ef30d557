"""Structured Streaming follow-mode tests (availableNow + memory sink)."""

import time

from buildkite_logs_parquet_spark.streaming.follow import follow_log_dir

OSC = "\x1b_bk;t="
BEL = "\x07"


def test_follow_log_dir_parses_new_files(spark, tmp_path):
    logs = tmp_path / "logs"
    logs.mkdir()
    (logs / "job1.log").write_text(
        f"{OSC}1745322209921{BEL}~~~ Group A\n"
        f"{OSC}1745322209922{BEL}$ make test\n"
        "plain line\n"
    )
    stream = follow_log_dir(spark, str(logs))
    assert stream.isStreaming
    q = (
        stream.writeStream.format("memory")
        .queryName("follow_test")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = {
        r["content"]: r
        for r in spark.sql(
            "select timestamp, content, is_command, is_group, group from follow_test"
        ).collect()
    }
    assert len(out) == 3
    grp = out["~~~ Group A"]
    assert grp["is_group"] and grp["group"] == "~~~ Group A"
    assert out["$ make test"]["is_command"]
    assert out["plain line"]["timestamp"] == 0

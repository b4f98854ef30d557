"""Structured Streaming follow-mode tests (availableNow + memory sink)."""

import time

from buildkite_logs_parquet_spark.streaming.follow import (
    follow_log_dir,
    follow_with_groups,
)

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


def test_follow_with_groups_across_batches(spark, tmp_path):
    """Stateful group propagation over a checkpointed multi-batch run:
    per-file state, no cross-file leakage (memory sink cannot recover a
    checkpoint, so this drives a parquet sink like production would)."""
    logs = tmp_path / "glogs"
    logs.mkdir()
    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "sink")
    (logs / "a.log").write_text(
        f"{OSC}1{BEL}before header\n"
        f"{OSC}2{BEL}~~~ First\n"
        f"{OSC}3{BEL}inside first\n"
    )

    def run_batch():
        stream = follow_with_groups(spark, str(logs))
        q = (
            stream.writeStream.format("parquet")
            .outputMode("append")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    run_batch()
    got = {
        r["content"]: r["group"] for r in spark.read.parquet(sink).collect()
    }
    assert got["before header"] == ""
    assert got["~~~ First"] == "~~~ First"
    assert got["inside first"] == "~~~ First"

    # second batch: a new file — its own state key, so no group leakage
    # from a.log, and its own header chain applies
    (logs / "b.log").write_text(
        f"{OSC}4{BEL}no header yet in b\n" f"{OSC}5{BEL}+++ B group\n"
    )
    run_batch()
    got = {
        r["content"]: r["group"] for r in spark.read.parquet(sink).collect()
    }
    assert len(got) == 5
    assert got["no header yet in b"] == ""  # state is per-file
    assert got["+++ B group"] == "+++ B group"
    assert got["inside first"] == "~~~ First"  # batch-1 rows unchanged

"""tail_text streaming source: live-append tailing with complete-line
semantics (bytes appended to an already-seen file, which Spark's file
stream source cannot observe)."""

import time

import pytest


def _start(spark, pattern, out, ck, start_at="beginning"):
    from buildkite_logs_parquet_spark.sources import tail_source

    tail_source.register(spark)
    stream = (
        spark.readStream.format("tail_text")
        .option("path", pattern)
        .option("start_at", start_at)
        .load()
    )
    return (
        stream.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .trigger(processingTime="300 milliseconds")
        .start()
    )


def _wait_rows(spark, out, n, timeout=30.0):
    deadline = time.monotonic() + timeout
    while time.monotonic() < deadline:
        try:
            got = spark.read.parquet(out).count()
            if got >= n:
                return spark.read.parquet(out)
        except Exception:
            pass
        time.sleep(0.3)
    raise AssertionError(f"never reached {n} rows in {out}")


def test_tail_text_picks_up_appended_bytes(spark, tmp_path):
    log = tmp_path / "job.log"
    log.write_text("first\nsecond\r\n")
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    q = _start(spark, str(tmp_path / "*.log"), out, ck)
    try:
        df = _wait_rows(spark, out, 2)
        rows = {(r["line_no"], r["raw"]) for r in df.collect()}
        assert rows == {(0, "first"), (1, "second")}

        # append: one complete line + one PARTIAL line (no newline yet)
        with open(log, "a") as f:
            f.write("third\npart")
        df = _wait_rows(spark, out, 3)
        rows = {(r["line_no"], r["raw"]) for r in df.collect()}
        assert (2, "third") in rows
        assert not any(r[1].startswith("part") for r in rows)

        # completing the partial line releases it
        with open(log, "a") as f:
            f.write("ial\n")
        df = _wait_rows(spark, out, 4)
        rows = {(r["line_no"], r["raw"]) for r in df.collect()}
        assert (3, "partial") in rows
    finally:
        q.stop()


def test_tail_text_start_at_end_skips_history(spark, tmp_path):
    log = tmp_path / "hist.log"
    log.write_text("old one\nold two\n")
    out, ck = str(tmp_path / "out2"), str(tmp_path / "ck2")
    q = _start(spark, str(tmp_path / "*.log"), out, ck, start_at="end")
    try:
        # the initial offset (the skip point) is computed once the stream
        # is live — appending before that would be skipped as history
        deadline = time.monotonic() + 60
        while not q.recentProgress and time.monotonic() < deadline:
            time.sleep(0.3)
        assert q.recentProgress, "stream never made progress"
        with open(log, "a") as f:
            f.write("fresh\n")
        df = _wait_rows(spark, out, 1)
        rows = [(r["line_no"], r["raw"]) for r in df.collect()]
        # line_no stays file-absolute even though history was skipped
        assert rows == [(2, "fresh")]
    finally:
        q.stop()


def test_tail_text_composes_with_streaming_parse_pipeline(spark, tmp_path):
    """A live tail stream flows through the streaming OSC parse AND the
    stateful group propagation — a build log followed in real time."""
    from buildkite_logs_parquet_spark.sources import tail_source
    from buildkite_logs_parquet_spark.streaming.follow import (
        parse_lines_stream,
        propagate_groups_stream,
    )

    log = tmp_path / "live.log"
    log.write_text(
        "\x1b_bk;t=1700000000000\x07echo hello\n"
        "\x1b_bk;t=1700000001000\x07--- :package: Build\n"
    )
    tail_source.register(spark)
    stream = (
        spark.readStream.format("tail_text")
        .option("path", str(tmp_path / "*.log"))
        .load()
        .select("raw", "file")
    )
    entries = propagate_groups_stream(parse_lines_stream(stream))
    assert entries.isStreaming
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    q = (
        entries.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .trigger(processingTime="300 milliseconds")
        .start()
    )
    try:
        df = _wait_rows(spark, out, 2)
        rows = {r["clean_content"]: r for r in df.collect()}
        assert rows["echo hello"]["timestamp"] == 1700000000000
        assert rows["--- :package: Build"]["is_group"]
        # live append flows through parse AND keeps the running group
        # across micro-batches (state cell per file)
        with open(log, "a") as f:
            f.write("\x1b_bk;t=1700000002000\x07$ make test\n")
        df = _wait_rows(spark, out, 3)
        rows = {r["clean_content"]: r for r in df.collect()}
        assert rows["$ make test"]["is_command"]
        assert rows["$ make test"]["group"] == "--- :package: Build"
    finally:
        q.stop()

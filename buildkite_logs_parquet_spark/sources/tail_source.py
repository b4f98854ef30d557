"""True ``tail -f`` of GROWING log files as a Spark streaming source.

Spark's built-in file stream source discovers new FILES; bytes appended
to an already-seen file are invisible to it — so ``follow_log_dir``
(streaming/follow.py) covers the rotate-into-new-files layout but not a
live, still-being-written build log.  This source closes that gap with
the Spark 4 Python ``SimpleDataSourceStreamReader``: the stream offset is
a per-file ``(byte_offset, line_count)`` map, each micro-batch reads the
bytes appended since the last offset, and only COMPLETE lines (terminated
by ``\n``) are emitted — a partial trailing line stays unconsumed until
its newline arrives, so replays are byte-deterministic.

Line semantics match ``read_log_lines``: ``\n`` separation, one trailing
``\r`` stripped, 0-based per-file ``line_no`` — ``parse_log_lines``
composes unchanged, and the OSC/group pipeline runs on a LIVE log.

The simple stream reader runs on the driver — the right trade for a tail
stream (human-scale append rates); bulk history belongs to the
distributed batch reader.

Options: ``path`` (glob pattern, required); ``start_at`` = ``beginning``
(default — replay existing content) or ``end`` (only new bytes).
"""

from __future__ import annotations

import glob as _glob
import os

from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader

SCHEMA = "file string, line_no bigint, raw string"


class TailTextDataSource(DataSource):
    """``spark.dataSource.register(TailTextDataSource)`` then
    ``spark.readStream.format("tail_text").option("path", glob).load()``."""

    @classmethod
    def name(cls) -> str:
        return "tail_text"

    def schema(self) -> str:
        return SCHEMA

    def simpleStreamReader(self, schema) -> "TailTextStreamReader":
        return TailTextStreamReader(self.options)


def _consume(path: str, byte_off: int, line_no: int, limit: int | None = None):
    """Read complete lines from ``byte_off`` (to ``limit`` bytes if given,
    else the current size); returns (rows, new_byte_off, new_line_no)."""
    size = os.path.getsize(path) if limit is None else limit
    rows = []
    if size > byte_off:
        with open(path, "rb") as f:
            f.seek(byte_off)
            buf = f.read(size - byte_off)
        last_nl = buf.rfind(b"\n")
        if last_nl >= 0:
            for line in buf[:last_nl].split(b"\n"):
                s = line.decode("utf-8", errors="replace")
                if s.endswith("\r"):
                    s = s[:-1]
                rows.append((f"file://{path}", line_no, s))
                line_no += 1
            byte_off += last_nl + 1
    return rows, byte_off, line_no


class TailTextStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options: dict):
        self.pattern = options.get("path", "")
        if not self.pattern:
            raise ValueError("path is required")
        if self.pattern.startswith("file://"):
            self.pattern = self.pattern[7:]
        self.start_at = options.get("start_at", "beginning")
        if self.start_at not in ("beginning", "end"):
            raise ValueError("start_at must be 'beginning' or 'end'")

    def initialOffset(self) -> dict:
        files = {}
        if self.start_at == "end":
            for p in sorted(_glob.glob(self.pattern)):
                # skip current content, but count its lines so line_no
                # stays the file-absolute position
                _rows, off, ln = _consume(p, 0, 0)
                files[p] = [off, ln]
        return {"files": files}

    def read(self, start: dict):
        state = {p: list(v) for p, v in start.get("files", {}).items()}
        rows = []
        for p in sorted(_glob.glob(self.pattern)):
            off, ln = state.get(p, [0, 0])
            got, off, ln = _consume(p, off, ln)
            rows.extend(got)
            state[p] = [off, ln]
        return iter(rows), {"files": state}

    def readBetweenOffsets(self, start: dict, end: dict):
        # deterministic replay: re-read exactly the byte ranges the
        # original batch consumed
        s = start.get("files", {})
        rows = []
        for p, (e_off, _e_ln) in end.get("files", {}).items():
            off, ln = s.get(p, [0, 0])
            if os.path.exists(p) and e_off > off:
                got, _off, _ln = _consume(p, off, ln, limit=e_off)
                rows.extend(got)
        return iter(rows)


def register(spark) -> None:
    """Register the source on this session (idempotent)."""
    spark.dataSource.register(TailTextDataSource)

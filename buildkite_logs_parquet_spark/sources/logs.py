"""Log line sources: local files (distributed scan) and the Buildkite API.

Line-splitting parity: the reference uses ``bufio.Scanner`` with
``ScanLines`` (parser.go:72) — split on ``\\n`` ONLY, then drop one trailing
``\\r``.  Hadoop's default ``LineRecordReader`` also splits on bare ``\\r``,
which would shred the multi-OSC progress lines real Buildkite logs embed
(one ``\\n``-line containing many ``\\x1b_bk;t=…\\x07…\\r`` segments — see
the reference's bash-example.log, 212 scanner-lines but 600+ CR-separated
segments).  We therefore pin ``textinputformat.record.delimiter=\\n`` and
strip exactly one trailing ``\\r`` ourselves.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_LINES_SCHEMA = T.StructType(
    [
        T.StructField("file", T.StringType(), False),
        T.StructField("line_no", T.LongType(), False),
        T.StructField("raw", T.StringType(), False),
    ]
)


def read_log_lines(
    spark: SparkSession, path: str, min_partitions: int | None = None
) -> DataFrame:
    """Read raw log file(s) into ``(file, line_no, raw)`` with a stable
    0-based per-file line number.

    ``spark.read.text`` preserves order but exposes no index, and
    ``monotonically_increasing_id`` is non-contiguous, so the index is
    derived RDD-side: tag each element with (partition, intra-partition
    position), count rows per (file, partition) in one lightweight pass,
    and add the cumulative per-file offset — the standard distributed
    zipWithIndex, kept per-file so multi-file ingests stay parallel and
    group state never crosses a file boundary.  Large single files split
    into many partitions and still number correctly.
    """
    sc = spark.sparkContext
    conf = {"textinputformat.record.delimiter": "\n"}
    if min_partitions and min_partitions > 1:
        # newAPIHadoopFile has no minPartitions arg; bound the split size so
        # a single large file still fans out across tasks
        local = path[7:] if path.startswith("file://") else path
        if os.path.isfile(local):
            size = os.path.getsize(local)
            conf["mapreduce.input.fileinputformat.split.maxsize"] = str(
                max(size // min_partitions, 1 << 20)
            )
    rdd = sc.newAPIHadoopFile(
        path,
        "org.apache.hadoop.mapreduce.lib.input.TextInputFormat",
        "org.apache.hadoop.io.LongWritable",
        "org.apache.hadoop.io.Text",
        conf=conf,
    ).map(lambda kv: kv[1])

    def tag(split_index: int, it):
        pos = 0
        for line in it:
            # ScanLines parity: drop exactly one trailing \r (CRLF files)
            if line.endswith("\r"):
                line = line[:-1]
            yield (split_index, pos, line)
            pos += 1

    tagged = rdd.mapPartitionsWithIndex(tag, preservesPartitioning=True)
    # Byte offsets within one file are monotone across its splits, and
    # Hadoop split order follows (file, offset) — per-partition counts give
    # the per-split base index.  One cheap count job over already-read data.
    counts = tagged.map(lambda t: (t[0], 1)).reduceByKey(lambda a, b: a + b).collect()
    base: dict[int, int] = {}
    acc = 0
    for pid, cnt in sorted(counts):
        base[pid] = acc
        acc += cnt

    # Hadoop TextInputFormat already applied the ScanLines semantics; it
    # does not expose the filename per record, so single-path reads carry
    # the input path. Multi-file ingests should call this once per file (or
    # use read_log_dir below) to keep per-file numbering.
    file_tag = path
    rows = tagged.map(lambda t: (file_tag, base[t[0]] + t[1], t[2]))
    return spark.createDataFrame(rows, _LINES_SCHEMA)


def read_log_dir(spark: SparkSession, paths: list[str]) -> DataFrame:
    """Union of per-file ordered reads; keeps per-file line numbering so the
    group-propagation window partitions by ``file``."""
    out: DataFrame | None = None
    for p in paths:
        df = read_log_lines(spark, p)
        out = df if out is None else out.unionByName(df)
    if out is None:
        raise ValueError("no paths given")
    return out


class BuildkiteAPIClient:
    """Driver-side fetch of a job log from the Buildkite REST API, parity
    with the reference client (buildkite_api.go:21-92).

    The reference streams a single HTTP body — inherently not a distributed
    scan — so we fetch to a local spool file and hand it to the distributed
    text reader.  Network use is gated: tests stub ``_urlopen``.
    """

    BASE = "https://api.buildkite.com/v2"

    def __init__(self, api_token: str, timeout: float = 30.0):
        if not api_token:
            raise ValueError("API token is required")
        self.api_token = api_token
        self.timeout = timeout

    @staticmethod
    def validate_params(org: str, pipeline: str, build: str, job: str) -> None:
        # buildkite_api.go:71-92 — each parameter required, checked in order.
        for name, val in (
            ("organization", org),
            ("pipeline", pipeline),
            ("build", build),
            ("job", job),
        ):
            if not val:
                raise ValueError(f"{name} is required")

    def log_url(self, org: str, pipeline: str, build: str, job: str) -> str:
        return (
            f"{self.BASE}/organizations/{org}/pipelines/{pipeline}"
            f"/builds/{build}/jobs/{job}/log"
        )

    def _urlopen(self, url: str):
        import urllib.request

        req = urllib.request.Request(
            url,
            headers={
                "Authorization": f"Bearer {self.api_token}",
                "Accept": "text/plain",
                "User-Agent": "buildkite-logs-parquet-spark/0.1",
            },
        )
        return urllib.request.urlopen(req, timeout=self.timeout)

    def fetch_job_log(
        self, org: str, pipeline: str, build: str, job: str, spool_dir: str | None = None
    ) -> str:
        """Fetch the raw log to a local spool file; returns the path."""
        self.validate_params(org, pipeline, build, job)
        url = self.log_url(org, pipeline, build, job)
        with self._urlopen(url) as resp:
            status = getattr(resp, "status", 200)
            if status != 200:
                raise RuntimeError(f"API request failed with status {status}")
            fd, spath = tempfile.mkstemp(
                suffix=".log", prefix="bk_job_", dir=spool_dir
            )
            with os.fdopen(fd, "wb") as out:
                while True:
                    chunk = resp.read(1 << 20)
                    if not chunk:
                        break
                    out.write(chunk)
        return spath

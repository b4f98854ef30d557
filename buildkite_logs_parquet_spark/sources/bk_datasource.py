"""Buildkite job logs as a native Spark DATA SOURCE (Spark 4 Python
DataSource API): ``spark.read.format("buildkite_log")``.

The reference client (buildkite_api.go:21-92) streams ONE job log over
HTTP on the caller's thread; ``BuildkiteAPIClient`` mirrors that as a
driver-side spool.  This module is the *distributed* form: each requested
job becomes an input partition, and the fetch runs ON THE EXECUTOR that
owns the partition — N jobs download and line-split in parallel, with no
driver spool and no single-machine bandwidth ceiling.  That is the shape
a 1000-executor backfill over an organization's build history needs.

Output schema matches ``read_log_lines`` — ``(file, line_no, raw)`` with
0-based per-job line numbers and bufio.ScanLines parity (``\n`` split,
one trailing ``\r`` stripped) — so ``parse_log_lines`` composes
unchanged.

Options:

==================  =====================================================
``token``           API token (required; sent as Bearer auth)
``organization``    org slug (required)
``pipeline``        pipeline slug (required)
``build``           build number (required)
``jobs``            comma-separated job ids (required; one partition each)
``base_url``        API base override — tests point this at ``file://``
                    fixtures so the partition reader runs without network
==================  =====================================================
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

DEFAULT_BASE = "https://api.buildkite.com/v2"


class JobLogPartition(InputPartition):
    def __init__(self, url: str, label: str):
        self.url = url
        self.label = label


class BuildkiteLogDataSource(DataSource):
    """``spark.dataSource.register(BuildkiteLogDataSource)`` then
    ``spark.read.format("buildkite_log").options(...).load()``."""

    @classmethod
    def name(cls) -> str:
        return "buildkite_log"

    def schema(self) -> str:
        return "file string, line_no bigint, raw string"

    def reader(self, schema) -> "BuildkiteLogReader":
        return BuildkiteLogReader(self.options)


class BuildkiteLogReader(DataSourceReader):
    def __init__(self, options: dict):
        self.token = options.get("token", "")
        self.base = options.get("base_url", DEFAULT_BASE).rstrip("/")
        self.timeout = float(options.get("timeout", "30"))
        required = ("organization", "pipeline", "build", "jobs")
        for name in required:
            if not options.get(name):
                raise ValueError(f"{name} is required")
        if not self.token and self.base.startswith("http"):
            raise ValueError("token is required")
        self.org = options["organization"]
        self.pipeline = options["pipeline"]
        self.build = options["build"]
        self.jobs = [j.strip() for j in options["jobs"].split(",") if j.strip()]
        if not self.jobs:
            raise ValueError("jobs is required")

    def partitions(self):
        out = []
        for job in self.jobs:
            url = (
                f"{self.base}/organizations/{self.org}/pipelines/"
                f"{self.pipeline}/builds/{self.build}/jobs/{job}/log"
            )
            label = f"bk://{self.org}/{self.pipeline}/{self.build}/{job}"
            out.append(JobLogPartition(url, label))
        return out

    def read(self, partition: JobLogPartition):
        # runs on the executor: stream the body, split with ScanLines
        # parity (\n separator, one trailing \r stripped per line)
        import urllib.request

        req = urllib.request.Request(
            partition.url,
            headers={
                "Authorization": f"Bearer {self.token}",
                "Accept": "text/plain",
                "User-Agent": "buildkite-logs-parquet-spark/0.1",
            },
        )
        with urllib.request.urlopen(req, timeout=self.timeout) as resp:
            status = getattr(resp, "status", 200)
            if status and status != 200:
                raise RuntimeError(
                    f"API request failed with status {status} for {partition.url}"
                )
            body = resp.read()
        text = body.decode("utf-8", errors="replace")
        if text.endswith("\n"):
            text = text[:-1]
        if text:
            for i, line in enumerate(text.split("\n")):
                if line.endswith("\r"):
                    line = line[:-1]
                yield (partition.label, i, line)


def register(spark) -> None:
    """Register the data source on this session (idempotent)."""
    spark.dataSource.register(BuildkiteLogDataSource)

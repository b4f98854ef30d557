"""WebDataset tar shard sink/reader (sources/webdataset.py):
round-trip fidelity, deterministic bytes, shard-membership stability,
and stdlib-tar compatibility."""

from __future__ import annotations

import hashlib
import os
import tarfile

import pytest
from pyspark.sql import functions as F

from buildkite_logs_parquet_spark.sources.webdataset import (
    read_webdataset,
    write_webdataset_shards,
)


def _samples(spark, n=40):
    return spark.range(n).select(
        F.concat(F.lit("doc"), F.col("id")).alias("sample_id"),
        F.encode(F.concat(F.lit("payload-"), F.col("id")), "utf-8").alias(
            "payload"
        ),
        F.concat(F.lit('{"id":'), F.col("id"), F.lit("}")).alias("meta"),
    )


CONTENT = {"payload": "bin", "meta": "json"}


class TestWriteRead:
    def test_round_trip_multiset(self, spark, tmp_path):
        root = str(tmp_path / "wds")
        manifest = write_webdataset_shards(
            _samples(spark), root, "sample_id", CONTENT, n_shards=4
        )
        m = {r["shard"]: r for r in manifest.collect()}
        assert sum(r["n_samples"] for r in m.values()) == 40
        back = read_webdataset(spark, root)
        rows = back.collect()
        assert len(rows) == 80  # two members per sample
        got = {
            (r["key"], r["ext"]): bytes(r["content"]) for r in rows
        }
        for i in range(40):
            assert got[(f"doc{i}", "bin")] == f"payload-{i}".encode()
            assert got[(f"doc{i}", "json")] == b'{"id":%d}' % i

    def test_deterministic_bytes_across_rebuilds(self, spark, tmp_path):
        r1, r2 = str(tmp_path / "a"), str(tmp_path / "b")
        df = _samples(spark)
        m1 = {
            r["shard"]: r["digest"]
            for r in write_webdataset_shards(
                df, r1, "sample_id", CONTENT, n_shards=3
            ).collect()
        }
        # second export from a differently-partitioned frame
        m2 = {
            r["shard"]: r["digest"]
            for r in write_webdataset_shards(
                df.repartition(7), r2, "sample_id", CONTENT, n_shards=3
            ).collect()
        }
        assert m1 == m2
        for s in m1:
            p1 = os.path.join(r1, f"shard-{s:05d}.tar")
            with open(p1, "rb") as f:
                assert hashlib.md5(f.read()).hexdigest() == m1[s]

    def test_shard_membership_stable_under_growth(self, spark, tmp_path):
        # a sample's shard is a pure content hash: adding rows must not
        # move existing samples between shards
        small = write_webdataset_shards(
            _samples(spark, 20), str(tmp_path / "s"), "sample_id", CONTENT, 4
        )
        big = write_webdataset_shards(
            _samples(spark, 40), str(tmp_path / "g"), "sample_id", CONTENT, 4
        )
        where_small = {
            r["key"]: r["shard"]
            for r in read_webdataset(spark, str(tmp_path / "s")).collect()
        }
        where_big = {
            r["key"]: r["shard"]
            for r in read_webdataset(spark, str(tmp_path / "g")).collect()
        }
        for k, s in where_small.items():
            assert where_big[k] == s
        assert small.count() and big.count()

    def test_null_content_skips_member_null_key_skips_sample(self, spark, tmp_path):
        df = spark.createDataFrame(
            [("a", b"x", '{"k":1}'), ("b", None, '{"k":2}'), (None, b"z", "{}")],
            "sample_id string, payload binary, meta string",
        )
        root = str(tmp_path / "wds")
        manifest = write_webdataset_shards(
            df, root, "sample_id", CONTENT, n_shards=1
        )
        assert manifest.collect()[0]["n_samples"] == 2
        got = {
            (r["key"], r["ext"])
            for r in read_webdataset(spark, root).collect()
        }
        assert got == {("a", "bin"), ("a", "json"), ("b", "json")}

    def test_plain_stdlib_tar_reads_the_shards(self, spark, tmp_path):
        root = str(tmp_path / "wds")
        write_webdataset_shards(
            _samples(spark, 8), root, "sample_id", CONTENT, n_shards=1
        )
        with tarfile.open(os.path.join(root, "shard-00000.tar")) as tar:
            names = tar.getnames()
            assert all(n.endswith((".bin", ".json")) for n in names)
            infos = tar.getmembers()
            assert all(
                i.mtime == 0 and i.uid == 0 and i.mode == 0o644 for i in infos
            )

    def test_validation_errors(self, spark, tmp_path):
        df = _samples(spark, 2)
        with pytest.raises(ValueError):
            write_webdataset_shards(df, str(tmp_path), "sample_id", {}, 1)
        with pytest.raises(ValueError):
            write_webdataset_shards(df, str(tmp_path), "sample_id", CONTENT, 0)
        with pytest.raises(FileNotFoundError):
            read_webdataset(spark, str(tmp_path / "missing"))

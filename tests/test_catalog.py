"""Versioned corpus catalog: atomic publish, pinned reads, rollback,
snapshot-diff composition."""

import os

import pytest
from pyspark.sql import functions as F

from buildkite_logs_parquet_spark.sources.catalog import (
    current_version,
    publish_version,
    read_version,
    rollback,
)


def _corpus(spark, tag, n=20):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit(f"{tag} text "), F.col("id")).alias("text"),
    )


def test_publish_read_latest_and_pinned(spark, tmp_path):
    root = str(tmp_path / "corpus")
    v1 = publish_version(_corpus(spark, "alpha"), root)
    v2 = publish_version(_corpus(spark, "beta", n=25), root)
    assert (v1, v2) == (1, 2)
    assert current_version(root) == 2
    assert read_version(spark, root).count() == 25
    pinned = read_version(spark, root, version=1)
    assert pinned.count() == 20
    assert pinned.first()["text"].startswith("alpha")


def test_rollback_moves_pointer_only(spark, tmp_path):
    root = str(tmp_path / "corpus")
    publish_version(_corpus(spark, "alpha"), root)
    publish_version(_corpus(spark, "beta"), root)
    rollback(root, 1)
    assert current_version(root) == 1
    assert read_version(spark, root).first()["text"].startswith("alpha")
    # both data dirs still on disk, immutable
    assert sorted(
        d for d in os.listdir(root) if d.startswith("v=")
    ) == ["v=1", "v=2"]
    # publishing after rollback continues the version sequence
    assert publish_version(_corpus(spark, "gamma"), root) == 3


def test_empty_and_missing_versions(spark, tmp_path):
    root = str(tmp_path / "corpus")
    with pytest.raises(FileNotFoundError):
        read_version(spark, root)
    publish_version(_corpus(spark, "a"), root)
    with pytest.raises(ValueError):
        read_version(spark, root, version=9)
    with pytest.raises(ValueError):
        rollback(root, 9)


def test_no_torn_version_visible(spark, tmp_path):
    """Staging litter must never be readable as a version."""
    root = str(tmp_path / "corpus")
    publish_version(_corpus(spark, "a"), root)
    (tmp_path / "corpus" / "_tmp-deadbeef").mkdir()
    assert current_version(root) == 1
    assert read_version(spark, root).count() == 20


def test_diff_between_versions(spark, tmp_path):
    from buildkite_logs_parquet_spark.operators.profiling import (
        snapshot_diff,
    )

    root = str(tmp_path / "corpus")
    publish_version(_corpus(spark, "same"), root)
    nxt = _corpus(spark, "same", n=21).where("doc_id != 3")
    publish_version(nxt, root)
    d = snapshot_diff(
        read_version(spark, root, 1),
        read_version(spark, root, 2),
        key_cols=["doc_id"],
    )
    changes = {r["doc_id"]: r["change"] for r in d.collect()}
    assert changes[3] == "removed" and changes[20] == "added"

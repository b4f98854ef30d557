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


def test_publish_retries_when_losing_the_version_race(spark, tmp_path):
    """Two concurrent publishers may compute the same next version; the
    rename loser must re-read the list and claim the next free number
    without rewriting its parquet staging data."""
    import os

    import buildkite_logs_parquet_spark.sources.catalog as C

    root = str(tmp_path / "cat")
    C.publish_version(spark.range(3), root)

    real_rename = os.rename
    state = {"raced": False}

    def racing_rename(src, dst):
        if not state["raced"] and os.sep + "v=" in dst:
            state["raced"] = True
            # competitor wins v=2 between our list and our rename —
            # exactly what a concurrent publish_version produces
            os.makedirs(os.path.join(dst, "part-0"))
            raise OSError(39, "Directory not empty", dst)
        return real_rename(src, dst)

    C.os.rename = racing_rename
    try:
        n = C.publish_version(spark.range(4), root)
    finally:
        C.os.rename = real_rename
    assert n == 3  # v=2 went to the competitor
    assert C.current_version(root) == 3
    assert C.read_version(spark, root, 3).count() == 4
    # no _tmp litter left behind on the success path
    assert not [d for d in os.listdir(root) if d.startswith("_tmp-")]


def test_publish_reraises_non_race_errors_immediately(spark, tmp_path):
    """EXDEV/EACCES-class rename failures are persistent, not races:
    retrying the identical rename 16 times and reporting 'could not
    claim a version number' would bury the real errno."""
    import errno
    import os

    import pytest

    import buildkite_logs_parquet_spark.sources.catalog as C

    root = str(tmp_path / "cat")
    real_rename = os.rename
    calls = {"n": 0}

    def exdev_rename(src, dst):
        if os.sep + "v=" in dst:
            calls["n"] += 1
            raise OSError(errno.EXDEV, "Invalid cross-device link", dst)
        return real_rename(src, dst)

    C.os.rename = exdev_rename
    try:
        with pytest.raises(OSError) as exc_info:
            C.publish_version(spark.range(2), root)
    finally:
        C.os.rename = real_rename
    assert exc_info.value.errno == errno.EXDEV  # the REAL error surfaced
    assert calls["n"] == 1  # no doomed retries


def test_pointer_never_moves_backward_without_force(spark, tmp_path):
    """Round-7 race fix: two publishers rename v=5 then v=6 but their
    pointer writes can interleave the other way — the stale _point must
    not roll LATEST backward.  rollback() still forces it."""
    from buildkite_logs_parquet_spark.sources import catalog as C

    root = str(tmp_path / "cat")
    publish_version(_corpus(spark, "a"), root)
    publish_version(_corpus(spark, "b"), root)
    assert C.current_version(root) == 2
    # the straggler's pointer write arrives late: must be a no-op
    C._point(root, 1)
    assert C.current_version(root) == 2
    # rollback is the sanctioned backward move
    C.rollback(root, 1)
    assert C.current_version(root) == 1
    # and a newer publish advances past it again
    assert publish_version(_corpus(spark, "c"), root) == 3
    assert C.current_version(root) == 3


def test_stale_pointer_lock_is_broken(spark, tmp_path, monkeypatch):
    """A lock file left by a crashed publisher must not wedge the
    catalog: _point breaks locks older than _LOCK_STALE_S."""
    from buildkite_logs_parquet_spark.sources import catalog as C

    root = str(tmp_path / "cat")
    publish_version(_corpus(spark, "a"), root)
    lock = os.path.join(root, "LATEST.lock")
    with open(lock, "w"):
        pass
    old = os.path.getmtime(lock) - C._LOCK_STALE_S - 5
    os.utime(lock, (old, old))
    C._point(root, 1, force=True)  # must break the stale lock, not hang
    assert C.current_version(root) == 1
    assert not os.path.exists(lock)


def test_live_lock_times_out_instead_of_hanging(spark, tmp_path, monkeypatch):
    from buildkite_logs_parquet_spark.sources import catalog as C

    root = str(tmp_path / "cat")
    publish_version(_corpus(spark, "a"), root)
    with open(os.path.join(root, "LATEST.lock"), "w"):
        pass
    monkeypatch.setattr(C, "_LOCK_TIMEOUT_S", 0.2)
    monkeypatch.setattr(C, "_LOCK_STALE_S", 3600.0)
    with pytest.raises(TimeoutError):
        C._point(root, 1, force=True)

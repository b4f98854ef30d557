"""Versioned corpus catalog: atomic publish / pinned reads / rollback.

Training pipelines need dataset VERSIONS, not directories: a corpus
rebuild must become visible atomically (a trainer must never read a
half-written drop), old versions must stay readable (reproducing a run
means re-reading the exact bytes it trained on), and a bad rebuild must
roll back without deleting anything.  This module is the minimal
file-layout realization of that contract, composing with the existing
``operators/profiling.snapshot_diff`` (what changed between versions)
and ``packing.write_training_shards`` (per-shard manifests within one
version).

Layout under ``root``::

    v=1/, v=2/, …      immutable version directories (parquet)
    LATEST             text file holding the current version number

Atomicity model (local/HDFS rename semantics): data is written to a
``_tmp-*`` staging directory first and ``os.replace``/renamed to
``v=N`` only when complete, so ``v=N`` either exists fully or not at
all; ``LATEST`` is swapped with an atomic replace, so a reader sees
either the old or the new pointer, never a torn one.  On object stores
without atomic rename, pair this layout with the store's committer —
the CONTRACT (immutable versions + pointer swap) is what carries over.

Version directories are never mutated or deleted by this module;
``rollback`` only moves the pointer.
"""

from __future__ import annotations

import os
import re
import uuid

from pyspark.sql import DataFrame, SparkSession

_VERSION_RE = re.compile(r"^v=(\d+)$")


def _versions(root: str) -> list[int]:
    try:
        names = os.listdir(root)
    except FileNotFoundError:
        return []
    out = []
    for n in names:
        m = _VERSION_RE.match(n)
        if m:
            out.append(int(m.group(1)))
    return sorted(out)


def current_version(root: str) -> int | None:
    """The pointer's version, or None for an empty catalog."""
    try:
        with open(os.path.join(root, "LATEST")) as f:
            return int(f.read().strip())
    except FileNotFoundError:
        return None


def publish_version(df: DataFrame, root: str) -> int:
    """Write ``df`` as the next version and atomically point LATEST at
    it.  Returns the new version number.  The data lands in a staging
    directory first — a crash mid-write leaves only ``_tmp-*`` litter,
    never a readable half-version."""
    os.makedirs(root, exist_ok=True)
    n = (max(_versions(root), default=0)) + 1
    staging = os.path.join(root, f"_tmp-{uuid.uuid4().hex}")
    df.write.mode("errorifexists").parquet(staging)
    final = os.path.join(root, f"v={n}")
    os.rename(staging, final)
    _point(root, n)
    return n


def _point(root: str, n: int) -> None:
    tmp = os.path.join(root, f"_ptr-{uuid.uuid4().hex}")
    with open(tmp, "w") as f:
        f.write(str(n))
    os.replace(tmp, os.path.join(root, "LATEST"))


def read_version(
    spark: SparkSession, root: str, version: int | None = None
) -> DataFrame:
    """Read the pinned ``version``, or the LATEST pointer's target.
    Raises ``FileNotFoundError`` for an empty catalog and ValueError
    for a version that never existed."""
    if version is None:
        version = current_version(root)
        if version is None:
            raise FileNotFoundError(f"empty catalog: {root}")
    if version not in _versions(root):
        raise ValueError(f"no such version v={version} under {root}")
    return spark.read.parquet(os.path.join(root, f"v={version}"))


def rollback(root: str, to_version: int) -> None:
    """Point LATEST at an existing older version.  Data directories are
    untouched — roll forward again by publishing or re-pointing."""
    if to_version not in _versions(root):
        raise ValueError(f"no such version v={to_version} under {root}")
    _point(root, to_version)

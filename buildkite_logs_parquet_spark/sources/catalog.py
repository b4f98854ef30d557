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

Atomicity model — LOCAL FILESYSTEM PATHS ONLY: the catalog's own
metadata operations (listing, staging rename, pointer swap) go through
``os.listdir``/``os.rename``/``os.replace``, so ``root`` must be a
path the DRIVER can reach as a mounted POSIX filesystem (local disk,
NFS, a FUSE mount).  The parquet payload itself is written by Spark
and may target any Hadoop-visible URI, but a catalog root like
``hdfs://`` or ``s3://`` will fail at the metadata step — route those
through the Hadoop FileSystem API or the store's committer instead.
What carries over to any store is the CONTRACT: immutable version
directories + an atomically swapped pointer.

Concurrent publishers are safe on POSIX semantics: each writes its own
``_tmp-*`` staging directory, and ``os.rename`` onto an existing
non-empty ``v=N`` fails atomically, so exactly one publisher wins each
version number; the loser retries with the next free number.  The
LATEST pointer update is MONOTONIC (round 7): a publisher whose rename
won v=5 but whose pointer write lands after v=6's cannot roll LATEST
backward — ``_point`` read-compare-writes under a short ``LATEST.lock``
(O_EXCL; stale locks from crashed holders break after 30s; only
``rollback`` forces a backward move).

Version directories are never mutated or deleted by this module;
``rollback`` only moves the pointer.

Object-store roots (round 8): the pointer update — the one step whose
O_EXCL/rename semantics an object store cannot provide — is pluggable.
Pass ``pointer_store=`` (``sources/pointer_store.py``) to
``publish_version``/``rollback`` and LATEST advances via CONDITIONAL
PUT (S3 If-Match / GCS ifGenerationMatch / Azure ETag) with the same
monotonic contract, no lock file.  The version-number claim itself
still needs an atomic namespace (rename on POSIX; on a real object
store the marker-object create-if-absent plays that role — same
primitive, implemented by the deployment's backend).
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


def publish_version(
    df: DataFrame,
    root: str,
    max_attempts: int = 16,
    pointer_store=None,
) -> int:
    """Write ``df`` as the next version and atomically point LATEST at
    it.  Returns the new version number.  The data lands in a staging
    directory first — a crash mid-write leaves only ``_tmp-*`` litter,
    never a readable half-version.

    Race-safe against concurrent publishers (module docstring): if two
    publishers compute the same next number, the second ``os.rename``
    onto the now-existing ``v=N`` fails atomically; the loser re-reads
    the version list and claims the next free number — the expensive
    parquet write is NOT repeated, only the rename."""
    os.makedirs(root, exist_ok=True)
    staging = os.path.join(root, f"_tmp-{uuid.uuid4().hex}")
    df.write.mode("errorifexists").parquet(staging)
    import errno as _errno

    last_err: OSError | None = None
    for _ in range(max_attempts):
        n = (max(_versions(root), default=0)) + 1
        final = os.path.join(root, f"v={n}")
        try:
            os.rename(staging, final)
        except OSError as exc:
            # only EEXIST/ENOTEMPTY mean "lost the race for v=N" (the
            # competitor's directory now occupies the target).  Anything
            # else — EXDEV (staging on a different filesystem than
            # root), EACCES, ENOENT — is a persistent failure that no
            # retry can fix: re-raise it immediately with the real errno
            # instead of burning attempts on the identical doomed rename
            if exc.errno not in (_errno.EEXIST, _errno.ENOTEMPTY):
                raise
            last_err = exc
            continue
        if pointer_store is not None:
            # object-store deployments: the LATEST pointer advances via
            # conditional put (pointer_store.advance_pointer) instead of
            # the local O_EXCL lock — same monotonic contract, no lock
            # file (sources/pointer_store.py)
            from buildkite_logs_parquet_spark.sources.pointer_store import (
                advance_pointer,
            )

            advance_pointer(pointer_store, n)
        else:
            _point(root, n)
        return n
    raise RuntimeError(
        f"publish_version: could not claim a version number under {root} "
        f"after {max_attempts} attempts (last: {last_err}); staging data "
        f"is intact at {staging}"
    )


def _point(root: str, n: int, force: bool = False) -> None:
    """Update the LATEST pointer.  Monotonic by default: without
    ``force``, the pointer only ADVANCES — when two publishers' renames
    land as v=5 then v=6 but their pointer writes interleave the other
    way, the stale ``_point(5)`` must not roll LATEST backward past the
    already-published v=6 (the round-5/6 advisory race).  The
    read-compare-write runs under a short O_EXCL lock file; a lock left
    by a crashed publisher is broken after ``_LOCK_STALE_S``.  ``force``
    is for :func:`rollback`, where going backward is the point.

    Local-FS semantics (O_EXCL, rename) — an object-store catalog needs
    a real coordinator instead of this file lock."""
    import time as _time

    lock = os.path.join(root, "LATEST.lock")
    deadline = _time.monotonic() + _LOCK_TIMEOUT_S
    while True:
        try:
            fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            os.close(fd)
            break
        except FileExistsError:
            try:
                if _time.time() - os.path.getmtime(lock) > _LOCK_STALE_S:
                    os.unlink(lock)  # crashed holder; next loop reclaims
                    continue
            except FileNotFoundError:
                continue  # holder released between open and stat
            if _time.monotonic() > deadline:
                raise TimeoutError(
                    f"could not acquire {lock} within {_LOCK_TIMEOUT_S}s"
                )
            _time.sleep(0.01)
    try:
        cur = current_version(root)
        if force or cur is None or n > cur:
            tmp = os.path.join(root, f"_ptr-{uuid.uuid4().hex}")
            with open(tmp, "w") as f:
                f.write(str(n))
            os.replace(tmp, os.path.join(root, "LATEST"))
    finally:
        try:
            os.unlink(lock)
        except FileNotFoundError:
            pass


_LOCK_TIMEOUT_S = 10.0
_LOCK_STALE_S = 30.0


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


def rollback(root: str, to_version: int, pointer_store=None) -> None:
    """Point LATEST at an existing older version.  Data directories are
    untouched — roll forward again by publishing or re-pointing."""
    if to_version not in _versions(root):
        raise ValueError(f"no such version v={to_version} under {root}")
    if pointer_store is not None:
        from buildkite_logs_parquet_spark.sources.pointer_store import (
            advance_pointer,
        )

        advance_pointer(pointer_store, to_version, force=True)
    else:
        _point(root, to_version, force=True)


def scd2_init(
    snapshot: DataFrame, key_col: str, ts_col: str
) -> DataFrame:
    """Bootstrap an SCD2 (type-2 slowly-changing-dimension) history from
    a first snapshot: every row becomes an OPEN version —
    ``valid_from = ts``, ``valid_to = NULL``, ``is_current = true``."""
    from pyspark.sql import functions as F

    return snapshot.select(
        *[c for c in snapshot.columns if c != ts_col],
        F.col(ts_col).cast("long").alias("valid_from"),
        F.lit(None).cast("long").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )


def scd2_merge(
    history: DataFrame,
    updates: DataFrame,
    key_col: str,
    attr_cols: list[str],
    ts_col: str,
) -> DataFrame:
    """Merge an update batch into an SCD2 history: rows whose tracked
    attributes CHANGED close their open version (``valid_to`` = the
    update's timestamp) and append a new open one; brand-new keys append
    an open version; byte-identical updates are no-ops (no churn
    versions).  Closed history rows pass through untouched — the output
    is the full new history, ready for :func:`publish_version` (each
    merge is one immutable catalog version; time travel = pinned reads).

    Batch contract: ONE update row per key per merge — duplicate keys
    collapse deterministically to the latest ``(ts, attrs)`` (rule-6
    total order) first, so replayed/unioned feeds cannot fork a key's
    history.  NULL-safe attribute comparison (``eqNullSafe`` per
    column): NULL → value and value → NULL both count as changes.

    100 TB shape: the open slice joins the (collapsed) batch once on the
    key — partial-aggregated collapse, one key-keyed shuffle join, two
    narrow unions.  History stays append-only; no window over the full
    history, so a hot key's long past costs nothing per merge.
    """
    from pyspark.sql import functions as F

    out_cols = [key_col, *attr_cols, "valid_from", "valid_to", "is_current"]
    # collapse the batch: latest (ts, attrs...) per key, total order
    ts = F.col(ts_col).cast("long")
    packed = F.struct(
        ts.alias("_ts"), *[F.col(c).alias(c) for c in attr_cols]
    )
    batch = (
        updates.groupBy(F.col(key_col))
        .agg(F.max(packed).alias("_u"))
        .select(
            key_col,
            F.col("_u._ts").alias("_ts"),
            *[F.col(f"_u.{c}").alias(c) for c in attr_cols],
        )
    )
    closed = history.where(~F.col("is_current")).select(*out_cols)
    open_ = history.where(F.col("is_current"))
    j = open_.alias("h").join(
        batch.alias("u"), on=F.col(f"h.{key_col}") == F.col(f"u.{key_col}"),
        how="full",
    )
    same = None
    for c in attr_cols:
        eq = F.col(f"h.{c}").eqNullSafe(F.col(f"u.{c}"))
        same = eq if same is None else (same & eq)
    has_h = F.col(f"h.{key_col}").isNotNull()
    has_u = F.col(f"u.{key_col}").isNotNull()
    # surviving open rows: no update for the key, or a no-op update
    keep_open = j.where(has_h & (~has_u | same)).select(
        *[F.col(f"h.{c}").alias(c) for c in out_cols]
    )
    # closed by this batch: attrs changed
    close_now = j.where(has_h & has_u & ~same).select(
        F.col(f"h.{key_col}").alias(key_col),
        *[F.col(f"h.{c}").alias(c) for c in attr_cols],
        F.col("h.valid_from").alias("valid_from"),
        F.col("u._ts").alias("valid_to"),
        F.lit(False).alias("is_current"),
    )
    # new open versions: changed keys + brand-new keys
    open_now = j.where(has_u & (~has_h | ~same)).select(
        F.col(f"u.{key_col}").alias(key_col),
        *[F.col(f"u.{c}").alias(c) for c in attr_cols],
        F.col("u._ts").alias("valid_from"),
        F.lit(None).cast("long").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    return (
        closed.unionByName(keep_open)
        .unionByName(close_now)
        .unionByName(open_now)
    )


def scd2_as_of(history: DataFrame, ts: int) -> DataFrame:
    """Point-in-time view: the attribute version live at ``ts``
    (``valid_from <= ts < valid_to``, open rows unbounded above)."""
    from pyspark.sql import functions as F

    return history.where(
        (F.col("valid_from") <= int(ts))
        & (F.col("valid_to").isNull() | (F.col("valid_to") > int(ts)))
    ).drop("is_current")


def publish_tables(
    dfs: dict[str, DataFrame],
    root: str,
    max_attempts: int = 16,
    pointer_store=None,
) -> int:
    """Atomically publish SEVERAL tables as ONE catalog version: every
    table lands under ``v=N/<table>/`` via a single staging-directory
    rename, so readers see either the whole snapshot or none of it — a
    trainer must never join table A from v=5 against table B from v=6
    (the cross-table consistency single-table versioning cannot give).

    Each version carries a ``_MANIFEST`` (one line per table:
    ``<name>\\t<n_rows>``) computed by READING BACK the staged files —
    it certifies the bytes, not the plans.  Table names are restricted
    to ``[A-Za-z0-9_]`` (they become path components).  The version
    claim and pointer update reuse :func:`publish_version`'s
    rename-retry and the monotonic locked ``_point``."""
    import errno as _errno

    if not dfs:
        raise ValueError("publish_tables needs at least one table")
    for name in dfs:
        if not re.fullmatch(r"[A-Za-z0-9_]+", name):
            raise ValueError(f"bad table name {name!r}")
    os.makedirs(root, exist_ok=True)
    staging = os.path.join(root, f"_tmp-{uuid.uuid4().hex}")
    spark = next(iter(dfs.values())).sparkSession
    counts = {}
    for name, df in dfs.items():
        path = os.path.join(staging, name)
        df.write.mode("errorifexists").parquet(path)
        counts[name] = spark.read.parquet(path).count()
    with open(os.path.join(staging, "_MANIFEST"), "w") as f:
        for name in sorted(counts):
            f.write(f"{name}\t{counts[name]}\n")
    last_err: OSError | None = None
    for _ in range(max_attempts):
        n = (max(_versions(root), default=0)) + 1
        final = os.path.join(root, f"v={n}")
        try:
            os.rename(staging, final)
        except OSError as exc:
            if exc.errno not in (_errno.EEXIST, _errno.ENOTEMPTY):
                raise
            last_err = exc
            continue
        if pointer_store is not None:
            # object-store deployments: the LATEST pointer advances via
            # conditional put (pointer_store.advance_pointer) instead of
            # the local O_EXCL lock — same monotonic contract, no lock
            # file (sources/pointer_store.py)
            from buildkite_logs_parquet_spark.sources.pointer_store import (
                advance_pointer,
            )

            advance_pointer(pointer_store, n)
        else:
            _point(root, n)
        return n
    raise RuntimeError(
        f"publish_tables: could not claim a version under {root} after "
        f"{max_attempts} attempts (last: {last_err}); staging intact at "
        f"{staging}"
    )


def read_table(
    spark: SparkSession, root: str, table: str, version: int | None = None
) -> DataFrame:
    """Read one table of a multi-table version (LATEST by default)."""
    if version is None:
        version = current_version(root)
        if version is None:
            raise FileNotFoundError(f"empty catalog: {root}")
    if version not in _versions(root):
        raise ValueError(f"no such version v={version} under {root}")
    path = os.path.join(root, f"v={version}", table)
    if not os.path.isdir(path):
        raise ValueError(f"version v={version} has no table {table!r}")
    return spark.read.parquet(path)


def version_manifest(root: str, version: int | None = None) -> dict[str, int]:
    """The certified per-table row counts of a multi-table version."""
    if version is None:
        version = current_version(root)
        if version is None:
            raise FileNotFoundError(f"empty catalog: {root}")
    path = os.path.join(root, f"v={version}", "_MANIFEST")
    out: dict[str, int] = {}
    with open(path) as f:
        for line in f:
            name, n = line.rstrip("\n").split("\t")
            out[name] = int(n)
    return out


def version_diff(
    spark: SparkSession,
    root: str,
    key_cols: list[str],
    from_version: int,
    to_version: int | None = None,
) -> DataFrame:
    """Change-data-capture between two catalog versions: one row per key
    whose presence or content changed, tagged ``change ∈ {'insert',
    'delete', 'update'}`` with both sides' full rows nested as structs
    (``old`` NULL for inserts, ``new`` NULL for deletes).

    The consumer-side complement to :func:`publish_version`'s immutable
    versions: downstream incremental jobs (index refresh, cache
    invalidation, re-embedding queues) read the delta instead of
    re-scanning the snapshot.

    100 TB shape: ONE full-outer join keyed on ``key_cols`` — both sides
    are plain parquet scans (column-pruned if the caller selects off the
    structs), and the change classification is a null-pattern CASE plus
    a null-safe struct comparison; no window, no collect.  Unchanged
    keys drop out via the comparison filter, so the output is
    delta-sized, not snapshot-sized.
    """
    from pyspark.sql import functions as F

    old = read_version(spark, root, from_version)
    new = read_version(spark, root, to_version)
    if set(old.columns) != set(new.columns):
        raise ValueError(
            f"schema mismatch between versions: {sorted(old.columns)} vs "
            f"{sorted(new.columns)} — diff requires a shared column set"
        )
    val_cols = [c for c in old.columns if c not in key_cols]
    o = old.select(
        *[F.col(c).alias(f"_k_{c}") for c in key_cols],
        F.struct(*[F.col(c) for c in old.columns]).alias("old"),
    )
    n = new.select(
        *[F.col(c).alias(f"_k_{c}") for c in key_cols],
        F.struct(*[F.col(c) for c in old.columns]).alias("new"),
    )
    # null-safe equality on the key columns: a NULL-keyed row must match
    # its counterpart across versions, not explode into delete + insert
    keys = [f"_k_{c}" for c in key_cols]
    n = n.select(
        *[F.col(k).alias(f"_kn_{c}") for k, c in zip(keys, key_cols)], "new"
    )
    cond = None
    for c in key_cols:
        eq = F.col(f"_k_{c}").eqNullSafe(F.col(f"_kn_{c}"))
        cond = eq if cond is None else (cond & eq)
    j = o.join(n, on=cond, how="full")
    j = j.select(
        *[
            F.coalesce(F.col(f"_k_{c}"), F.col(f"_kn_{c}")).alias(f"_k_{c}")
            for c in key_cols
        ],
        "old",
        "new",
    )
    same = None
    for c in val_cols:
        eq = F.col(f"old.{c}").eqNullSafe(F.col(f"new.{c}"))
        same = eq if same is None else (same & eq)
    has_o = F.col("old").isNotNull()
    has_n = F.col("new").isNotNull()
    changed = (
        j.where(~(has_o & has_n) | ~(same if same is not None else F.lit(True)))
        if val_cols
        else j.where(~(has_o & has_n))
    )
    return changed.select(
        *[F.col(k).alias(c) for k, c in zip(keys, key_cols)],
        F.when(~has_o, F.lit("insert"))
        .when(~has_n, F.lit("delete"))
        .otherwise(F.lit("update"))
        .alias("change"),
        "old",
        "new",
    )


def version_stats_drift(
    spark: SparkSession,
    root: str,
    from_version: int,
    to_version: int | None = None,
    cat_cols: list[str] | None = None,
    num_cols: list[str] | None = None,
    n_bins: int = 10,
) -> DataFrame:
    """Distribution drift between two catalog VERSIONS — the governance
    companion to :func:`version_diff`: ``version_diff`` answers "which
    rows changed", this answers "did the published DISTRIBUTION shift"
    (language mix, source mix, length profile) using the same PSI
    machinery the crawl audit runs
    (``operators/profiling.py::corpus_drift``).

    The check a catalog publisher gates promotion on: re-pointing LATEST
    to a version whose per-column PSI exceeds policy is how silent
    filter regressions reach training.

    Output: one row per (column, bucket) with both versions' counts,
    shares, and PSI terms (``drift_summary`` rolls it to one row per
    column).  Cost: each version is scanned once into bucket counts —
    the drift math runs on the metadata-sized bucket relation.
    """
    from buildkite_logs_parquet_spark.operators.profiling import corpus_drift

    old = read_version(spark, root, from_version)
    new = read_version(spark, root, to_version)
    return corpus_drift(
        old, new, cat_cols=cat_cols, num_cols=num_cols, n_bins=n_bins
    )

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


class TestSCD2:
    def _hist(self, spark):
        from buildkite_logs_parquet_spark.sources.catalog import scd2_init

        snap = spark.createDataFrame(
            [(1, "en", "src0", 100), (2, "de", "src1", 100)],
            "doc_id long, lang string, source string, ts long",
        )
        return scd2_init(snap, "doc_id", "ts")

    def test_init_opens_every_row(self, spark):
        h = self._hist(spark).collect()
        assert all(r["is_current"] and r["valid_to"] is None for r in h)
        assert all(r["valid_from"] == 100 for r in h)

    def test_merge_changes_closes_and_opens(self, spark):
        from buildkite_logs_parquet_spark.sources.catalog import scd2_merge

        upd = spark.createDataFrame(
            [
                (1, "fr", "src0", 200),   # lang changed
                (2, "de", "src1", 200),   # identical: no-op
                (3, "zh", "src2", 200),   # new key
            ],
            "doc_id long, lang string, source string, ts long",
        )
        h2 = scd2_merge(
            self._hist(spark), upd, "doc_id", ["lang", "source"], "ts"
        )
        rows = {(r["doc_id"], r["is_current"]): r for r in h2.collect()}
        assert len(rows) == 4
        closed = rows[(1, False)]
        assert (closed["lang"], closed["valid_from"], closed["valid_to"]) == (
            "en", 100, 200,
        )
        assert rows[(1, True)]["lang"] == "fr"
        assert rows[(1, True)]["valid_from"] == 200
        assert rows[(2, True)]["valid_from"] == 100  # untouched no-op
        assert rows[(3, True)]["lang"] == "zh"

    def test_duplicate_batch_keys_collapse_to_latest(self, spark):
        from buildkite_logs_parquet_spark.sources.catalog import scd2_merge

        upd = spark.createDataFrame(
            [(1, "it", "src0", 150), (1, "pt", "src0", 250)],
            "doc_id long, lang string, source string, ts long",
        )
        h2 = scd2_merge(
            self._hist(spark), upd, "doc_id", ["lang", "source"], "ts"
        )
        cur = {r["doc_id"]: r for r in h2.where("is_current").collect()}
        assert cur[1]["lang"] == "pt" and cur[1]["valid_from"] == 250

    def test_null_attribute_transitions_count_as_changes(self, spark):
        from buildkite_logs_parquet_spark.sources.catalog import scd2_merge

        upd = spark.createDataFrame(
            [(1, None, "src0", 200)],
            "doc_id long, lang string, source string, ts long",
        )
        h2 = scd2_merge(
            self._hist(spark), upd, "doc_id", ["lang", "source"], "ts"
        )
        one = [r for r in h2.collect() if r["doc_id"] == 1]
        assert {r["is_current"] for r in one} == {True, False}
        assert [r["lang"] for r in one if r["is_current"]] == [None]

    def test_as_of_time_travel_across_two_merges(self, spark):
        from buildkite_logs_parquet_spark.sources.catalog import (
            scd2_as_of,
            scd2_merge,
        )

        h = self._hist(spark)
        upd1 = spark.createDataFrame(
            [(1, "fr", "src0", 200)],
            "doc_id long, lang string, source string, ts long",
        )
        h = scd2_merge(h, upd1, "doc_id", ["lang", "source"], "ts")
        upd2 = spark.createDataFrame(
            [(1, "es", "src0", 300)],
            "doc_id long, lang string, source string, ts long",
        )
        h = scd2_merge(h, upd2, "doc_id", ["lang", "source"], "ts")

        def lang_at(ts):
            rows = scd2_as_of(h, ts).where("doc_id = 1").collect()
            assert len(rows) == 1
            return rows[0]["lang"]

        assert lang_at(100) == "en"
        assert lang_at(250) == "fr"
        assert lang_at(999) == "es"
        # before the epoch: nothing live
        assert scd2_as_of(h, 50).count() == 0

    def test_history_round_trips_through_publish_version(self, spark, tmp_path):
        from buildkite_logs_parquet_spark.sources.catalog import (
            publish_version,
            read_version,
            scd2_merge,
        )

        root = str(tmp_path / "dimcat")
        h = self._hist(spark)
        v1 = publish_version(h, root)
        upd = spark.createDataFrame(
            [(1, "fr", "src0", 200)],
            "doc_id long, lang string, source string, ts long",
        )
        h2 = scd2_merge(
            read_version(spark, root, v1), upd, "doc_id",
            ["lang", "source"], "ts",
        )
        v2 = publish_version(h2, root)
        assert read_version(spark, root, v2).count() == 3
        assert read_version(spark, root, v1).count() == 2  # time travel


class TestMultiTablePublish:
    def test_snapshot_consistency_and_manifest(self, spark, tmp_path):
        from buildkite_logs_parquet_spark.sources.catalog import (
            current_version,
            publish_tables,
            read_table,
            version_manifest,
        )

        root = str(tmp_path / "multicat")
        v1 = publish_tables(
            {"docs": _corpus(spark, "a", n=20), "embs": _corpus(spark, "b", n=7)},
            root,
        )
        assert v1 == 1 and current_version(root) == 1
        assert version_manifest(root) == {"docs": 20, "embs": 7}
        # second snapshot: BOTH tables move together
        v2 = publish_tables(
            {"docs": _corpus(spark, "a2", n=21), "embs": _corpus(spark, "b2", n=8)},
            root,
        )
        assert version_manifest(root, v2) == {"docs": 21, "embs": 8}
        # pinned cross-table read stays consistent
        assert read_table(spark, root, "docs", v1).count() == 20
        assert read_table(spark, root, "embs", v1).count() == 7
        assert read_table(spark, root, "docs").count() == 21

    def test_no_torn_multi_table_version_visible(self, spark, tmp_path):
        import os

        from buildkite_logs_parquet_spark.sources.catalog import (
            _versions,
            publish_tables,
        )

        root = str(tmp_path / "multicat")
        publish_tables({"docs": _corpus(spark, "a")}, root)
        # staging litter never parses as a version
        os.makedirs(os.path.join(root, "_tmp-deadbeef", "docs"))
        assert _versions(root) == [1]

    def test_validation(self, spark, tmp_path):
        from buildkite_logs_parquet_spark.sources.catalog import (
            publish_tables,
            read_table,
        )

        root = str(tmp_path / "multicat")
        with pytest.raises(ValueError):
            publish_tables({}, root)
        with pytest.raises(ValueError):
            publish_tables({"bad/name": _corpus(spark, "a")}, root)
        publish_tables({"docs": _corpus(spark, "a")}, root)
        with pytest.raises(ValueError):
            read_table(spark, root, "nope")


class TestPointerStore:
    """Conditional-put pointer coordination (sources/pointer_store.py) —
    the object-store-safe replacement for the O_EXCL LATEST lock.  The
    memory backend is the reference semantics (token = generation,
    If-Match CAS); the race hook injects exactly the interleavings a
    distributed deployment produces."""

    def test_memory_cas_basics(self):
        from buildkite_logs_parquet_spark.sources.pointer_store import (
            MemoryPointerStore,
            advance_pointer,
        )

        st = MemoryPointerStore()
        assert st.read() == (None, 0)
        assert advance_pointer(st, 3) == 3
        assert st.read()[0] == 3
        # monotonic: a stale publisher's lower n is a no-op
        assert advance_pointer(st, 2) == 3
        assert st.read()[0] == 3
        # force (rollback) moves backward
        assert advance_pointer(st, 2, force=True) == 2
        assert st.read()[0] == 2

    def test_stale_token_loses_and_cas_retry_converges(self):
        """The core race: writer A reads token g, writer B commits first
        (bumping the generation), A's conditional put must FAIL, and
        advance_pointer's re-read retry must converge to max(A, B)."""
        from buildkite_logs_parquet_spark.sources.pointer_store import (
            MemoryPointerStore,
            advance_pointer,
        )

        st = MemoryPointerStore()
        advance_pointer(st, 1)
        # raw CAS with a stale token loses
        _, stale = st.read()
        st.write_if(99, stale)  # bump generation past `stale`...
        assert st.write_if(100, stale) is False  # ...so the replay fails
        # interleaved publishers via the race hook: every time writer A
        # is between read and write, writer B sneaks a commit in —
        # for A's first 3 attempts
        st2 = MemoryPointerStore()
        state = {"sneaks": 0}

        def sneak():
            if state["sneaks"] < 3:
                state["sneaks"] += 1
                hook, st2.race_hook = st2.race_hook, None
                try:
                    cur, tok = st2.read()
                    assert st2.write_if((cur or 0) + 1, tok)
                finally:
                    st2.race_hook = hook

        st2.race_hook = sneak
        final = advance_pointer(st2, 2)
        # B's sneaked commits advanced past 2, or A landed 2 — either
        # way the pointer is >= 2 and equals what advance returned
        assert final >= 2
        assert st2.read()[0] == final

    def test_pointer_never_goes_backward_under_interleaving(self):
        """The round-5/6 advisory race, replayed through CAS: publisher
        of v=5 stalls between read and write while v=6's pointer lands;
        the stale v=5 advance must observe 6 and leave it."""
        from buildkite_logs_parquet_spark.sources.pointer_store import (
            MemoryPointerStore,
            advance_pointer,
        )

        st = MemoryPointerStore()
        fired = {"done": False}

        def land_v6():
            if not fired["done"]:
                fired["done"] = True
                hook, st.race_hook = st.race_hook, None
                try:
                    advance_pointer(st, 6)
                finally:
                    st.race_hook = hook

        st.race_hook = land_v6
        assert advance_pointer(st, 5) == 6
        assert st.read()[0] == 6

    def test_concurrent_threads_converge_to_max(self):
        import threading

        from buildkite_logs_parquet_spark.sources.pointer_store import (
            MemoryPointerStore,
            advance_pointer,
        )

        st = MemoryPointerStore()
        errs = []

        def pub(n):
            try:
                advance_pointer(st, n)
            except Exception as exc:  # noqa: BLE001
                errs.append(exc)

        threads = [
            threading.Thread(target=pub, args=(n,)) for n in range(1, 33)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert errs == []
        assert st.read()[0] == 32

    def test_localfs_backend_same_contract(self, tmp_path):
        from buildkite_logs_parquet_spark.sources.pointer_store import (
            LocalFSPointerStore,
            advance_pointer,
        )

        st = LocalFSPointerStore(str(tmp_path / "LATEST"))
        assert st.read() == (None, 0)
        assert advance_pointer(st, 4) == 4
        assert advance_pointer(st, 3) == 4  # monotonic
        v, tok = st.read()
        assert v == 4
        # stale-token CAS loses on the FS backend too
        assert st.write_if(9, tok) is True
        assert st.write_if(10, tok) is False
        assert st.read()[0] == 9
        # corrupt pointer content is a hard error, never a silent gen-0
        with open(tmp_path / "LATEST", "w") as f:
            f.write("garbage")
        import pytest as _pytest

        with _pytest.raises(RuntimeError, match="corrupt"):
            st.read()

    def test_publish_version_through_store(self, spark, tmp_path):
        """publish_version with pointer_store=: versions land as usual,
        LATEST advances via CAS (no LATEST file, no lock file), reads
        pin through the store's value."""
        from buildkite_logs_parquet_spark.sources import catalog as C
        from buildkite_logs_parquet_spark.sources.pointer_store import (
            MemoryPointerStore,
        )

        root = str(tmp_path / "cat")
        st = MemoryPointerStore()
        df1 = spark.range(3).withColumnRenamed("id", "x")
        df2 = spark.range(5).withColumnRenamed("id", "x")
        assert C.publish_version(df1, root, pointer_store=st) == 1
        assert C.publish_version(df2, root, pointer_store=st) == 2
        assert st.read()[0] == 2
        import os as _os

        assert not _os.path.exists(_os.path.join(root, "LATEST"))
        assert not _os.path.exists(_os.path.join(root, "LATEST.lock"))
        got = C.read_version(spark, root, version=st.read()[0])
        assert got.count() == 5
        C.rollback(root, 1, pointer_store=st)
        assert st.read()[0] == 1
        assert C.read_version(spark, root, version=st.read()[0]).count() == 3


class TestVersionDiff:
    def test_insert_delete_update_classification(self, spark, tmp_path):
        from buildkite_logs_parquet_spark.sources.catalog import (
            publish_version,
            version_diff,
        )

        root = str(tmp_path / "cat")
        v1 = publish_version(
            spark.createDataFrame(
                [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
                "k long, s string, v double",
            ),
            root,
        )
        v2 = publish_version(
            spark.createDataFrame(
                [(2, "b", 20.0), (3, "c2", 30.0), (4, "d", 40.0)],
                "k long, s string, v double",
            ),
            root,
        )
        out = {
            r["k"]: r
            for r in version_diff(spark, root, ["k"], v1, v2).collect()
        }
        assert set(out) == {1, 3, 4}  # key 2 unchanged -> absent
        assert out[1]["change"] == "delete" and out[1]["new"] is None
        assert out[4]["change"] == "insert" and out[4]["old"] is None
        assert out[3]["change"] == "update"
        assert out[3]["old"]["s"] == "c" and out[3]["new"]["s"] == "c2"

    def test_null_transitions_count_as_updates(self, spark, tmp_path):
        from buildkite_logs_parquet_spark.sources.catalog import (
            publish_version,
            version_diff,
        )

        root = str(tmp_path / "cat")
        v1 = publish_version(
            spark.createDataFrame([(1, None), (2, "x")], "k long, s string"),
            root,
        )
        v2 = publish_version(
            spark.createDataFrame([(1, "y"), (2, None)], "k long, s string"),
            root,
        )
        out = {
            r["k"]: r["change"]
            for r in version_diff(spark, root, ["k"], v1, v2).collect()
        }
        assert out == {1: "update", 2: "update"}

    def test_null_key_rows_match_across_versions(self, spark, tmp_path):
        """A NULL-keyed row present in both versions must classify as an
        update (or drop out when unchanged) — not explode into a
        delete + insert pair under plain equi-join semantics."""
        from buildkite_logs_parquet_spark.sources.catalog import (
            publish_version,
            version_diff,
        )

        root = str(tmp_path / "cat")
        v1 = publish_version(
            spark.createDataFrame(
                [(None, "a"), (1, "keep")], "k long, s string"
            ),
            root,
        )
        v2 = publish_version(
            spark.createDataFrame(
                [(None, "b"), (1, "keep")], "k long, s string"
            ),
            root,
        )
        out = version_diff(spark, root, ["k"], v1, v2).collect()
        assert len(out) == 1
        (r,) = out
        assert r["k"] is None and r["change"] == "update"
        assert r["old"]["s"] == "a" and r["new"]["s"] == "b"

    def test_defaults_to_latest_and_rejects_schema_drift(self, spark, tmp_path):
        import pytest as _pytest

        from buildkite_logs_parquet_spark.sources.catalog import (
            publish_version,
            version_diff,
        )

        root = str(tmp_path / "cat")
        v1 = publish_version(
            spark.createDataFrame([(1, "a")], "k long, s string"), root
        )
        publish_version(
            spark.createDataFrame([(1, "b")], "k long, s string"), root
        )
        out = version_diff(spark, root, ["k"], v1).collect()  # to=LATEST
        assert len(out) == 1 and out[0]["change"] == "update"
        publish_version(
            spark.createDataFrame([(1, "b", 2.0)], "k long, s string, x double"),
            root,
        )
        with _pytest.raises(ValueError, match="schema mismatch"):
            version_diff(spark, root, ["k"], v1)


class TestVersionStatsDrift:
    def test_shifted_mix_shows_drift_and_stable_does_not(self, spark, tmp_path):
        from buildkite_logs_parquet_spark.operators.profiling import (
            drift_summary,
        )
        from buildkite_logs_parquet_spark.sources.catalog import (
            publish_version,
            version_stats_drift,
        )

        root = str(tmp_path / "cat")
        base = [("en", 100.0)] * 80 + [("de", 100.0)] * 20
        v1 = publish_version(
            spark.createDataFrame(base, "lang string, score double"), root
        )
        # same mix republished: PSI ~ 0
        v2 = publish_version(
            spark.createDataFrame(base, "lang string, score double"), root
        )
        # language mix flips: PSI large
        shifted = [("en", 100.0)] * 20 + [("de", 100.0)] * 80
        v3 = publish_version(
            spark.createDataFrame(shifted, "lang string, score double"), root
        )
        stable = drift_summary(
            version_stats_drift(spark, root, v1, v2, cat_cols=["lang"])
        ).collect()
        moved = drift_summary(
            version_stats_drift(spark, root, v1, v3, cat_cols=["lang"])
        ).collect()
        psi_stable = {r["column"]: r["psi"] for r in stable}["lang"]
        psi_moved = {r["column"]: r["psi"] for r in moved}["lang"]
        assert abs(psi_stable) < 1e-9
        assert psi_moved > 0.25  # the standard "shifted" threshold

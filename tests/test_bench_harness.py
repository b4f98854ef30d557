"""Guards for bench.py's measurement plumbing (not the timings
themselves): the dedup_keep_best phase plans must stay consistent with
the registered key, and the host-calibration probes must return the
fields cross-round comparisons read.

These exist because bench.py is the round-over-round evidence trail —
a silently-broken phase plan or calibration probe would erase the
attribution instrumentation added for the round-9 verdict #3 drift
question without failing anything."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import bench as B  # noqa: E402

SF = "/root/testdata/sf0.001"


def test_dedup_keep_best_phases_align_with_registered_key(spark):
    phases = B.PHASE_FNS["dedup_keep_best"](spark, SF)
    assert set(phases) == {"pairs_cc", "full"}
    full = phases["full"]
    import __spark_entry__ as E

    registered = E.queries()["dedup_keep_best"](spark, SF)
    # the 'full' phase IS the registered pipeline: same rows, same schema
    assert full.columns == registered.columns
    assert full.count() == registered.count()
    # pairs_cc is the CC stage: (doc_id, cluster) for clustered docs only
    cc = phases["pairs_cc"]
    assert {"doc_id", "cluster"} <= set(cc.columns)
    assert 0 < cc.count() <= full.count()


def test_host_calibration_shape(spark):
    cal = B._host_calibration(
        spark, py_iters=10_000, scan_rows=100_000, shuffle_rows=10_000
    )
    assert set(cal) == {"py_loop_s", "jvm_hash_sum_s", "jvm_shuffle_s"}
    for v in cal.values():
        assert isinstance(v, float) and v >= 0.0

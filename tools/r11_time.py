#!/usr/bin/env python3
"""Round-11 isolated query timing: min-of-N noop-sink walls for the
named queries, bench-identical methodology (cache + persist registry
cleared before EVERY run, so each sample is a cold from-parquet
computation — bench._cold_start), plus the host-calibration probes so
readings on different hosts stay comparable.

Usage: SPARK_GRAFT_SF_DIR=... python tools/r11_time.py q1 [q2 ...]
Env: R11_RUNS (default 3)
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    import bench
    import __spark_entry__ as E
    from buildkite_logs_parquet_spark.session import get_spark

    names = sys.argv[1:]
    runs = int(os.environ.get("R11_RUNS", "3"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="r11-time")
    qs = dict(E.queries())
    qs.update(bench._extra_ops())
    try:
        cal = bench._host_calibration(spark)
    except Exception as exc:  # noqa: BLE001 — advisory
        cal = {"error": str(exc)[:120]}
    out = {}
    for name in names:
        best = None
        samples = []
        for _ in range(runs):
            bench._cold_start(spark, gc)
            t0 = time.monotonic()
            df = qs[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            dt = time.monotonic() - t0
            samples.append(round(dt, 3))
            best = dt if best is None else min(best, dt)
        out[name] = {"min": round(best, 3), "samples": samples}
        print(f"{name}: min={best:.3f} samples={samples}", flush=True)
    print(json.dumps({"calibration": cal, "queries": out}))


if __name__ == "__main__":
    main()

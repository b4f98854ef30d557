#!/usr/bin/env python3
"""Round-11 per-query profile: where does the wall go?

For each named query (bench methodology: cold start before every run)
reports, per run:

- ``build_s``   — Python time to construct the DataFrame (plan build,
  driver-side collects inside the query function included)
- ``exec_s``    — the noop-sink materialization wall
- ``jobs``      — Spark jobs launched during the whole run (build+exec)
- ``stages``/``tasks`` — completed stage/task counts for those jobs

Job/stage counts localize overhead: a 6s query that runs 40 jobs of
tiny data is paying scheduler/barrier latency (guide §2 — remove
shuffles / collapse jobs), not compute.

Usage: SPARK_GRAFT_SF_DIR=... python tools/r11_profile.py q1 [q2 ...]
Env: R11_RUNS (default 2)
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
    runs = int(os.environ.get("R11_RUNS", "2"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="r11-profile")
    sc = spark.sparkContext
    qs = dict(E.queries())
    qs.update(bench._extra_ops())
    out = {}
    for name in names:
        samples = []
        for i in range(runs):
            bench._cold_start(spark, gc)
            group = f"prof-{name}-{i}"
            sc.setJobGroup(group, name)
            tracker = sc.statusTracker()
            t0 = time.monotonic()
            df = qs[name](spark, sf_dir)
            t1 = time.monotonic()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.monotonic()
            sc.setJobGroup(None, None)
            job_ids = tracker.getJobIdsForGroup(group)
            stages = 0
            tasks = 0
            for jid in job_ids:
                ji = tracker.getJobInfo(jid)
                if ji is None:
                    continue
                for sid in ji.stageIds:
                    si = tracker.getStageInfo(sid)
                    if si is None:
                        continue
                    stages += 1
                    tasks += si.numCompletedTasks
            samples.append(
                {
                    "build_s": round(t1 - t0, 3),
                    "exec_s": round(t2 - t1, 3),
                    "total_s": round(t2 - t0, 3),
                    "jobs": len(job_ids),
                    "stages": stages,
                    "tasks": tasks,
                }
            )
        out[name] = samples
        print(f"{name}: {json.dumps(samples)}", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

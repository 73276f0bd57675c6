#!/usr/bin/env python
"""Per-query job/stage/task audit for the bench headline set.

Runs each headline query fresh (undecorated builder) under the exact bench
confs and reports, per query: wall time, number of Spark jobs, stages, and
tasks — via job-group-scoped statusTracker queries.  The bench's fresh
latency at sf0.1 is dominated by the per-job dispatch floor (~87 ms), so
job count is the primary shave target (VERDICT r6 §next-round #1).

Usage: python tools/job_audit.py [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import BENCH_CONFS, HEADLINE  # noqa: E402


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from single_cell_experiments_spark.registry import fresh_fn
    from single_cell_experiments_spark.session import get_spark

    spark = get_spark(app_name="sce-job-audit")
    for k, v in BENCH_CONFS.items():
        spark.conf.set(k, v)
    sc = spark.sparkContext

    names = sys.argv[1:] or list(HEADLINE)
    fresh = {n: fresh_fn(n) for n in names}

    # Warm-up: same posture as bench.py (JIT/codegen/FS cache).
    for _ in range(4):
        for n in names:
            fresh[n](spark, sf_dir).toPandas()

    print(f"{'query':32s} {'sec':>7s} {'jobs':>5s} {'stages':>7s} {'tasks':>6s}")
    for n in names:
        group = f"audit-{n}"
        sc.setJobGroup(group, n)
        t0 = time.perf_counter()
        fresh[n](spark, sf_dir).toPandas()
        dt = time.perf_counter() - t0
        sc.setJobGroup("", "")
        tracker = sc.statusTracker()
        job_ids = tracker.getJobIdsForGroup(group)
        n_stages = 0
        n_tasks = 0
        for jid in job_ids:
            info = tracker.getJobInfo(jid)
            if info is None:
                continue
            for sid in info.stageIds:
                si = tracker.getStageInfo(sid)
                if si is not None and si.numTasks > 0:
                    n_stages += 1
                    n_tasks += si.numTasks
        print(f"{n:32s} {dt:7.3f} {len(job_ids):5d} {n_stages:7d} {n_tasks:6d}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

#!/usr/bin/env python
"""Spark-only wall time for arbitrary registry queries via the noop sink.

driver_mimic.py times Spark + DuckDB-oracle together; this tool isolates the
Spark side (optimization guide §1.4): build the query fresh, write it to the
built-in noop sink (computes every column of every row, discards output),
and report seconds per query.  Jobs are labelled with the query name so the
UI/event log maps time back to operators (§1.5), and each rep runs under a
job group so the report includes the driver-side job/stage counts — the
deterministic signal the dispatch-floor-dominated wall time is noisy proxy
for (r16: host noise inflated identical plans 3-4x between sessions).

Usage: python tools/op_timer.py [--sf DIR] [--reps N] name [name ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--sf", dest="sf_dir", default="/root/testdata/sf0.01")
    ap.add_argument("--reps", type=int, default=1)
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()
    reps = max(1, args.reps)

    from single_cell_experiments_spark.registry import fresh_fn
    from single_cell_experiments_spark.session import get_spark

    spark = get_spark(app_name="sce-op-timer")
    sc = spark.sparkContext
    out: dict[str, float] = {}
    counts: dict[str, dict[str, int]] = {}
    for n in args.names:
        fn = fresh_fn(n)
        best = None
        for rep in range(reps):
            group = f"optimer-{n}-{rep}"
            sc.setJobGroup(group, n)
            t0 = time.perf_counter()
            df = fn(spark, args.sf_dir)
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            sc.setJobGroup("", "")
            if best is None or dt < best:
                best = dt
                tracker = sc.statusTracker()
                job_ids = tracker.getJobIdsForGroup(group)
                n_stages = n_tasks = 0
                for jid in job_ids:
                    info = tracker.getJobInfo(jid)
                    if info is None:
                        continue
                    for sid in info.stageIds:
                        si = tracker.getStageInfo(sid)
                        if si is not None and si.numTasks > 0:
                            n_stages += 1
                            n_tasks += si.numTasks
                counts[n] = {
                    "jobs": len(job_ids),
                    "stages": n_stages,
                    "tasks": n_tasks,
                }
        out[n] = round(best, 3)
        c = counts[n]
        print(
            f"{n:40s} {best:8.3f}s  jobs={c['jobs']:<5d} stages={c['stages']:<6d}"
            f" tasks={c['tasks']}",
            flush=True,
        )
    print(
        json.dumps(
            {
                "sf_dir": args.sf_dir,
                "reps": reps,
                "spark_noop_sec": out,
                "job_counts": counts,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

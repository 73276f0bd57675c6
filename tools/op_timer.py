#!/usr/bin/env python
"""Spark-only wall time for arbitrary registry queries via the noop sink.

driver_mimic.py times Spark + DuckDB-oracle together; this tool isolates the
Spark side (optimization guide §1.4): build the query fresh, write it to the
built-in noop sink (computes every column of every row, discards output),
and report seconds per query.  Jobs are labelled with the query name so the
UI/event log maps time back to operators (§1.5).

Usage: python tools/op_timer.py [--sf DIR] [--reps N] name [name ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    args = [a for a in sys.argv[1:]]
    sf_dir = "/root/testdata/sf0.01"
    reps = 1
    names = []
    i = 0
    while i < len(args):
        if args[i] == "--sf":
            sf_dir = args[i + 1]
            i += 2
        elif args[i] == "--reps":
            reps = int(args[i + 1])
            i += 2
        else:
            names.append(args[i])
            i += 1

    from single_cell_experiments_spark.registry import fresh_fn
    from single_cell_experiments_spark.session import get_spark

    spark = get_spark(app_name="sce-op-timer")
    sc = spark.sparkContext
    out: dict[str, float] = {}
    for n in names:
        fn = fresh_fn(n)
        best = None
        for _ in range(reps):
            sc.setJobDescription(n)
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            sc.setJobDescription(None)
            best = dt if best is None else min(best, dt)
        out[n] = round(best, 3)
        print(f"{n:40s} {best:8.3f}s", flush=True)
    print(json.dumps({"sf_dir": sf_dir, "reps": reps, "spark_noop_sec": out}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

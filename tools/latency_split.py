#!/usr/bin/env python
"""Split fresh-query latency into plan-build vs execute(toPandas).

Fresh latency = Python builder + Catalyst analysis (build) + optimize/
physical-plan/execute/Arrow-collect (toPandas).  This tool medians each
half separately over several rounds to show where the bench gate's
milliseconds actually live.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import BENCH_CONFS, HEADLINE  # noqa: E402


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from single_cell_experiments_spark.registry import fresh_fn
    from single_cell_experiments_spark.session import get_spark

    spark = get_spark(app_name="sce-latency-split")
    for k, v in BENCH_CONFS.items():
        spark.conf.set(k, v)

    names = sys.argv[1:] or list(HEADLINE)
    fresh = {n: fresh_fn(n) for n in names}
    for _ in range(6):
        for n in names:
            fresh[n](spark, sf_dir).toPandas()

    build_t: dict[str, list[float]] = {n: [] for n in names}
    exec_t: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(7):
        for n in names:
            t0 = time.perf_counter()
            df = fresh[n](spark, sf_dir)
            t1 = time.perf_counter()
            df.toPandas()
            t2 = time.perf_counter()
            build_t[n].append(t1 - t0)
            exec_t[n].append(t2 - t1)

    print(f"{'query':32s} {'build':>7s} {'exec':>7s} {'total':>7s}")
    tot_b = tot_e = 0.0
    for n in names:
        b = statistics.median(build_t[n])
        e = statistics.median(exec_t[n])
        tot_b += b
        tot_e += e
        print(f"{n:32s} {b*1000:6.0f}m {e*1000:6.0f}m {(b+e)*1000:6.0f}m")
    print(f"{'TOTAL':32s} {tot_b*1000:6.0f}m {tot_e*1000:6.0f}m {(tot_b+tot_e)*1000:6.0f}m")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

#!/usr/bin/env python
"""Benchmark the engine's headline queries against BASELINE.md.

Runs the eight BASELINE.md queries (same names, same semantics) from the
engine's registry at ``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1)
on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

    {"metric": "headline_total_sec", "value": N, "unit": "sec",
     "queries": {"q1_pricing_summary": sec, ...}, "sf": 0.1}

Methodology (BASELINE.md contract): one warm-up execution per query
(JIT/codegen/broadcast warm, matching DuckDB's in-process posture), then
median of 5 timed runs; timing covers plan + execute + Arrow-materialize to
a driver pandas frame (the same materialization BASELINE.md's DuckDB
numbers pay via ``.df()``), per query, excluding session startup.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

HEADLINE = (
    "q1_pricing_summary",
    "q3_join_topk",
    "window_rank",
    "distinct_users_daily",
    "tumbling_window_events",
    "doc_text_stats",
    "embed_centroid_per_label",
    "knn_cosine_to_vec0",
)

RUNS = 5  # median of 5: robust to transient machine-load spikes


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    tail = os.path.basename(sf_dir.rstrip("/"))
    sf = float(tail[2:]) if tail.startswith("sf") else None

    from single_cell_experiments_spark.registry import queries
    from single_cell_experiments_spark.session import get_spark

    qs = queries()
    spark = get_spark(app_name="sce-bench")
    # Split the (small) local parquet files finer than the 128m cluster
    # default so scans use more of local[32]'s threads — the same
    # bytes-per-task sizing a real cluster gets from its many files.
    spark.conf.set("spark.sql.files.maxPartitionBytes", "4m")

    names = sys.argv[1:] or list(HEADLINE)
    for name in names:
        qs[name](spark, sf_dir).toPandas()  # warm-up (codegen, file listing, JIT)
    # Interleave the timed runs round-robin so a transient VM load spike
    # lands on at most one sample of each query instead of sinking one
    # query's entire median.
    times: dict[str, list[float]] = {name: [] for name in names}
    for _ in range(RUNS):
        for name in names:
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).toPandas()
            times[name].append(time.perf_counter() - t0)
    per_query: dict[str, float] = {}
    for name in names:
        per_query[name] = round(statistics.median(times[name]), 4)
        print(f"  {name}: {per_query[name]:.3f}s", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "headline_total_sec",
                "value": round(sum(per_query.values()), 4),
                "unit": "sec",
                "queries": per_query,
                "sf": sf,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

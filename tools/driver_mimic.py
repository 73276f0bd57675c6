"""Drive the engine exactly the way the driver harness does.

Creates a PLAIN SparkSession (none of the engine's confs — the driver's
session is not ours to configure), imports ``__spark_entry__`` from the repo
root, smoke-runs ``entry``, then runs every ``queries()`` entry at the given
sf dir and compares row-count + sorted-column schema + order-insensitive
value multiset against ``oracle_sql()`` via DuckDB.

Usage: python tools/driver_mimic.py [sf_dir] [name ...]
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import duckdb
from pyspark.sql import SparkSession

from tests.conftest import canon_frame  # same canonicalization as pytest layer

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = set(sys.argv[2:])

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

#: Stamp written after a FULL-registry, zero-fail run — the mechanical
#: enforcement of registry.py's rotation safety net: queries past the
#: driver's 50-slot window only have LOCAL evidence, so the full sweep
#: MUST be re-run whenever engine code changes.  tests/test_mimic_gate.py
#: fails until it is.  Content digests (not mtimes) keep the gate stable
#: across checkouts.
STAMP_PATH = os.path.join(REPO, "tools", ".mimic_stamp.json")


def source_digest() -> str:
    """sha256 over every engine source file's (relpath, bytes)."""
    h = hashlib.sha256()
    paths = [os.path.join(REPO, "__spark_entry__.py")]
    pkg = os.path.join(REPO, "single_cell_experiments_spark")
    for root, _dirs, files in os.walk(pkg):
        for f in files:
            if f.endswith(".py"):
                paths.append(os.path.join(root, f))
    for p in sorted(paths):
        h.update(os.path.relpath(p, REPO).encode())
        with open(p, "rb") as fh:
            h.update(fh.read())
    return h.hexdigest()


def main() -> int:
    # Plain session: mimics the driver (no engine confs at build time).
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("driver-mimic")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as e

    t0 = time.time()
    smoke = e.entry(spark)
    n = smoke.count()
    print(f"entry(): {n} rows, schema={smoke.columns} [{time.time()-t0:.1f}s]")
    assert n > 0

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")

    qs, oracles = e.queries(), e.oracle_sql()
    n_pass = n_fail = n_rows_only = 0
    for name, fn in sorted(qs.items()):
        if ONLY and name not in ONLY:
            continue
        t0 = time.time()
        try:
            df = fn(spark, SF_DIR)
            if name not in oracles:
                cnt = df.count()
                print(f"  ~ {name}: rows-only, {cnt} rows [{time.time()-t0:.1f}s]")
                n_rows_only += 1
                continue
            scols, srows = canon_frame(df.toPandas())
            ocols, orows = canon_frame(con.sql(oracles[name]).df())
            if scols != ocols:
                print(f"  ✗ {name}: SCHEMA spark={scols} oracle={ocols}")
                n_fail += 1
            elif srows != orows:
                diff = [(a, b) for a, b in zip(srows, orows) if a != b][:3]
                print(
                    f"  ✗ {name}: VALUES nrows {len(srows)}/{len(orows)}; first diffs {diff}"
                )
                n_fail += 1
            else:
                print(f"  ✓ {name}: {len(srows)} rows [{time.time()-t0:.1f}s]")
                n_pass += 1
        except Exception as ex:  # noqa: BLE001
            print(f"  ✗ {name}: ERROR {type(ex).__name__}: {ex}")
            n_fail += 1
        finally:
            # Long sweeps accumulate the queries' lineage-cut blocks
            # (materialize() = localCheckpoint RDDs) in the single JVM's
            # storage memory; once full, the block manager can evict a
            # large INDIRECT task result before the driver fetches it
            # (observed twice at sf0.1: query ~118 failing with
            # TaskResultLost while green standalone).  clearCache() alone
            # is not enough — checkpoint blocks are reclaimed by the
            # ContextCleaner only after BOTH the Python plan-cache
            # reference and the JVM object die, so drop the plan cache
            # and GC both sides.  The real driver windows 50 queries at
            # sf0.01 and never gets here; the full sweep resets between
            # queries so each one's resource posture is independent.
            import gc

            from single_cell_experiments_spark import registry as _reg

            spark.catalog.clearCache()
            _reg._plan_cache.pop(spark, None)
            gc.collect()
            spark._jvm.System.gc()
    print(f"PASS={n_pass} ROWS_ONLY={n_rows_only} FAIL={n_fail} @ {SF_DIR}")
    if not ONLY and n_fail == 0:
        with open(STAMP_PATH, "w") as f:
            json.dump(
                {
                    "sf_dir": SF_DIR,
                    "n_pass": n_pass,
                    "n_rows_only": n_rows_only,
                    "n_fail": n_fail,
                    "n_registered": len(qs),
                    "source_digest": source_digest(),
                    "utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
                },
                f,
                indent=1,
            )
        print(f"stamp -> {STAMP_PATH}")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())

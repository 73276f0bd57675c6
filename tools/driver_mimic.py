"""Drive the engine exactly the way the driver harness does.

Creates a PLAIN SparkSession (none of the engine's confs — the driver's
session is not ours to configure), imports ``__spark_entry__`` from the repo
root, smoke-runs ``entry``, then runs every ``queries()`` entry at the given
sf dir and compares row-count + sorted-column schema + order-insensitive
value multiset against ``oracle_sql()`` via DuckDB.

Usage: python tools/driver_mimic.py [sf_dir] [name ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb
from pyspark.sql import SparkSession

from tests.conftest import canon_frame  # same canonicalization as pytest layer

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = set(sys.argv[2:])

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


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
    print(f"PASS={n_pass} ROWS_ONLY={n_rows_only} FAIL={n_fail} @ {SF_DIR}")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())

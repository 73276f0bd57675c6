"""Mirror of the driver's t2 correctness gate, run locally at sf0.001.

Every registered query with an oracle is executed on Spark and on DuckDB
and compared exactly (stricter than the driver's value-hash).  Queries
without an oracle get a rows/schema smoke check.
"""

from __future__ import annotations

import pytest

from single_cell_experiments_spark.registry import REGISTRY, queries, oracle_sql
from tests.conftest import SF_DIR, assert_frames_match

queries()  # populate REGISTRY

_WITH_ORACLE = sorted(n for n, s in REGISTRY.items() if s.oracle)
_ROWS_ONLY = sorted(n for n, s in REGISTRY.items() if not s.oracle)


@pytest.mark.parametrize("name", _WITH_ORACLE)
def test_oracle_parity(spark, ddb, name):
    spec = REGISTRY[name]
    df = spec.fn(spark, SF_DIR)
    rel = ddb.sql(spec.oracle)
    assert_frames_match(df, rel, name=name)


@pytest.mark.parametrize("name", _ROWS_ONLY)
def test_rows_only_smoke(spark, name):
    spec = REGISTRY[name]
    df = spec.fn(spark, SF_DIR)
    assert df.columns, f"{name}: empty schema"
    assert df.count() >= 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    # driver requires a stable schema
    assert df.columns


def test_every_oracle_key_has_query():
    q = queries()
    for k in oracle_sql():
        assert k in q

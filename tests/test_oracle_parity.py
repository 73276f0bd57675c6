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


def test_approx_percentile_error_bound(spark):
    """agg_approx_percentiles now hash-checks the GK rank-error bound
    through its oracle (flags vs literal TRUE); this asserts the flags
    directly so a bound violation reads as this test, not a hash diff."""
    from single_cell_experiments_spark.operators.relational import agg_approx_percentiles

    for r in agg_approx_percentiles(spark, SF_DIR).collect():
        assert r["ap50_in_bounds"], r
        assert r["ap90_in_bounds"], r


def test_approx_percentiles_scale_path(spark):
    """The unwrapped production sketch path must emit the same GK values
    the registered verification wrapper bounds (same agg expressions, no
    exact-percentile buffering)."""
    from single_cell_experiments_spark.operators.relational import approx_percentiles_scale

    out = {r["l_returnflag"]: r for r in approx_percentiles_scale(spark, SF_DIR).collect()}
    assert out and all(r["ap50"] is not None and r["aprice_p90"] is not None for r in out.values())


def test_approx_distinct_error_bound(spark):
    """approx_distinct_parts' HLL estimate must sit within 3·rsd of the
    exact count (the hash-checked flag), asserted directly here too."""
    from single_cell_experiments_spark.operators.relational import approx_distinct_parts

    for r in approx_distinct_parts(spark, SF_DIR).collect():
        assert r["approx_within_bounds"], r


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

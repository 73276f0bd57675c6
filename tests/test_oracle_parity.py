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
    """agg_approx_percentiles (rows-only for the driver) is bounded locally:
    with accuracy=10000 the GK sketch's rank error is ≤ n/10000, which on
    these group sizes means the approx values must land within the exact
    p45–p55 / p89–p91 envelopes."""
    from single_cell_experiments_spark.operators.relational import (
        agg_approx_percentiles,
        agg_percentiles_lineitem,
    )
    from pyspark.sql import functions as F

    from single_cell_experiments_spark.catalog import load_table

    approx = {r["l_returnflag"]: r for r in agg_approx_percentiles(spark, SF_DIR).collect()}
    li = load_table(spark, SF_DIR, "lineitem")
    envelope = {
        r["l_returnflag"]: r
        for r in li.groupBy("l_returnflag")
        .agg(
            F.percentile("l_quantity", F.lit(0.45)).alias("q_lo"),
            F.percentile("l_quantity", F.lit(0.55)).alias("q_hi"),
            F.percentile("l_extendedprice", F.lit(0.89)).alias("p_lo"),
            F.percentile("l_extendedprice", F.lit(0.91)).alias("p_hi"),
        )
        .collect()
    }
    assert approx.keys() == envelope.keys()
    for flag, a in approx.items():
        e = envelope[flag]
        assert e["q_lo"] <= a["ap50"] <= e["q_hi"], (flag, a["ap50"], e)
        assert e["p_lo"] <= a["aprice_p90"] <= e["p_hi"], (flag, a["aprice_p90"], e)


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

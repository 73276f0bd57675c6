"""Bucketed-table co-located join: the shuffle-elimination technique for
repeated large-fact joins at 100 TB.

Writing both fact tables bucketed (and sorted) by the join key lets Spark's
sort-merge join read matching buckets pairwise — no Exchange on either side
at query time.  On a real cluster this turns every subsequent
orders⨝lineitem into a scan-local join; the (one-off) bucketed write pays
the shuffle once.  The reference has no analogue (its only co-location is
chunk-aligned repartitioning before Zarr writes, SURVEY.md §2.A A13).

Asserted here (local metastore + spark-warehouse under the repo root,
gitignored): (1) the bucketed join plan contains NO Exchange; (2) its
result is identical to the plain (shuffling) join.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from single_cell_experiments_spark.catalog import load_table
from tests.conftest import SF_DIR

N_BUCKETS = 8


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    (
        load_table(spark, SF_DIR, "orders")
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .write.bucketBy(N_BUCKETS, "o_orderkey")
        .sortBy("o_orderkey")
        .mode("overwrite")
        .saveAsTable("b_orders")
    )
    (
        load_table(spark, SF_DIR, "lineitem")
        .select("l_orderkey", "l_quantity")
        .write.bucketBy(N_BUCKETS, "l_orderkey")
        .sortBy("l_orderkey")
        .mode("overwrite")
        .saveAsTable("b_lineitem")
    )
    yield
    spark.sql("DROP TABLE b_orders")
    spark.sql("DROP TABLE b_lineitem")


def _join(o, li):
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("qty"))
        .orderBy("o_orderstatus")
    )


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    # Force the join path (not broadcast) so the assertion is about bucketing.
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = _join(spark.table("b_orders"), spark.table("b_lineitem"))
        j.collect()  # AQE: materialize the final plan
        plan = j._jdf.queryExecution().executedPlan().toString()
        join_part = plan.split("HashAggregate")[-1]  # below the agg: the join
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in join_part, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_matches_plain(spark, bucketed_tables):
    bucketed = _join(spark.table("b_orders"), spark.table("b_lineitem")).collect()
    plain = _join(
        load_table(spark, SF_DIR, "orders"),
        load_table(spark, SF_DIR, "lineitem"),
    ).collect()
    assert bucketed == plain

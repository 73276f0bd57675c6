"""Mechanical demonstrations of the SCALE.md §4 claims that were
previously design-only: AQE's skew-join split actually fires on a skewed
join under the engine's session confs, and AQE coalesces the empty tail
of over-provisioned shuffle partitions.  Synthetic data is built in-session
(no testdata writes), sized so the demos run in seconds on local[32] while
still tripping the size-based thresholds AQE uses.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _skewed_fact(spark, n_hot: int, n_tail_keys: int, rows_per_tail: int):
    """key 0 holds ``n_hot`` rows; keys 1..n_tail_keys hold a few each —
    the classic hot-key layout (one partition ≫ median)."""
    # payload = xxhash64(id): incompressible bytes, so the hot partition's
    # COMPRESSED shuffle blocks (what the skew threshold measures) stay big
    hot = spark.range(n_hot).select(
        F.lit(0).alias("k"), F.xxhash64("id").alias("payload")
    )
    tail = spark.range(n_tail_keys * rows_per_tail).select(
        (F.col("id") % n_tail_keys + 1).alias("k"), F.xxhash64("id").alias("payload")
    )
    return hot.unionAll(tail)


def test_aqe_splits_skewed_join_partitions(spark):
    """SCALE.md §4: 'AQE's skew split is the automatic fallback.'  Build a
    join where one key owns ~99% of the bytes, force the non-broadcast
    path, and assert the adaptive final plan marks the sort-merge join
    skew-handled (``skew=true``) — i.e. the hot partition was split
    instead of serializing one reducer.

    Two real-world subtleties this test encodes (both discovered by
    probing, both matter on a cluster):
    - the skew threshold measures COMPRESSED shuffle block bytes, so a
      hot key of constant/sequential values can compress below threshold
      and silently skip the split — the payload here is xxhash64 noise;
    - OptimizeSkewedJoin is SKIPPED when a downstream operator requires
      the join's hash partitioning (e.g. a groupBy on the same key):
      splitting would invalidate the co-partitioning without an extra
      shuffle.  A same-key rollup after a skewed join therefore still
      serializes unless you add the shuffle yourself (or enable
      forceOptimizeSkewedJoin) — the consumer here aggregates globally.
    """
    confs = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        # thresholds sized down so a ~MB-scale hot key trips the split
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "1m",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "256k",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.shuffle.partitions": "8",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        fact = _skewed_fact(spark, n_hot=400_000, n_tail_keys=7, rows_per_tail=50)
        dim = spark.range(8).select(
            F.col("id").alias("k"), (F.col("id") * 10).alias("attr")
        )
        joined = fact.join(dim, "k").agg(
            F.count(F.lit(1)).alias("n"),
            F.max(F.col("payload") + F.col("attr")).alias("s"),
        )
        row = joined.collect()[0]
        assert int(row["n"]) == 400_000 + 7 * 50
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:4000]
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_aqe_coalesces_tiny_shuffle_partitions(spark):
    """SCALE.md §1/§4: over-provisioned reduce partitions collapse at
    runtime — with 200 configured partitions and a few KB of shuffle data,
    AQE must coalesce to far fewer actual partitions (the mechanism that
    makes 'size shuffle.partitions for the big stage' safe for the small
    ones on a real cluster)."""
    confs = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.shuffle.partitions": "200",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        df = (
            spark.range(10_000)
            .select((F.col("id") % 50).alias("k"))
            .groupBy("k")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        assert len(df.collect()) == 50  # executes THIS df's adaptive plan
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "coalesced" in plan, plan[:4000]
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)

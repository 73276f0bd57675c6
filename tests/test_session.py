"""Regression tests for session.tune()'s conf-application contract.

Round-5 bug class: tune() is called at every table load, and it used to
re-apply the engine's AQE-on perf posture each time — silently clobbering
confs a session owner (the bench, a driver harness) had set explicitly.
The contract now: correctness confs are re-asserted on EVERY tune call;
perf confs apply only on a session's FIRST tune.
"""

from __future__ import annotations

from single_cell_experiments_spark.session import CORRECTNESS_CONFS, PERF_CONFS, tune


def test_tune_preserves_owner_perf_overrides(spark):
    tune(spark)  # ensure first-tune perf application already happened
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        tune(spark)
        assert spark.conf.get("spark.sql.adaptive.enabled") == "false", (
            "tune() must not clobber an explicitly-set perf conf after the "
            "session's first tune"
        )
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", PERF_CONFS["spark.sql.adaptive.enabled"])


def test_tune_reasserts_correctness_confs(spark):
    tune(spark)
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    tune(spark)
    assert spark.conf.get("spark.sql.session.timeZone") == CORRECTNESS_CONFS[
        "spark.sql.session.timeZone"
    ], "tune() must re-assert correctness confs on every call"


def test_first_tune_respects_explicit_default_value(spark):
    """An owner who explicitly sets a perf conf to its Spark-default value
    BEFORE the engine's first tune must not be clobbered either —
    distinguishable from 'unset' only via SQLConf.contains."""
    from single_cell_experiments_spark import session as S

    key = "spark.sql.execution.arrow.pyspark.enabled"
    original = spark.conf.get(key)
    try:
        spark.conf.set(key, "false")  # == Spark default, explicit choice
        S._perf_tuned.discard(spark)  # simulate a never-tuned session
        tune(spark)
        assert spark.conf.get(key) == "false", (
            "first tune() must not override an explicitly-set perf conf, "
            "even when its value equals the Spark default"
        )
    finally:
        spark.conf.set(key, original)
        _ = tune(spark)


def test_perf_confs_applied_on_first_tune(spark):
    # The shared session was tuned at build; its perf posture must hold
    # unless a test explicitly overrode it.
    for k, v in PERF_CONFS.items():
        assert spark.conf.get(k) == v


def test_materialize_local_and_reliable_checkpoint(spark, tmp_path):
    """materialize() is the engine's lineage cut: localCheckpoint by
    default, durable checkpoint() when spark.sce.reliableCheckpoint=true —
    the cluster fault-tolerance switch SCALE.md promises.  Both paths must
    return the same rows and actually truncate lineage (a checkpointed
    plan no longer re-reads the source)."""
    from single_cell_experiments_spark.session import materialize

    def lineage_cut(df) -> bool:
        # After checkpoint/localCheckpoint the logical plan is a LogicalRDD
        # over the materialized blocks — the source scan is gone.
        return "Scan ExistingRDD" in df._jdf.queryExecution().executedPlan().toString()

    df = spark.range(100).withColumnRenamed("id", "v")
    local = materialize(df)
    assert local.count() == 100
    assert lineage_cut(local)

    spark.sparkContext.setCheckpointDir(str(tmp_path / "ckpt"))
    spark.conf.set("spark.sce.reliableCheckpoint", "true")
    try:
        durable = materialize(spark.range(50).withColumnRenamed("id", "v"))
        assert durable.count() == 50
        assert lineage_cut(durable)
        ckpt_files = list((tmp_path / "ckpt").rglob("*"))
        assert ckpt_files, "reliable checkpoint must write durable files"
    finally:
        spark.conf.set("spark.sce.reliableCheckpoint", "false")

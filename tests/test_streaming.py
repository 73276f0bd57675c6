"""Live Structured Streaming jobs must agree with their batch-equivalent
twins (the driver's oracle runs only the batch side — this is the proof the
same semantics hold when executed as an actual stream)."""

from __future__ import annotations

import pytest

from single_cell_experiments_spark.registry import queries
from single_cell_experiments_spark.streaming import jobs
from tests.conftest import SF_DIR

QS = queries()


def _rows(df, *cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_tumbling_stream_matches_batch(spark):
    stream = jobs.run_tumbling_stream(spark, SF_DIR)
    batch = QS["tumbling_window_events"](spark, SF_DIR)
    assert _rows(stream, "w_start_s", "c") == _rows(batch, "w_start_s", "c")


def test_session_stream_matches_batch(spark):
    stream = jobs.run_session_stream(spark, SF_DIR)
    batch = QS["session_window_events"](spark, SF_DIR)
    assert _rows(stream, "user_id", "session_start_s", "n_events") == _rows(
        batch, "user_id", "session_start_s", "n_events"
    )


def test_dedup_stream_matches_batch_keys(spark):
    stream = jobs.run_dedup_stream(spark, SF_DIR)
    batch = QS["stateful_dedup_events"](spark, SF_DIR)
    # first-seen winner depends on arrival order (non-deterministic in the
    # file replay); the deduped KEY set must match the batch twin exactly.
    assert _rows(stream, "user_id", "event_type") == _rows(batch, "user_id", "event_type")


def test_stateful_counter_matches_batch(spark):
    from pyspark.sql import functions as F

    from single_cell_experiments_spark.catalog import load_table

    stream = jobs.run_stateful_counter_stream(spark, SF_DIR)
    # update-mode emits one row per key per batch; last emission per key wins
    latest = {r["user_id"]: (r["n_events"], r["v_sum_e6"]) for r in stream.collect()}
    batch = (
        load_table(spark, SF_DIR, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.round("value", 6) * 10**6).cast("bigint")).alias("v_e6"),
        )
        .collect()
    )
    expected = {r["user_id"]: (r["n"], r["v_e6"]) for r in batch}
    assert latest == expected


def test_stream_stream_join_matches_batch(spark):
    stream = jobs.run_stream_stream_join(spark, SF_DIR)
    batch = QS["stream_join_click_purchase"](spark, SF_DIR)
    assert _rows(stream, "user_id", "click_id", "purchase_id", "dt_s") == _rows(
        batch, "user_id", "click_id", "purchase_id", "dt_s"
    )


def test_file_sink_exactly_once(spark):
    # First run (clear): sink == batch filter of purchases.
    path = jobs.run_file_sink_stream(spark, SF_DIR, clear=True)
    first = spark.read.parquet(path).count()
    batch = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .where("event_type = 'purchase'")
        .count()
    )
    assert first == batch > 0
    # Restart against the SAME checkpoint: source offsets are committed, so
    # the rerun must append nothing — end-to-end exactly-once.
    path2 = jobs.run_file_sink_stream(spark, SF_DIR, clear=False)
    assert path2 == path
    assert spark.read.parquet(path).count() == first


@pytest.mark.skipif(
    not jobs.state_v2_available(),
    reason="transformWithStateInPandas needs the optional protobuf dependency",
)
def test_state_v2_counter_matches_batch(spark):
    """State-v2 twin of the applyInPandasWithState counter: identical
    final per-user counts after availableNow replay."""
    from pyspark.sql import functions as F

    from single_cell_experiments_spark.catalog import load_table

    stream = jobs.run_state_v2_counter_stream(spark, SF_DIR)
    latest = {r["user_id"]: (r["n_events"], r["v_sum_e6"]) for r in stream.collect()}
    batch = (
        load_table(spark, SF_DIR, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.round("value", 6) * 10**6).cast("bigint")).alias("v_e6"),
        )
        .collect()
    )
    expected = {r["user_id"]: (r["n"], r["v_e6"]) for r in batch}
    assert latest == expected


def test_state_v2_gate_reports_missing_dependency(spark):
    """Where protobuf is absent the state-v2 job must fail fast with the
    actionable ImportError, not a mid-stream driver-worker crash."""
    if jobs.state_v2_available():
        pytest.skip("protobuf present: gate inactive")
    with pytest.raises(ImportError, match="protobuf"):
        jobs.run_state_v2_counter_stream(spark, SF_DIR)


def test_stream_static_enrich_matches_batch(spark):
    stream = jobs.run_stream_static_enrich(spark, SF_DIR)
    batch = QS["stream_static_enrich"](spark, SF_DIR)
    assert _rows(stream, "nation", "event_type", "c", "v_cents") == _rows(
        batch, "nation", "event_type", "c", "v_cents"
    )


def test_foreach_batch_merge_multi_batch_and_idempotent_restart(spark):
    """The foreachBatch merge must see ≥3 genuine micro-batches
    (maxFilesPerTrigger=1 over the 3-file split), and a restart that
    KEEPS the checkpoint must merge zero new batches — the exactly-once
    contract of the programmable sink."""
    from tests.conftest import SF_DIR

    from single_cell_experiments_spark.streaming.jobs import (
        run_foreach_batch_merge,
    )

    path = run_foreach_batch_merge(spark, SF_DIR, clear=True)
    assert run_foreach_batch_merge.last_batch_count >= 3
    before = {
        (r["user_id"], r["n_purchases"], r["v_cents"])
        for r in spark.read.parquet(path).collect()
    }
    path2 = run_foreach_batch_merge(spark, SF_DIR, clear=False)
    assert run_foreach_batch_merge.last_batch_count == 0
    after = {
        (r["user_id"], r["n_purchases"], r["v_cents"])
        for r in spark.read.parquet(path2).collect()
    }
    assert before == after


def test_stream_stream_left_join_matches_batch_with_watermark_tail(spark):
    """Matched rows must equal the batch twin exactly; unmatched (NULL)
    rows equal the batch twin's minus the finite-replay watermark tail:
    clicks younger than wm - 1800 s (wm = min over sides of side-max - 600)
    keep state at the final watermark and never emit (see
    run_stream_stream_left_join)."""
    from pyspark.sql import functions as F

    from single_cell_experiments_spark.catalog import load_table
    from single_cell_experiments_spark.streaming.batch_equiv import ATTRIB_WINDOW_S

    stream = jobs.run_stream_stream_left_join(spark, SF_DIR)
    batch = QS["stream_left_join_unattributed"](spark, SF_DIR)

    live_matched = stream.where(F.col("purchase_id").isNotNull())
    batch_matched = batch.where(F.col("purchase_id").isNotNull())
    assert _rows(live_matched, "user_id", "click_id", "purchase_id", "dt_s") == _rows(
        batch_matched, "user_id", "click_id", "purchase_id", "dt_s"
    )

    e = load_table(spark, SF_DIR, "events")
    # The GLOBAL watermark is min over both sides' watermark nodes: each
    # side contributes max(its event time) - 10 min, so the terminal
    # watermark follows the side that ends EARLIER.
    side_max = {
        r["event_type"]: r["mx"]
        for r in e.where(F.col("event_type").isin("click", "purchase"))
        .groupBy("event_type")
        .agg(F.max("ts_s").alias("mx"))
        .collect()
    }
    wm = min(side_max["click"], side_max["purchase"]) - 600
    horizon = wm - ATTRIB_WINDOW_S
    live_null = {r["click_id"] for r in stream.where(F.col("purchase_id").isNull()).collect()}
    click_ts = {
        r["event_id"]: r["ts_s"]
        for r in e.where(F.col("event_type") == "click").select("event_id", "ts_s").collect()
    }
    batch_null = {r["click_id"] for r in batch.where(F.col("purchase_id").isNull()).collect()}
    # every live NULL row is a genuine batch-unmatched click
    assert live_null <= batch_null
    # and every batch-unmatched click safely past the horizon emitted
    margin = 60  # one-sided slack for the eviction boundary comparison
    must_emit = {c for c in batch_null if click_ts[c] < horizon - margin}
    missing = must_emit - live_null
    assert not missing, f"{len(missing)} expired unmatched clicks never emitted"
    assert len(live_null) > 0  # the outer leg actually fired

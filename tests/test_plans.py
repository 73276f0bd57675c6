"""Scale-posture tests: assert the physical plans are the ones we'd want on
a 1000-executor cluster — pushdown reaches the scan, small dims broadcast,
top-k uses group limits, shuffle counts are minimal.  Correctness is the
oracle suite's job; this file guards the 100-TB shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from single_cell_experiments_spark.catalog import load_table
from single_cell_experiments_spark.plans import inspect
from single_cell_experiments_spark.registry import queries
from tests.conftest import SF_DIR

QS = queries()


def test_filter_and_pruning_reach_parquet_scan(spark):
    li = load_table(spark, SF_DIR, "lineitem")
    df = li.where(F.col("l_shipdate") <= "1998-09-02").select("l_returnflag", "l_quantity")
    pushed, schema = inspect.scan_pushdown(df)
    assert "l_shipdate" in pushed, f"filter not pushed: {pushed}"
    # only the filter + projected columns may be read
    assert "l_extendedprice" not in schema, f"column pruning failed: {schema}"
    assert "l_returnflag" in schema and "l_quantity" in schema


def test_q3_inlines_small_dimension_as_inset(spark):
    """Below the size gate the BUILDING-customer dim becomes an IN-set
    predicate inside the orders scan stage — no customer scan, no
    broadcast-build job, no exchange for the dim side."""
    df = QS["q3_join_topk"](spark, SF_DIR)
    plan = inspect.formatted_plan(df)
    assert "customer.parquet" not in plan, "dim should be inlined, not scanned"
    assert "o_custkey" in plan  # the IN-set filter survives into the plan


def test_q3_dim_fallback_joins_scan_above_gate(spark, monkeypatch):
    """Above the inline gate (`_DIM_INLINE_MAX_KEYS`) the dim prep must NOT
    collect keys to the driver: the plan joins the customer scan and the
    planner picks the strategy (r6 verdict #2 — the guarded path)."""
    from single_cell_experiments_spark.operators import relational
    from single_cell_experiments_spark.registry import fresh_fn

    monkeypatch.setattr(relational, "_DIM_INLINE_MAX_KEYS", 0)
    relational._dim_cache.pop(spark, None)
    try:
        df = fresh_fn("q3_join_topk")(spark, SF_DIR)
        plan = inspect.formatted_plan(df)
        assert "customer.parquet" in plan, "fallback must join the dim scan"
        assert "Join" in plan
        df.limit(1).collect()  # fallback path executes
    finally:
        relational._dim_cache.pop(spark, None)


def test_scale_stats_join_is_broadcast(spark):
    df = QS["sc_scale"](spark, SF_DIR)
    assert inspect.uses_broadcast_join(df), "per-gene stats join should broadcast"


def test_topk_per_group_uses_window_group_limit(spark):
    df = QS["topk_per_group"](spark, SF_DIR)
    assert inspect.count_in_plan(df, "WindowGroupLimit", final=False) > 0


def test_q1_no_range_sampling_sort(spark):
    """q1's global ORDER BY must be a local sort over a COALESCE(1) narrow
    dependency — a rangepartitioning exchange would add a whole sampling
    job re-running the aggregation, and a REPARTITION(1) would add a
    shuffle stage (r7 latency fix; scale-safe because the aggregate is ≤ a
    dozen groups at any SF)."""
    df = QS["q1_pricing_summary"](spark, SF_DIR)
    plan = inspect.executed_plan(df)
    assert "rangepartitioning" not in plan, plan
    assert "Coalesce 1" in plan or "SinglePartition" in plan, plan


def test_q3_preaggregates_lineitem_below_join(spark):
    """q3's eager-aggregation rewrite: lineitem revenue must be summed per
    l_orderkey BELOW the orderkey join (partial agg before the exchange),
    and no re-aggregation may exist above the join — the shape that cuts
    the fact-fact shuffle ~4:1 at any scale."""
    plan = inspect.formatted_plan(QS["q3_join_topk"](spark, SF_DIR))
    aggs = [ln for ln in plan.splitlines() if "HashAggregate" in ln]
    assert aggs, "expected hash aggregates in q3 plan"
    keys = [ln for ln in plan.splitlines() if ln.strip().startswith("Keys")]
    assert all("l_orderkey" in k for k in keys if "Keys [1]" in k), keys
    # partial+final pair on l_orderkey only; nothing grouped on o_orderkey.
    assert not any("o_orderkey" in k for k in keys), keys


def test_q3_topk_is_take_ordered(spark):
    """q3's ORDER BY + LIMIT must run as TakeOrderedAndProject (per-
    partition heap + driver merge), never a global sort."""
    df = QS["q3_join_topk"](spark, SF_DIR)
    assert inspect.count_in_plan(df, "TakeOrderedAndProject", final=False) > 0


def test_q1_single_shuffle(spark):
    # scan -> partial agg -> exchange -> final agg: exactly one shuffle.
    df = QS["q1_pricing_summary"](spark, SF_DIR)
    assert inspect.exchange_count(df) <= 2  # agg + final orderBy range exchange


def test_asof_join_single_shuffle_per_side(spark):
    # union + one window pass: the whole as-of join costs one key shuffle.
    df = QS["join_asof_purchase_signup"](spark, SF_DIR)
    assert inspect.exchange_count(df) <= 1, "as-of join must not add extra shuffles"


def test_partition_pruning_on_partitioned_sink(spark):
    import os
    import tempfile

    o = load_table(spark, SF_DIR, "orders")
    path = os.path.join(tempfile.gettempdir(), "sce_prune_orders")
    o.repartition(F.col("o_orderstatus")).write.mode("overwrite").partitionBy(
        "o_orderstatus"
    ).parquet(path)
    back = spark.read.parquet(path).where(F.col("o_orderstatus") == "F")
    plan = inspect.formatted_plan(back)
    assert "PartitionFilters" in plan
    line = next(l for l in plan.splitlines() if "PartitionFilters" in l)
    assert "o_orderstatus" in line, f"partition filter not applied: {line}"


def test_range_bucketed_join_stays_equi(spark):
    # The band-join rewrite must plan as a hash/merge EQUI join on
    # (user_id, bucket) — never a nested-loop/cartesian pair explosion.
    df = QS["join_range_bucketed"](spark, SF_DIR)
    plan = inspect.executed_plan(df)
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan, plan
    assert "Join" in plan


def test_exists_lowers_to_semi_join(spark):
    # Correlated EXISTS must run as a (single-pass) semi join, not a
    # per-row subquery; at sf0.001 AQE may pick broadcast or shuffled form.
    df = QS["exists_correlated_orders"](spark, SF_DIR)
    plan = inspect.executed_plan(df)
    assert "LeftSemi" in plan, plan


def test_ivf_centroid_joins_broadcast(spark):
    # IVF assignment joins every vector against the centroid table; the
    # centroid side is O(k·d) and must ride a broadcast, never shuffle the
    # COO fact side.
    df = QS["ann_ivf_probe"](spark, SF_DIR)
    assert inspect.uses_broadcast_join(df)


def test_gapfill_spine_joins_broadcast(spark):
    # The hour spine is tiny at any scale factor — it must broadcast.
    df = QS["gapfill_time_spine"](spark, SF_DIR)
    assert inspect.uses_broadcast_join(df)


def test_salted_join_is_shuffled_hash_on_salt(spark):
    # The skew rewrite must plan as a shuffled (non-broadcast) equi join
    # whose partitioning includes the salt — that spread IS the fix.
    df = QS["skew_salted_join"](spark, SF_DIR)
    plan = inspect.executed_plan(df)
    assert "ShuffledHashJoin" in plan or "SortMergeJoin" in plan, plan
    assert "BroadcastHashJoin" not in plan, "broadcast would make salting moot"
    join_line = next(
        l for l in plan.splitlines() if "ShuffledHashJoin" in l or "SortMergeJoin" in l
    )
    assert "salt" in join_line, join_line


def test_watermark_twin_has_no_global_window(spark):
    # The two-level prefix scan: every full-table window must be
    # partitioned (by arrival block); only the tiny per-block-maxima
    # window may be unpartitioned.
    df = QS["watermark_late_drop"](spark, SF_DIR)
    plan = inspect.executed_plan(df)
    for line in plan.splitlines():
        if "Window " in line and "blk" not in line.split("partitionBy")[0]:
            # unpartitioned windows sort within a single partition marker:
            # Spark renders them with an empty partition spec.
            assert "bmax" in line or "prev_max" in line, f"global window on fact table: {line}"


def test_knn_join_broadcasts_queries_and_group_limits(spark):
    # The query batch must broadcast (corpus side never shuffles to score)
    # and the per-query top-k must use WindowGroupLimit partial heaps.
    df = QS["knn_join_batch"](spark, SF_DIR)
    plan = inspect.executed_plan(df)
    # keyless scoring join -> broadcast nested-loop is the *intended* shape
    # here (the build side is the 20-row query batch); the corpus side must
    # not see an Exchange below the join.
    assert "BroadcastExchange" in plan, plan
    assert inspect.count_in_plan(df, "WindowGroupLimit", final=False) > 0


def test_shard_pack_has_no_global_window(spark):
    # Two-level prefix scan: the only unpartitioned window may be the tiny
    # per-block-totals pass; the full-table running sum must be partitioned
    # by the doc block.
    df = QS["shard_pack_by_tokens"](spark, SF_DIR)
    plan = inspect.executed_plan(df)
    for line in plan.splitlines():
        if "Window " in line and "blk" not in line:
            assert "btot" in line or "prev_tot" in line, f"global window: {line}"


def test_stratified_sample_filter_pushes_to_scan(spark):
    # The hash-sample predicate is row-local on scanned columns — it must
    # reach the parquet reader, not sit above a full materialized scan.
    df = QS["sample_stratified_hash"](spark, SF_DIR)
    pushed, _ = inspect.scan_pushdown(df)
    assert "doc_id" in pushed or "IsNotNull" in pushed, pushed


def test_runtime_bloom_filter_prunes_probe_side(spark):
    # 100 TB lever: a selective dimension filter should inject a runtime
    # bloom filter onto the fact-side scan (row-group/page skipping via
    # might_contain) when the join is too big to broadcast.  Pin that the
    # engine's session leaves this optimization reachable.
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "10MB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        o = load_table(spark, SF_DIR, "orders").where(F.col("o_totalprice") > 400000)
        li = load_table(spark, SF_DIR, "lineitem")
        j = li.join(o, li.l_orderkey == o.o_orderkey).groupBy("o_orderstatus").count()
        plan = inspect.executed_plan(j)
        assert "might_contain" in plan, "runtime bloom filter not injected"
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_qc_metrics_zero_shuffle(spark):
    """sc_qc_metrics claims scan->project: every metric is a row-local
    higher-order fold, so the plan must contain no shuffle exchange."""
    df = QS["sc_qc_metrics"](spark, SF_DIR)
    assert inspect.exchange_count(df) == 0


def test_sc_neighbors_broadcasts_corpus_index(spark):
    """sc_neighbors' corpus-as-index must broadcast — an all-pairs scoring
    cross join has no equi key, so the right shape is a
    BroadcastNestedLoopJoin with the index side as build (the matrix
    itself never shuffles for scoring) — and the top-k rank must prune
    map-side via WindowGroupLimit."""
    df = QS["sc_neighbors"](spark, SF_DIR)
    plan = inspect.executed_plan(df)  # AQE-final: the broadcast conversion
    assert "BroadcastNestedLoopJoin BuildRight" in plan, plan
    assert inspect.count_in_plan(df, "WindowGroupLimit", final=False) > 0


def test_nearest_centroid_broadcasts_stats_and_group_limits(spark):
    df = QS["embed_nearest_centroid"](spark, SF_DIR)
    plan = inspect.executed_plan(df)  # AQE-final: the broadcast conversion
    assert "BroadcastNestedLoopJoin BuildRight" in plan, "centroids must broadcast"
    assert inspect.count_in_plan(df, "WindowGroupLimit", final=False) > 0


def test_lateral_decorrelates_to_window_group_limit(spark):
    """r8: the LATERAL correlated top-k must decorrelate — a per-outer-row
    nested-loop re-execution would be a scale killer; the physical plan
    must carry the group-limit + join shape instead."""
    df = QS["lateral_topk_per_customer"](spark, SF_DIR)
    plan = inspect.formatted_plan(df)
    assert "WindowGroupLimit" in plan, plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_recursive_spine_uses_union_loop(spark):
    """r8: WITH RECURSIVE plans as a UnionLoop (one row per iteration over
    an O(days) spine), and the daily aggregate still partial-aggregates."""
    df = QS["recursive_day_spine"](spark, SF_DIR)
    plan = inspect.formatted_plan(df)
    assert "UnionLoop" in plan, plan
    assert "HashAggregate" in plan


def test_window_median_single_exchange(spark):
    """r8: the trailing-median window is one partition-keyed exchange —
    no extra shuffle, no whole-partition percentile buffering."""
    df = QS["window_median_trailing"](spark, SF_DIR)
    assert inspect.exchange_count(df) == 1


def test_ntile_approx_has_no_global_sort(spark):
    """r10: the approx-cut-point NTILE swap exists precisely to kill the
    single-partition window sort — its plan must carry NO window and NO
    range-partitioning exchange at any size, and the 1-row cut table
    must come back as a broadcast."""
    df = QS["ntile_customer_spend_approx"](spark, SF_DIR)
    plan = inspect.formatted_plan(df)
    assert "Window" not in plan, plan
    assert "rangepartitioning" not in plan.lower(), plan
    assert inspect.uses_broadcast_join(df), "cut table must broadcast"


def test_ntile_approx_assign_matches_exact_ntile_closely(spark):
    """The production assign path: every customer gets one decile 1..10,
    and the assignment agrees with the exact NTILE(10) label for the
    overwhelming majority of customers (only sketch-boundary rows may
    differ — bounded by the same 2εn rank-error argument the oracle
    flags encode)."""
    from single_cell_experiments_spark.operators.relational import (
        ntile_approx_assign,
    )

    approx = {
        r.c_custkey: r.decile
        for r in ntile_approx_assign(spark, SF_DIR).collect()
    }
    exact = {
        r.c_custkey: r.decile
        for r in QS["ntile_customer_spend"](spark, SF_DIR).collect()
    }
    assert set(approx) == set(exact)
    assert all(1 <= d <= 10 for d in approx.values())
    n = len(exact)
    mismatched = sum(1 for k in exact if approx[k] != exact[k])
    assert mismatched <= 2 * 0.01 * n * 9 + 18, (mismatched, n)


def test_dedup_pipeline_reuses_exchanges(spark):
    """r10: the composed curation pipeline shares work across its tiers —
    the AQE-final plan must reuse at least one exchange (the exact-rep
    aggregate feeds both the doc-mapping join and the normalize tier),
    and the expensive LSH self-join must not reappear per consumer."""
    df = QS["dedup_pipeline_verdict"](spark, SF_DIR)
    assert inspect.count_in_plan(df, "ReusedExchange", final=True) >= 1


def test_distinct_daily_fusion_small_input_no_exchange(spark):
    """r11: below catalog.FUSE_SINGLE_TASK_MAX_BYTES the distinct
    aggregate is the fully-fused single-task plan — ZERO exchanges, no
    Expand: scan + partial + final aggregation in one stage (the
    135-vs-158 ms quiet / 297-vs-460 ms loaded interleaved result)."""
    df = QS["distinct_users_daily"](spark, SF_DIR)
    plan = inspect.formatted_plan(df)
    assert "Expand" not in plan, plan
    assert inspect.exchange_count(df) == 0, plan
    assert "Coalesce 1" in plan or "Coalesce(1" in plan or "Coalesce" in plan, plan


def test_distinct_daily_mid_input_uses_single_exchange(spark, monkeypatch):
    """Between the fusion gate and _DISTINCT_SMALL_INPUT_MAX_BYTES the
    r10 plan stands: ONE group-key exchange, no Expand duplication."""
    import single_cell_experiments_spark.catalog as catalog
    from single_cell_experiments_spark.registry import fresh_fn

    monkeypatch.setattr(catalog, "FUSE_SINGLE_TASK_MAX_BYTES", 0)
    df = fresh_fn("distinct_users_daily")(spark, SF_DIR)
    plan = inspect.formatted_plan(df)
    assert "Expand" not in plan, plan
    assert inspect.exchange_count(df) == 1, plan


def test_distinct_daily_large_input_keeps_expand_plan(spark, monkeypatch):
    """Above both gates the two-phase partial-distinct (Expand) plan must
    come back — the map-side-combine shape that holds at 100 TB."""
    import single_cell_experiments_spark.catalog as catalog
    from single_cell_experiments_spark.operators import relational
    from single_cell_experiments_spark.registry import fresh_fn

    monkeypatch.setattr(catalog, "FUSE_SINGLE_TASK_MAX_BYTES", 0)
    monkeypatch.setattr(relational, "_DISTINCT_SMALL_INPUT_MAX_BYTES", 0)
    df = fresh_fn("distinct_users_daily")(spark, SF_DIR)
    plan = inspect.formatted_plan(df)
    assert "Expand" in plan or inspect.exchange_count(df) >= 2, plan


def test_single_task_fusion_small_inputs_no_exchange(spark):
    """r11: the three other fused headliners ride zero exchanges below
    the catalog gate — scan + both agg phases one stage."""
    for name in ("tumbling_window_events", "doc_text_stats",
                 "embed_centroid_per_label"):
        df = QS[name](spark, SF_DIR)
        plan = inspect.formatted_plan(df)
        assert inspect.exchange_count(df) == 0, (name, plan)


def test_single_task_fusion_large_inputs_keep_parallel_plan(spark, monkeypatch):
    """Above the gate the fusion hint must vanish: each query keeps its
    parallel exchange plan (the shape that holds at 100 TB)."""
    import single_cell_experiments_spark.catalog as catalog
    from single_cell_experiments_spark.registry import fresh_fn

    monkeypatch.setattr(catalog, "FUSE_SINGLE_TASK_MAX_BYTES", 0)
    for name in ("tumbling_window_events", "doc_text_stats",
                 "embed_centroid_per_label"):
        df = fresh_fn(name)(spark, SF_DIR)
        plan = inspect.formatted_plan(df)
        assert inspect.exchange_count(df) >= 1, (name, plan)


def test_bitmap_distinct_three_level_rollup_no_expand(spark):
    """The bitmap rollup must be the three-level partial-agg shape —
    (priority, mon, bucket) construct → (priority, bucket) OR-merge →
    (priority) count-sum, one exchange per grain — and never the
    Expand-based distinct-expansion COUNT(DISTINCT) plan."""
    df = QS["bitmap_exact_distinct_customers"](spark, SF_DIR)
    assert inspect.exchange_count(df) == 3, inspect.formatted_plan(df)
    assert inspect.count_in_plan(df, "Expand") == 0
    assert inspect.count_in_plan(df, "partial_bitmap_or_agg") >= 1  # map-side merge


def test_interval_overlap_is_equi_join_not_bnlj(spark):
    """The bucket-grid rewrite must surface as an equi-join on the hour
    cell — a BroadcastNestedLoop/cartesian fallback means the two-sided
    range predicate leaked into the join condition."""
    df = QS["interval_overlap_pairs"](spark, SF_DIR)
    plan = inspect.formatted_plan(df)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_surprisal_df_join_is_broadcast(spark):
    """The tf⋈df join must broadcast its small side (whichever AQE picks —
    both are O(vocab)-bounded), never sort-merge the doc-term stream.
    Asserted on the raw AQE-final plan: ``inspect.executed_plan``'s
    Initial-Plan split truncates at the scalar SUBQUERY's own embedded
    '== Initial Plan ==' marker, hiding the join from the helper."""
    df = QS["doc_surprisal_score"](spark, SF_DIR)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==", 1)[0] if "Subquery" not in plan else plan
    assert "BroadcastHashJoin" in final
    assert "SortMergeJoin" not in plan.split("== Initial Plan ==", 1)[0]


def test_zarr_pyds_one_partition_per_chunk(spark):
    """The Python DataSource must plan exactly one InputPartition per
    chunk object (the store's parallel grain)."""
    import os

    from single_cell_experiments_spark.sources.pyds import ZarrChunkReader

    # build the store via the registered roundtrip, then inspect planning
    QS["zarr_pyds_roundtrip"](spark, SF_DIR).limit(1).collect()
    import glob
    import hashlib
    import tempfile

    store = os.path.join(
        tempfile.gettempdir(),
        f"sce_zarr_pyds_{hashlib.md5(SF_DIR.encode()).hexdigest()[:8]}",
    )
    x_dir = os.path.join(store, "X")
    n_chunks = len(glob.glob(os.path.join(x_dir, "[0-9]*")))
    reader = ZarrChunkReader({"path": x_dir})
    assert n_chunks > 1
    assert len(reader.partitions()) == n_chunks


def test_gap_fill_linear_has_no_unbounded_following_frame(spark):
    """r11 stress finding: Spark evaluates an UnboundedFollowing window
    frame O(rows²) per partition (re-aggregates from each row to the
    partition end) — the 20× gap-fill grid sat in a single multi-minute
    window task.  The backward fill must stay the DESC running-frame
    formulation: only UNBOUNDED PRECEDING frames in the plan."""
    from single_cell_experiments_spark.registry import fresh_fn

    df = fresh_fn("gap_fill_user_linear")(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString().lower()
    assert "unboundedfollowing" not in plan, plan[:2000]
    assert "unboundedpreceding" in plan


def test_lsh_star_and_hirecall_stay_bucket_local(spark):
    """The r12 LSH variants must keep every pair-producing join keyed
    (bucket equi-joins / shingle hash joins) — no cartesian products or
    nested-loop fallbacks anywhere in the candidate generation."""
    for name in ("dedup_minhash_lsh_star", "dedup_minhash_lsh_hirecall",
                 "dedup_lsh_bucket_audit"):
        plan = inspect.executed_plan(QS[name](spark, SF_DIR))
        assert "CartesianProduct" not in plan, (name, plan)
        assert "BroadcastNestedLoopJoin" not in plan, (name, plan)

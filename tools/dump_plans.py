#!/usr/bin/env python
"""Dump AQE-final physical plans for the headline queries to PLANS.md —
the scale-posture evidence (pushdown, pruning, broadcast, group limits)
in reviewable form.  Regenerate after plan-affecting changes:

    python tools/dump_plans.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = (
    "q1_pricing_summary",
    "q3_join_topk",
    "window_rank",
    "topk_per_group",
    "join_asof_purchase_signup",
    "sc_scale",
    "sc_recipe_zheng17",
    "dedup_minhash_lsh",
    "knn_cosine_to_vec0",
    "tumbling_window_events",
    "join_range_bucketed",
    "exists_correlated_orders",
    "ann_ivf_probe",
    "gapfill_time_spine",
    "skew_salted_agg",
    "skew_salted_join",
    "watermark_late_drop",
    "knn_join_batch",
    "shard_pack_by_tokens",
    "upsert_merge_orders",
    "stream_join_click_purchase",
    "pagerank_dedup_graph",
    "decontaminate_ngram_overlap",
    "dedup_cluster_keeper",
    "dedup_cc_star",
    "crossdoc_ngram_share",
    "corpus_health_report",
    "window_lag_lead_events",
    "rollup_multigrain_events",
    "ann_recall_eval",
    "doc_repetition_stats",
    "mixture_resample_sources",
    "bm25_rank_docs",
    "funnel_view_click_purchase",
    "sessionize_events",
    "retention_cohorts",
    "sc_regress_out",
    "sc_rank_genes_groups",
    "sc_qc_metrics",
    "distinct_users_daily",
    "doc_chunk_windows",
    "doc_scrub_pii",
    "sc_neighbors",
    "sc_knn_clusters",
    "sc_neighbors_ivf_recall",
    "sc_pca_gram",
    "recursive_day_spine",
    "lateral_topk_per_customer",
    "window_median_trailing",
    "grouped_agg_pandas_wsum",
    "dedup_triangle_count",
    "embed_nearest_centroid",
    "dedup_fuzzy_prefix_pairs",
    "profile_orders_columns",
    "parquet_schema_evolution",
    "sample_weighted_es",
    "sc_matmul_coo",
    "dedup_containment",
    "stream_static_enrich",
    "event_disorder_profile",
    "variant_props_rollup",
    "sc_communities",
    "dedup_graph_communities",
    "sc_ivf_fine_recall",
    "ewma_user_value",
    "ntile_customer_spend",
    "sparse_cosine_pairs_tfidf",
    "event_type_transitions",
    "integrity_checksum_orders",
    "ntile_customer_spend_approx",
    "sc_communities_modularity",
    "zarr_v3_roundtrip",
    "dedup_pipeline_verdict",
    "zarr_v3_sharded_roundtrip",
    "gap_fill_user_hourly",
    "dedup_kcore",
    "gap_fill_user_linear",
    "bitmap_exact_distinct_customers",
    "hll_sketch_rollup_customers",
    "interval_overlap_pairs",
    "doc_surprisal_score",
    "binaryfile_blob_ingest",
    "zarr_pyds_roundtrip",
    "stream_left_join_unattributed",
    "scd2_point_in_time_purchases",
    # r11 additions
    "sc_communities_leiden",
    "zarr_pyds_write_roundtrip",
    "zarr_pyds_stream_roundtrip",
    "zarr_pyds_stream_write_roundtrip",
    "distinct_users_daily",
    "tumbling_window_events",
    "doc_text_stats",
    "embed_centroid_per_label",
    # r12 additions
    "dedup_lsh_bucket_audit",
    "dedup_minhash_lsh_star",
    "dedup_minhash_lsh_hirecall",
    "dedup_cluster_keeper_star",
    "dedup_pipeline_verdict_star",
    "zarr_pyds_v3_roundtrip",
    "zarr_pyds_v3_stream_roundtrip",
    "zarr_pyds_v3_write_roundtrip",
    "zarr_pyds_v3_stream_write_roundtrip",
    "zarr_v2_to_v3_migrate",
    "cms_word_freq",
    "hybrid_rank_rrf",
    "doc_bigram_lm_score",
    "events_interval_coalesce",
    "referential_integrity_audit",
    "twap_user_daily",
    "collocations_lift",
    # r13 additions (tenx_to_zarr_migrate / sc_neighbors_nnd* /
    # sc_spectral_layout are excluded: their plan-relevant work happens in
    # build-time materialized rounds or sink writes, so the final plan is a
    # scan — nothing reviewable; dedup_fuzzy_prefix_pairs re-dumps with its
    # new capped shape from its existing row above)
    "dedup_fuzzy_prefix_pairs_star",
    "ann_graph_search",
    "zarr_sparse_roundtrip",
    "zarr_obsm_roundtrip",
    "tenx_to_zarr_sparse_migrate",
    # r15 additions (zarr_csc/append roundtrips excluded like the other
    # sink-roundtrips: the final plan is a scan of the just-written store)
    "ann_ivfpq_search",
    "ann_ivfpq_rerank",
    "pack_token_sequences",
    "sc_pseudobulk",
    "sc_doublet_score",
    "trend_user_value",
    "q6_forecast_revenue",
    "q14_type_revenue_share",
    "mine_hard_negatives",
    "sc_batch_correct",
    "sc_batch_mixing",
    "multimodal_image_dhash_dedup",
    "multimodal_audio_fp_dedup",
)

#: The four size-gated single-task-fusion headliners (catalog.
#: FUSE_SINGLE_TASK_MAX_BYTES): dumped twice — once at the real gate
#: (fused at sf0.01) and once with the gate forced to 0 (the parallel
#: exchange plan every larger input gets), so the record shows BOTH
#: regimes of the adaptive choice.
FUSED = (
    "distinct_users_daily",
    "tumbling_window_events",
    "doc_text_stats",
    "embed_centroid_per_label",
)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    from single_cell_experiments_spark.plans.inspect import executed_plan
    from single_cell_experiments_spark.registry import queries
    from single_cell_experiments_spark.session import get_spark

    spark = get_spark(app_name="sce-plans", cpus=8)
    qs = queries()

    out = [
        "# PLANS — AQE-final physical plans of the headline queries",
        "",
        f"Generated by `tools/dump_plans.py` at `{sf_dir}`.  What to look",
        "for: `PushedFilters`/`ReadSchema` on every scan (pushdown +",
        "pruning), `BroadcastHashJoin`/`BroadcastNestedLoopJoin BuildRight`",
        "on dimension/scalar joins, `WindowGroupLimit` under top-k windows,",
        "`TakeOrderedAndProject` for global top-n, and the shuffle",
        "(`Exchange`) count per operator.  `tests/test_plans.py` asserts",
        "these properties; this file is the human-readable evidence.",
        "",
    ]
    for name in QUERIES:
        plan = executed_plan(qs[name](spark, sf_dir))
        out += [f"## {name}", "", "```", plan.rstrip(), "```", ""]

    # second pass: parallel regime of the fusion-gated headliners
    from single_cell_experiments_spark import catalog, registry

    catalog.FUSE_SINGLE_TASK_MAX_BYTES = 0
    registry._plan_cache.pop(spark, None)
    for name in FUSED:
        plan = executed_plan(registry.fresh_fn(name)(spark, sf_dir))
        out += [
            f"## {name} (gate=0 — the parallel plan past "
            "FUSE_SINGLE_TASK_MAX_BYTES)",
            "",
            "```",
            plan.rstrip(),
            "```",
            "",
        ]

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print(f"wrote PLANS.md ({len(QUERIES)} plans)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

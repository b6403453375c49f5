"""Generate docs/PLANS.md — physical-plan evidence for the headline
queries: which scan filters pushed down, which joins broadcast, where
top-k compiles to TakeOrderedAndProject / WindowGroupLimit, and the
whole-stage-codegen spans. Re-run after plan-affecting changes."""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ade_agente_documental_empresarial___miner_a_spark.session import get_spark  # noqa: E402

SHOW = [
    "k1_topk_search",
    "k3_topk_per_section",
    "e2_hierarchical_search",
    "t2_section_assign",
    "sim_knn_bruteforce",
    "sim_lsh_bucketed",
    "dedup_minhash_lsh",
    "dedup_lsh_verified",
    "dedup_ngram_jaccard",
    "sim_ivf_topk",
    "rel_q1_pricing",
    "rel_q3_shipping",
    "rel_q10_returned",
    "rel_window_running",
    "skew_salted_agg",
    "stream_tumbling_1h",
    "e1_ingest_chunks",
    "cur_decontaminate",
    "cur_pack_sequences",
    "cur_repetition_signals",
    "sim_quantized_topk",
    "sim_ivf_quantized",
    "rel_q4_priority",
    "rel_q18_large_orders",
    "rel_q19_disjunctive",
    "rel_q6_revenue_delta",
    "rel_sessionize",
    "dedup_paragraph",
    "cur_quality_gate",
    "stream_dedup",
    # round 4
    "rel_q13_custdist",
    "rel_q21_waiting",
    "rel_q2_min_price",
    "rel_q7_volume",
    "rel_q8_market_share",
    "rel_q9_profit",
    "rel_q15_top_supplier",
    "rel_q17_small_qty",
    "rel_q20_excess_shippers",
    "rel_q11_important_parts",
    "rel_q16_supplier_cnt",
    "sim_ivf_persisted",
    "chat_session_costs",
    "cur_source_quota",
    "cur_stratified_sample",
    "cur_length_batches",
    # round 4, second batch
    "rel_pivot_events",
    "rel_unpivot_events",
    "rel_grouping_sets",
    "sim_pq_adc_topk",
    "sim_rrf_fusion",
    "stream_cdc_latest",
    "stream_topk_trending",
    "cur_domain_mix",
    "text_tfidf_terms",
    "skew_salted_join_rev",
    "mm_phash_band_pairs",
    # round 4, third batch
    "dedup_substring",
    "mm_header_decode",
    "dedup_incremental",
    "text_normalize",
    "rel_cohort_retention",
    "rel_json_props",
    "stream_static_enrich",
    "graph_pagerank",
    "text_trigram_lm",
    "cur_corpus_funnel",
    # round 4, fourth batch
    "rel_weighted_median",
    "rel_zorder_keys",
    "cur_curriculum_phases",
    "rel_heavy_hitters_cms",
    "rel_asof_cogrouped",
    "dedup_containment",
    # round 4, fifth batch
    "emb_pca_power",
    "text_pmi_pairs",
    "stream_anomaly_hours",
    "rel_value_histogram",
    "rel_gap_fill",
    "rel_ewma_hourly",
    "sim_ivf_recall",
    # round 5: reshaped driver-red pair + certified-early ANN evals
    "emb_label_centroids",
    "sim_ivf_ndcg",
    "sim_mmr_rerank",
    "sim_ivf_filtered",
    # round 4, sixth batch
    "func_udtf_termvec",
    "rel_lateral_topk",
    "rel_variant_props",
    "agg_gini_nation",
    "dedup_semantic",
    "stream_tws_type_counts",
    # round 4, seventh batch
    "rel_range_frame",
    "rel_column_stats",
    "rel_null_semantics",
    "rel_recursive_ancestors",
    "s11_python_datasource",
    "rel_dpp_join",
    # round 4, eighth batch
    "text_arrow_bytestats",
    "text_arrow_lang_rollup",
    # round 4, ninth batch
    "rel_regression_moments",
    "rel_approx_percentile_contract",
    "rel_window_family2",
    "s12_xml_extract",
    "s13_schema_evolution",
    "rel_full_outer_family",
    "cur_expectations",
    "emb_matryoshka_eval",
    "cur_bpe_pair_stats",
    "rel_collation_ci",
    "rel_try_arithmetic",
    # round 4, eleventh/twelfth batches
    "func_hof_battery",
    "rel_calendar_fns",
    "rel_mode_median",
    "rel_chi2_cells",
    "dedup_representatives",
    "cur_vocab_coverage",
    "s14_python_ds_writer",
    "graph_triangles",
    "rel_merge_intervals",
    "rel_upsert_merge",
    # round 4, thirteenth batch
    "s15_dynamic_partition_overwrite",
    "cur_oversample_rare",
    "rel_mad_robust",
    "text_drift_terms",
    "dedup_lsh_recall",
    # round 4, fourteenth/fifteenth batches
    "graph_bfs_levels",
    "rel_skyline",
    "rel_hll_sketch_merge",
    "cur_perplexity_filter",
    "rel_bloom_runtime_filter",
    "rel_window_distinct_running",
    "s16_compaction",
    "cur_winsorize",
    # round 4, sixteenth/seventeenth batches
    "rel_bucketed_join",
    "stream_interval_join_outer",
    "func_regexp_battery",
    "rel_string_agg",
    "rel_higher_moments",
    "graph_sssp_bellman",
    # round 4, eighteenth..twenty-third batches
    "rel_incremental_mv",
    "s17_corrupt_records",
    "cur_gdpr_delete",
    "rel_scd2_pit_join",
    "cur_epoch_shuffle",
    "cur_mixture_weights",
    "rel_longest_streak",
    "rel_basket_pairs",
    "rel_equidepth_hist",
    "rel_multitouch_attribution",
    "emb_dim_stats",
    "rel_local_time_rollup",
    "rel_rolling_corr",
    "rel_time_to_convert",
    "s18_csv_interop",
    "cur_k_anonymity",
    "cur_release_manifest",
    "func_unicode_battery",
    # round 4, twenty-fourth..twenty-ninth batches
    "text_zipf_slope",
    "cur_group_kfold",
    "emb_hard_negatives",
    "rel_quantile_normalize",
    "emb_mips_vs_cosine",
    "rel_event_transitions",
    "cur_dataset_diff",
    "rel_nearest_event_join",
    "text_ngram_novelty",
    "text_compression_ratio",
    "rel_abtest_ztest",
    "text_sentence_stats",
    "text_set_similarity_battery",
    "cur_labeler_agreement",
    # round 4, thirty-first..thirty-ninth batches
    "rel_capped_running_sum",
    "rel_peak_concurrency",
    "rel_referential_audit",
    "text_script_mix",
    "text_lang_margin",
    "cur_bresenham_sample",
    "graph_reciprocity",
    "rel_multiband_counts",
    "s19_layout_migration",
    "cur_blocklist_filter",
    "text_readability_fk",
    "emb_training_triplets",
    "rel_order_lead_time",
    "rel_benford_audit",
    "text_template_families",
    "rel_price_volume_bridge",
    "dedup_continuation",
    "rel_max_drawdown",
    "cur_psi_sources",
    "rel_duplicate_payments",
    "rel_missing_sequence",
    "rel_growth_accounting",
    "s20_jsonl_gzip_roundtrip",
    "func_bitwise_battery",
    "rel_survival_km",
    "rel_cohort_ltv",
    "rel_abc_classification",
    "sim_ivf_ndcg",
    "rel_tiered_pricing",
    "cur_bitext_ratio_filter",
    "sim_mmr_rerank",
    "rel_purchase_dispersion",
    "rel_hhi_concentration",
    "cur_mix_entropy",
    "rel_cusum_changepoint",
    "text_term_burstiness",
    "emb_isotropy",
    "rel_seasonality_index",
]

MARKS = [
    "TakeOrderedAndProject",
    "WindowGroupLimit",
    "BroadcastHashJoin",
    "BroadcastNestedLoopJoin",
    "SortMergeJoin",
    "PushedFilters",
    "PartitionFilters",
    "HashAggregate",
    "AdaptiveSparkPlan",
]


def main() -> None:
    import importlib.util

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(root, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    qs = mod.queries()
    spark = get_spark("explain", shuffle_partitions=16)
    sf = "/root/testdata/sf0.01"

    lines = [
        "# Physical plans (generated by tools/explain_report.py at sf0.01)",
        "",
        "Per headline query: operator markers present in the executed plan,",
        "plus scan details (pushdown/pruning). Full `explain('formatted')`",
        "output is reproducible via the generator.",
        "",
    ]
    for name in SHOW:
        df = qs[name](spark, sf)
        # execute first: codegen spans (`*(n)` prefixes) and AQE's final
        # plan only exist after the job has run — the pre-execution string
        # reports 0 spans for everything (the round-1 artifact). collect()
        # finalizes THIS df's QueryExecution (a noop write would spawn a
        # separate one and leave this plan un-executed); results at sf0.01
        # are small.
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        present = [m for m in MARKS if m in plan]
        codegen = len(set(re.findall(r"\*\((\d+)\)", plan)))
        scans = re.findall(r"ReadSchema: ([^\n]+)", plan)
        pushed = re.findall(r"PushedFilters: (\[[^\]]*\])", plan)
        lines.append(f"## {name}")
        lines.append(f"- markers: {', '.join(present) or '(none)'}")
        lines.append(f"- whole-stage-codegen spans: {codegen}")
        for s in sorted(set(scans)):
            lines.append(f"- ReadSchema: `{s.strip()[:120]}`")
        for p in sorted(set(pushed)):
            if p != "[]":
                lines.append(f"- PushedFilters: `{p}`")
        lines.append("")
    out = os.path.join(root, "docs", "PLANS.md")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()

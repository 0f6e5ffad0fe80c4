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
#: LLM-data-pipeline extensions (49/50 green). Round 3 leads with
#: pagerank_bipartite (proving the oracle int128 fix), keeps the
#: verdict-named round-2 additions + the extended/array/function
#: surfaces, and ends with the 14 operators ADDED in round 3 so new
#: code never waits a round for its driver row. Queued for the r4
#: rotation — the EXACT 67 oracle-twinned queries with no driver row
#: in r1∪r2∪r3 (all local-green at three SFs; regenerate with
#: set(oracle_sql()) - set(CORRECTNESS_r0*.json) - set(PRIORITY)):
#: ab_test_ztest ann_pq_from_index ann_pq_topk anomaly_zscore
#: argmax_minby boolean_linreg_agg contamination_fraction
#: countmin_heavy_hitters crosslingual_pairs datetime_functions
#: distinct_projection dq_audit geo_grid_join gopher_rules
#: having_filter interval_join_events join_cardinality_probe
#: join_cross line_dedup_corpus line_dedup_from_index mad_outliers
#: math_functions multimodal_audio_segments
#: multimodal_decode_pipeline multimodal_frame_sample
#: ngram_novelty_rate null_handling path_transitions pct_of_total
#: pretrain_corpus_pipeline repetition_quality rolling_median
#: salted_agg scd2_pit_lookup seasonal_naive_mape snapshot_diff
#: stopword_pruned_corpus stream_static_join_batch_twin
#: string_agg_ordered text_tokens time_to_convert tpch_q10 tpch_q11
#: tpch_q12 tpch_q13 tpch_q14 tpch_q15 tpch_q16 tpch_q17 tpch_q18
#: tpch_q19 tpch_q20 tpch_q3 tpch_q4 tpch_q5 tpch_q6 tpch_q7
#: tpch_q8 tpch_q9 trend_forecast_linreg triangle_count
#: user_erasure_audit window_distinct_count window_fill_forward
#: window_range_rolling window_rolling_corr window_sliding
#: — plus the rows-only five (approx_distinct, hll_sketch_rollup,
#: percentile_approx_sketch, kmeans_embeddings, embedding_pca_power)
#: if slots remain.
PRIORITY: tuple[str, ...] = (
    # prove the r2 fix first
    "pagerank_bipartite",
    # round-2 additions never driver-checked (verdict-named)
    "ntile_rfm_scalable",
    "ewma_user_value",
    "histogram_equidepth",
    "curriculum_stages",
    "curation_funnel",
    "dedup_keep_best",
    "dedup_source_matrix",
    "dedup_embedding_lsh_pairs",
    "dedup_embedding_lsh_pairs_capped",
    "dedup_embedding_lsh_multiprobe",
    "ann_lsh_buckets",
    "mmr_diverse_topk",
    "levenshtein_nearest",
    # extended.py: joins / set ops / subqueries
    "join_left_outer",
    "join_full_outer",
    "asof_join",
    "range_join",
    "in_subquery",
    "not_in_subquery",
    "exists_correlated",
    "scalar_subquery",
    "merge_upsert",
    # extended.py + arrays.py: reshaping and function surfaces
    "pivot_wide",
    "unpivot_long",
    "cube_agg",
    "grouping_sets_agg",
    "array_functions",
    "higher_order_functions",
    "map_struct_functions",
    "posexplode_ordinal",
    "variant_extract",
    "string_functions",
    "regex_functions",
    "hash_functions",
    "bitwise_agg",
    # round-3 additions (new this round; driver-checked immediately)
    "pagerank_from_index",
    "decontaminate_bloom",
    "heavy_hitters_twopass",
    "cohort_retention",
    "scd2_dim_build",
    "er_blocked_pairs",
    "export_shards",
    "stream_dedup_vs_corpus",
    "conversion_funnel",
    "ivm_agg_delta",
    "window_rank_suite",
    "winsorized_mean",
    "cdc_latest_snapshot",
    "skew_profile",
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

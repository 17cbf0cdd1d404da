"""Query registry: every implemented operator from SURVEY.md §2 as a
(spark_builder, oracle_sql) pair.

Each entry's Spark callable takes (spark, sf_dir) and returns a DataFrame;
``oracle`` is the DuckDB-equivalent ANSI SQL over the same parquet tables
(None for non-SQL-expressible ops -> driver records rows-only check).
Column names and rounding are aligned on both sides so the driver's
order-insensitive value-hash matches.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from electricity_forecast_pipeline_airflow_k8s_spark.sources.tables import load_table


@dataclass
class Query:
    build: Callable[[SparkSession, str], DataFrame]
    oracle: str | None = None
    tags: tuple[str, ...] = field(default_factory=tuple)


_REGISTRY: dict[str, Query] = {}

# The driver verifies a bounded prefix of the registry (50 queries in
# registration order per round). Round-5 window, by evidence priority:
# (a) new round-5 queries (never driver-proven — first-proof beats
# freshness; prepended as they land), (b) the 10 late-round-4 queries that
# missed the r4 window (also never proven), (c) the 10 queries whose last
# driver green is r1 (displaced from the r4 window by first-proof items),
# (d) as much of the 28-query r2-evidence cohort as fits. Whatever r2
# cohort overflows leads round 6, keeping every query's driver-evidence
# age bounded at ~3 rounds.
_VERIFICATION_WINDOW: tuple[str, ...] = (
    # (a) new in round 5 — never driver-proven (newest first: these have
    # never had a driver row at all, so they take the head of the cut)
    "ts_croston",
    "sess_absorbing_markov",
    "text_oov_rate",
    "val_t_closeness",
    "layout_compaction_plan",
    "graph_degree_powerlaw",
    "rel_largest_remainder_alloc",
    "ts_max_drawdown",
    "ts_variance_ratio",
    "ts_pacf",
    "graph_reciprocity",
    "rel_holiday_lift",
    "text_negative_sampling_dist",
    "rel_discount_elasticity",
    "ts_intermittency_stats",
    "text_boilerplate_share",
    "val_duplicate_payments",
    "text_code_detect_stats",
    "rel_cdf_normalize",
    "ts_forecast_ensemble",
    "mm_audio_frame_energy",
    "val_k_anonymity",
    "sample_curriculum_order",
    "text_tokenizer_fertility",
    "val_median_of_means",
    "val_key_skew_report",
    "val_join_cardinality",
    "text_langid_confusion",
    "sess_lifecycle_states",
    "graph_modularity",
    "sess_next_pred_accuracy",
    "sample_token_budget_plan",
    "emb_kmeans_step",
    "ts_spectral_flatness",
    "val_cramers_v",
    "rel_price_volume_mix",
    "rel_bitmap_overlap",
    "ts_granger_lag1",
    "rel_km_repurchase",
    "ts_hurst_rs",
    "ts_pinball_loss",
    "rel_decile_lift",
    "ts_ljung_box",
    "sess_entropy_rate",
    "sim_topk_hamming",
    "val_volume_anomaly_days",
    "ts_missing_block_report",
    "rel_purchase_gap_stats",
    "sess_touch_attribution",
    "rel_abc_classification",
    "ts_w1_drift",
    "stream_hopping_topk",
    "text_chunk_overlap",
    "ts_theilsen_trend",
    "ts_gap_fill_interp",
    "ts_spectral_daily_strength",
    "rel_woe_iv",
    "sess_pattern_funnel",
    "graph_kcore",
    "text_setsim_prefix_join",
    "rel_max_concurrent_intervals",
    "text_cms_freq_est",
    "rel_rfm_segments_scale",
    "rel_exact_quantiles_scale",
    "rel_weighted_quantiles_scale",
    "text_heavy_hitters",
    "rel_interval_union_days",
    "ts_rolling_median_7d",
    "val_winsorized_stats",
    "tpch_small_qty_revenue",
    "tpch_disjunctive_revenue",
    "tpch_sole_supplier_orders",
    "ts_acf",
    "ts_rolling_z_anomaly",
    "ts_value_histogram",
    "ts_stl_seasonal",
    "rel_window_count_distinct",
    "rel_corr_covar",
    "rel_merge_upsert",
    "sim_recall_eval",
    "text_bm25_topk",
    "stream_stream_join",
    "val_benford_digits",
    "rel_skyline_pareto",
    "sess_markov_transitions",
    "text_zipf_slope",
    "sample_poisson_bootstrap",
    "ts_holt_winters",
    "sess_path_topk",
    "sample_class_balance",
    "rel_hll_mergeable",
    "rel_tombstone_read",
    "ts_hierarchical_reconcile",
    "rel_salted_skew_join",
    "sim_halfdim_overlap",
    "stream_join_windowed_attribution",
    "val_referential_integrity",
    "val_pk_uniqueness",
    "emb_mahalanobis_outliers",
    "rel_asof_nearest",
    "ts_permutation_entropy",
    "text_sparse_cosine_pairs",
    "ts_xcorr_click_purchase",
    "val_outlier_consensus",
    "sess_conversion_latency",
    "ts_peak_stats",
    "ts_load_factor",
    "rel_order_value_gini",
    "dedup_lsh_bucket_histogram",
    "dedup_lsh_recall_eval",
    "graph_pagerank",
    "graph_triangle_count",
    "layout_zorder_locality",
    "rel_equidepth_histogram",
    "stream_upsert_replay_state",
    "sess_cogroup_hour_corr",
    "ts_time_weighted_avg",
    "ts_minmax_downsample",
    "text_pmi_source_terms",
    # (b) late round-4 additions that missed the r4 window — never proven
    "ts_cusum_changepoint",
    "sess_retention_cohorts",
    "rel_variant_props",
    "rel_lateral_explode",
    "rel_null_safe_join",
    "ts_week_spine_rcte",
    "val_checksum_reconciliation",
    "ts_seasonal_naive_error",
    "sample_weighted_topk",
    "text_pack_chunks",
    # (c) last driver-green in r1
    "rel_date_functions",
    "rel_events_by_segment",
    "rel_part_brand_stats",
    "rel_promo_share",
    "rel_regex_extract",
    "rel_set_ops",
    "rel_string_functions",
    "rel_topk_orders",
    "rel_union_pages",
    "rel_window_analytic",
    # (d) last driver-green in r2
    "dedup_ngram_jaccard_pairs",
    "dedup_simhash_codes",
    "dedup_tokenset_groups",
    "rel_math_functions",
    "sim_topk_lsh",
    "stream_windowed_stats",
    "text_fingerprint",
    "text_lang_id",
    "text_length_profile",
    "text_quality_filter_stats",
    "text_quality_score",
    "text_tfidf_top_terms",
    "text_token_stats",
    "text_top_tokens",
    "tpch_idle_rich_customers",
    "tpch_min_balance_supplier",
    "tpch_nation_volume",
    "tpch_part_supplier_counts",
    "tpch_significant_parts",
    "tpch_top_supplier",
    "ts_hour_coverage",
    "ts_ks_drift",
    "ts_scaled_values",
    "ts_scaler_params",
    "ts_tail_window",
    "ts_window_counts",
    "val_domain_violations",
    "val_extreme_gate",
    # Round-6 rotation TODO: 45 never-driver-proven queries now lead the
    # window (the 19 latest-batch additions — val_median_of_means through
    # rel_km_repurchase — plus the 26 earlier round-5 ones), so the
    # driver's 50-query cut covers them plus the next ~5 rows. Round 6
    # should promote whatever it adds, then the overflow (graph_kcore
    # onward), then the late-r4 rows (ts_cusum_changepoint onward), then
    # the displaced r1 cohort, then the remaining r2 cohort, then start
    # re-proving the oldest r3 greens.
)


def register(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        _REGISTRY[name] = Query(fn, oracle, tags)
        return fn

    return deco


def registry() -> dict[str, Query]:
    _load_all()
    ordered = {n: _REGISTRY[n] for n in _VERIFICATION_WINDOW if n in _REGISTRY}
    ordered.update((n, q) for n, q in _REGISTRY.items() if n not in ordered)
    return ordered


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.build for name, q in registry().items()}


def oracle_sql() -> dict[str, str]:
    return {name: q.oracle for name, q in registry().items() if q.oracle is not None}


def _load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    import electricity_forecast_pipeline_airflow_k8s_spark.querydefs  # noqa: F401


def table(spark: SparkSession, name: str, sf_dir: str) -> DataFrame:
    return load_table(spark, name, sf_dir)

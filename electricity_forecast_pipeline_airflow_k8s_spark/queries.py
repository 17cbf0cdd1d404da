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
# registration order per round). Round-6 window: the 11 new round-6
# queries first (never driver-proven), then the 4 whose implementations
# changed this round (stale evidence: layout_zorder_locality,
# rel_equidepth_histogram, ml_hpo_best_trials, quality_profile_approx),
# then the never-proven backlog (123 queries after r1+r2+r3+r5
# evidence; no r04 artifacts exist). The ~88 overflow rows lead round 7
# (regenerate with tools/rotate_window.py); once the backlog clears,
# rotation resumes oldest-evidence-first (r1 cohort, then r2, r3, r5).
_VERIFICATION_WINDOW: tuple[str, ...] = (
    # new round-6 queries (never driver-proven)
    "text_bpe_merge_step",
    "ts_sax_motifs",
    "dedup_winnow_shared_spans",
    "sess_window_funnel",
    "val_mutual_information",
    "graph_sssp_weighted",
    "ts_psi_weekly_trend",
    "emb_cosine_pair_histogram",
    "val_simpson_slope_reversal",
    "mm_phash_dup_groups",
    "ts_daily_profile_motifs",
    "sample_group_kfold",
    "sess_interarrival_burstiness",
    "emb_label_separability",
    "dedup_cross_source_leakage",
    # round-6 semantic changes first: these had prior driver evidence but
    # their implementations changed this round (scale-fixed plans; the two
    # rows-only -> oracle conversions), so the old evidence is stale
    "layout_zorder_locality",
    "rel_equidepth_histogram",
    "ml_hpo_best_trials",
    "quality_profile_approx",
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
    "stream_upsert_replay_state",
    "sess_cogroup_hour_corr",
    "ts_time_weighted_avg",
    "ts_minmax_downsample",
    "text_pmi_source_terms",
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
    "val_mad_outliers",
    "inc_agg_merge",
    "val_drift_chi2",
    "val_monotonic_event_ids",
    "graph_link_prediction",
    "graph_bfs_reachability",
    "graph_assortativity",
    "rel_ntile_deciles",
    "rel_cohort_ltv",
    "rel_basket_lift",
    "rel_rfm_segments",
    "rel_supplier_hhi",
    "stream_quality_counts",
    "stream_static_enrich",
    "sess_dau_wau",
    "sess_shapley_attribution",
    "ts_pi_coverage",
    "ts_load_profile_how",
    "ts_ramp_rate_stats",
    "ts_load_duration_curve",
    "ts_cvar_ramp",
    "text_pii_redaction",
    "emb_norm_stats",
    "sample_stratified_topk",
    "text_packing_estimate",
    "text_ngram_novelty",
    "sample_split_assign",
    "text_para_dedup",
    "mm_frame_sample",
    "dedup_semantic_clusters",
    "dedup_simhash_neardup_pairs",
    "emb_dim_stats",
    "text_bigram_lm_score",
    "emb_quantize_int8",
    "emb_top_pc_power_iteration",
    "emb_kcenter_seeds",
    "emb_contrastive_triplets",
    "sample_temperature_mix",
    "text_ttr_by_source",
    "tpch_discount_revenue",
    "tpch_market_share",
    "tpch_cust_order_dist",
    "ts_ewma",
    "ts_gap_fill_locf",
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

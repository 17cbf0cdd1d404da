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
# registration order per round). Round 1 covered the relational +
# validation families; round 2 the extension operators (text/dedup/
# similarity), TPC-H SQL, time-series prep and streaming. Round 3 closes
# the evidence ledger: (a) the three queries that crashed on the
# TIMESTAMP_NTZ loader regression -- never driver-green before -- lead;
# (b) the five queries that sat outside both prior windows; (c) every
# query whose code or oracle changed this round (sha256 multimodal
# contract, approx error-envelope contract, scoped-cache dedup pipeline,
# new scale-contract); the remaining slots re-prove one or two anchors
# per family so a cross-family regression cannot hide.
_VERIFICATION_WINDOW: tuple[str, ...] = (
    # (a) loader-regression casualties: oldest open items, never green
    "quality_profile",
    "val_gap_stats",
    "sess_user_sessions",
    # (b) never inside a verification window before round 3
    "quality_profile_approx",
    "text_repetition_stats",
    "text_pii_stats",
    "sample_mix_sources",
    "dedup_contamination_check",
    # (c) changed this round -- new or upgraded oracles / cache scoping
    "quality_profile_scale_contract",
    "mm_decode_features",
    "approx_distinct_and_quantiles",
    "dedup_minhash_lsh_pairs",
    "dedup_clusters",
    # (d) new operators this round
    "ts_calendar_features",
    "ts_backtest_folds",
    "text_entropy_stats",
    "tpch_returned_items",
    "emb_centroid_assign",
    "stream_dedup_counts",
    "dedup_keep_best",
    # family anchors: re-prove a spread of round-1/2 greens
    "val_null_counts",
    "val_outlier_rows",
    "sess_funnel_counts",
    "ml_linreg_trend",
    "rel_pricing_summary",
    "rel_star_revenue",
    "rel_topk_per_group",
    "rel_asof_click_before_purchase",
    "rel_window_running",
    "rel_monthly_revenue_growth",
    "tpch_large_orders",
    "tpch_product_profit",
    "ts_split_counts",
    "ts_sequence_windows",
    "ts_resample_hourly",
    "ts_psi_drift",
    "ts_resample_15min",
    "stream_session_stats",
    "scd2_user_type_versions",
    "scd2_point_in_time",
    "rel_unpivot_measures",
    "text_bpe_token_estimate",
    "text_winnow_fingerprints",
    "dedup_exact_stats",
    "rel_salted_skew_stats",
    "sim_topk_bruteforce",
    "text_fuzzy_prefix_pairs",
    "sim_topk_ivf",
    "emb_neardup_pairs",
    "ml_invariants",
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

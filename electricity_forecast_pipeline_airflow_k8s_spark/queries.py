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
# registration order per round). Round 1 covered the first 50 (relational +
# validation families, all green after the dtype fixes); this round the
# prefix rotates to the families with no driver evidence yet -- extension
# operators (text/dedup/similarity/multimodal), TPC-H SQL, time-series
# prep, streaming -- plus every round-1 hash-fail whose oracle was fixed,
# so that across rounds all registered queries accumulate driver-green
# evidence.
_VERIFICATION_WINDOW: tuple[str, ...] = (
    # round-1 hash-fails, oracles fixed (dtype convention) -- re-prove
    "quality_profile",
    "val_null_counts",
    "val_domain_violations",
    "val_extreme_gate",
    "val_gap_stats",
    "sess_user_sessions",
    "rel_math_functions",
    "approx_distinct_and_quantiles",  # round-1 canonicalizer crash, flattened
    "rel_star_revenue",  # broadcast strategy changed -- re-prove
    # streaming
    "stream_windowed_stats",
    # text analysis
    "text_token_stats",
    "text_quality_score",
    "text_lang_id",
    "text_fingerprint",
    "text_quality_filter_stats",
    "text_length_profile",
    "text_top_tokens",
    "text_tfidf_top_terms",
    # deduplication
    "dedup_exact_stats",
    "dedup_tokenset_groups",
    "dedup_minhash_lsh_pairs",
    "dedup_ngram_jaccard_pairs",
    "dedup_simhash_codes",
    "dedup_clusters",
    # similarity search / embeddings
    "sim_topk_bruteforce",
    "sim_topk_lsh",
    "sim_topk_ivf",
    "emb_neardup_pairs",
    # multimodal plumbing
    "mm_decode_features",
    # TPC-H-style SQL
    "tpch_min_balance_supplier",
    "tpch_significant_parts",
    "tpch_top_supplier",
    "tpch_large_orders",
    "tpch_part_supplier_counts",
    "tpch_nation_volume",
    "tpch_product_profit",
    "tpch_idle_rich_customers",
    # time-series prep
    "ts_split_counts",
    "ts_window_counts",
    "ts_sequence_windows",
    "ts_tail_window",
    "ts_scaler_params",
    "ts_scaled_values",
    "ts_resample_hourly",
    "ts_psi_drift",
    "ts_ks_drift",
    "ts_hour_coverage",
    # ML edge: shape/split/window invariants of the REAL grouped-ML
    # pipeline, oracle-checked (the weights themselves are no_oracle and
    # were rows-only-checked in round 1; quality_profile_approx is pinned
    # exact-equal to the oracle-checked flagship by pytest, so it yields
    # its window slot to oracle-backed queries)
    "ml_invariants",
    # LLM token budgeting + rolling-hash fingerprinting (new this round)
    "text_bpe_token_estimate",
    "text_winnow_fingerprints",
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

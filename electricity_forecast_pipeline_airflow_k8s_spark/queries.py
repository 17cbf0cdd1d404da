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


def register(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        _REGISTRY[name] = Query(fn, oracle, tags)
        return fn

    return deco


def registry() -> dict[str, Query]:
    _load_all()
    return _REGISTRY


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.build for name, q in registry().items()}


def oracle_sql() -> dict[str, str]:
    return {name: q.oracle for name, q in registry().items() if q.oracle is not None}


def _load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    import electricity_forecast_pipeline_airflow_k8s_spark.querydefs  # noqa: F401


def table(spark: SparkSession, name: str, sf_dir: str) -> DataFrame:
    return load_table(spark, name, sf_dir)

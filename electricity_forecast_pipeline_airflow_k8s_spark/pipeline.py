"""End-to-end job assembly (SURVEY §3.1 re-design): the Airflow DAG's
extract -> validate -> summarize -> cleanup task chain collapses into one
Spark application with three actions; XComs become return values; any
scheduler (Airflow per BASELINE.json's approach) owns only the cron
trigger.

Reference flow: `core/airflow_dag.py:778`
    extract_data >> validate_data >> data_quality_summary >> ... >>
    cleanup_old_files
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from electricity_forecast_pipeline_airflow_k8s_spark.ml.forecast import (
    fit_per_group,
    forecast_rows,
    predict_per_group,
)
from electricity_forecast_pipeline_airflow_k8s_spark.ml.metrics import forecast_metrics
from electricity_forecast_pipeline_airflow_k8s_spark.operators.scaling import (
    apply_minmax,
    fit_minmax,
    inverse_minmax,
)
from electricity_forecast_pipeline_airflow_k8s_spark.operators.timeseries import (
    chronological_split,
    sequence_windows,
    tail_window,
)
from electricity_forecast_pipeline_airflow_k8s_spark.operators.validation import (
    ValidationReport,
    validate,
)
from electricity_forecast_pipeline_airflow_k8s_spark.sources.normalize import (
    normalize_readings,
)
from electricity_forecast_pipeline_airflow_k8s_spark.sources.snapshots import (
    apply_retention,
    write_snapshot,
)


@dataclass
class PreparationResult:
    raw_path: str
    validated_path: str | None
    report: ValidationReport
    record_count: int


def run_preparation(
    spark: SparkSession,
    raw: DataFrame,
    root: str,
    run_ts: str | None = None,
    retention_keep: int = 10,
    fail_on_errors: bool = True,
) -> PreparationResult:
    """extract->validate->persist->cleanup as one Spark app.

    Mirrors `core/airflow_dag.py:87-225,570-631`: raw snapshot, validation
    (raising on errors like the DAG's task failure), validated snapshot +
    JSON report, then retention. Storage is Parquet snapshots instead of
    CSV objects (SURVEY §4.2)."""
    normalized = normalize_readings(raw)
    raw_path = write_snapshot(normalized, root, "raw", run_ts)

    report = validate(normalized)
    validated_path = None
    if report.is_valid:
        validated_path = write_snapshot(normalized, root, "processed", run_ts)
    n = report.stats["total_records"]

    # report JSON beside the snapshots (reference: `core/airflow_dag.py:186-197`)
    report_df = spark.createDataFrame(
        [(json.dumps(report.as_dict()),)], "report string"
    ).coalesce(1)
    write_snapshot(report_df, root, "reports", run_ts)

    for prefix in ("raw", "processed", "reports"):
        apply_retention(spark, root, prefix, keep=retention_keep)

    if fail_on_errors and not report.is_valid:
        raise ValueError(f"validation failed: {report.errors}")
    return PreparationResult(raw_path, validated_path, report, n)


@dataclass
class TrainingResult:
    params: DataFrame
    metrics: dict[str, Any]
    forecasts: DataFrame


def run_training(
    spark: SparkSession,
    readings: DataFrame,
    lookback: int = 168,
    horizon: int = 24,
    top_region_only: bool = True,
    fit_on_train_only: bool = False,
    alpha: float = 1.0,
) -> TrainingResult:
    """The Kubeflow training pipeline (SURVEY §3.2) as DataFrame stages:
    region select (A12) -> minmax scale (U3; full-series fit replicates the
    reference's leakage, `core/kubeflow_pipeline.py:108-109`, unless
    fit_on_train_only) -> chronological split (W4) -> windows (W3) ->
    per-group fit/eval (U4/U5) -> inverse-scaled forecast."""
    if top_region_only:
        top = (
            readings.groupBy("respondent")
            .count()
            .orderBy(F.desc("count"), "respondent")
            .limit(1)
        )
        readings = readings.join(F.broadcast(top.select("respondent")), "respondent")

    split = chronological_split(readings)
    fit_src = split.filter(F.col("split") == "train") if fit_on_train_only else split
    params_mm = fit_minmax(fit_src)
    scaled = apply_minmax(split, params_mm)

    wins = sequence_windows(
        scaled,
        value_col="value_scaled",
        lookback=lookback,
        horizon=horizon,
        extra_partition_cols=("split",),
    )
    model = fit_per_group(wins, lookback=lookback, horizon=horizon, alpha=alpha)

    test = wins.filter(F.col("split") == "test").select("respondent", "x", "y")
    preds = predict_per_group(test, model)
    pairs = preds.select(
        "respondent", F.explode(F.arrays_zip("y", "forecast")).alias("z")
    ).select(
        "respondent",
        F.col("z.y").alias("actual"),
        F.col("z.forecast").alias("predicted"),
    )
    m = forecast_metrics(pairs).collect()
    metrics = (
        {"n": m[0]["n"], "rmse": m[0]["rmse"], "mape": m[0]["mape"], "mae": m[0]["mae"]}
        if m and m[0]["n"]
        else {"n": 0, "rmse": None, "mape": None, "mae": None}
    )

    # collect_list has no ordering guarantee after a shuffle; sort (ts, v)
    # structs then project to keep the window chronological
    latest = (
        tail_window(scaled, n=lookback)
        .groupBy("respondent")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("period", "value_scaled"))
            ).alias("pairs")
        )
        .select(
            "respondent",
            F.transform("pairs", lambda p: p.getField("value_scaled")).alias("x"),
        )
        .filter(F.size("x") >= lookback)
        .select("respondent", F.slice("x", -lookback, lookback).alias("x"))
    )
    fc = forecast_rows(predict_per_group(latest, model))
    fc = inverse_minmax(
        fc.withColumnRenamed("predicted_load", "value_scaled"),
        params_mm,
        out_col="predicted_load",
    ).select("respondent", "hour", "predicted_load")
    return TrainingResult(model, metrics, fc)

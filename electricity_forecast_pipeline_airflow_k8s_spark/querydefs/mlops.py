"""ML-edge queries (SURVEY §2.10 U4/U5, §2.4 A16): per-group train /
forecast / metrics over the events series. Non-SQL-expressible (linear
algebra inside applyInPandas) -> rows-only driver checks; invariants are
pinned by tests/test_ml.py."""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from electricity_forecast_pipeline_airflow_k8s_spark.ml.forecast import (
    fit_per_group,
    forecast_rows,
    predict_per_group,
)
from electricity_forecast_pipeline_airflow_k8s_spark.ml.metrics import forecast_metrics
from electricity_forecast_pipeline_airflow_k8s_spark.operators.timeseries import (
    chronological_split,
    sequence_windows,
    tail_window,
)
from electricity_forecast_pipeline_airflow_k8s_spark.queries import register, table

L, H = 48, 12


def _windows(spark: SparkSession, sf_dir: str):
    ev = table(spark, "events", sf_dir).select(
        F.col("event_type").alias("respondent"),
        F.col("ts").alias("period"),
        F.col("event_id"),
        F.col("value"),
    )
    split = chronological_split(ev, tiebreak_cols=("event_id",))
    return sequence_windows(
        split,
        lookback=L,
        horizon=H,
        tiebreak_cols=("event_id",),
        extra_partition_cols=("split",),
    )


@register("ml_train_eval_metrics")  # rows-only: train->test metrics per group
def q_ml_train_eval(spark: SparkSession, sf_dir: str):
    wins = _windows(spark, sf_dir)
    params = fit_per_group(wins, lookback=L, horizon=H)
    test = wins.filter(F.col("split") == "test").select("respondent", "x", "y")
    preds = predict_per_group(test, params)
    pairs = preds.select(
        "respondent", F.explode(F.arrays_zip("y", "forecast")).alias("z")
    ).select(
        "respondent",
        F.col("z.y").alias("actual"),
        F.col("z.forecast").alias("predicted"),
    )
    m = forecast_metrics(pairs, group_cols=("respondent",))
    return m.select(
        "respondent",
        "n",
        F.round("rmse", 4).alias("rmse"),
        F.round("mape", 4).alias("mape"),
        F.round("mae", 4).alias("mae"),
    )


@register("ml_hpo_best_trials")  # rows-only: Katib-analog trial fan-out
def q_ml_hpo(spark: SparkSession, sf_dir: str):
    from electricity_forecast_pipeline_airflow_k8s_spark.ml.hpo import (
        best_trials,
        run_trials,
    )

    wins = _windows(spark, sf_dir)
    grid = {"hidden": [8, 16], "epochs": [5], "seed": [42]}
    metrics = run_trials(wins, grid)
    return best_trials(metrics).select(
        "respondent", "trial_id", "params", F.round("val_loss", 6).alias("val_loss")
    ).orderBy("respondent")


@register("ml_forecast_next")  # rows-only: latest-window forecast per group
def q_ml_forecast_next(spark: SparkSession, sf_dir: str):
    wins = _windows(spark, sf_dir)
    params = fit_per_group(wins, lookback=L, horizon=H)
    latest = tail_window(
        wins.filter(F.col("split") == "train"),
        group_col="respondent",
        ts_col="window_start",
        n=1,
    ).select("respondent", "x")
    out = forecast_rows(predict_per_group(latest, params))
    return out.select(
        "respondent", "hour", F.round("predicted_load", 4).alias("predicted_load")
    ).orderBy("respondent", "hour")

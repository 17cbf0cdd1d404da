"""Forecast metrics as DataFrame aggregations (SURVEY §2.4 A16).

RMSE = sqrt(mean((y - yhat)^2)); MAPE = mean(|y - yhat| / (|y| + eps)) * 100
-- the reference's manual formulas (`core/model.py:270-279`,
`core/kubeflow_pipeline.py:311-312`). Computed over exploded
(actual, predicted) pairs; per-group or global."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EPS = 1e-8  # core/model.py:277


def forecast_metrics(
    df: DataFrame,
    actual_col: str = "actual",
    pred_col: str = "predicted",
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    a, p = F.col(actual_col), F.col(pred_col)
    aggs = [
        F.count(F.lit(1)).alias("n"),
        F.sqrt(F.avg(F.pow(a - p, 2))).alias("rmse"),
        (F.avg(F.abs((a - p) / (F.abs(a) + EPS))) * 100).alias("mape"),
        F.avg(F.abs(a - p)).alias("mae"),
    ]
    if group_cols:
        return df.groupBy(*group_cols).agg(*aggs).orderBy(*group_cols)
    return df.agg(*aggs)

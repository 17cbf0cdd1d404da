"""Scaler parameters as data (SURVEY §2.10 U3 / §2.3 J3).

The reference fits sklearn scalers by collecting the whole series into one
process (`core/model.py:182,196-197`; `core/kubeflow_pipeline.py:108-109` --
and fits *before* the split, leaking val/test range; SURVEY §7.3 item 3).
Spark-first: scaler params are one tiny aggregate row per group, broadcast-
joined back; apply/inverse are plain column expressions. ``fit_on`` lets the
caller scope the fit (e.g. the train split only) to fix the leak, or
replicate the reference's full-series fit for parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fit_minmax(
    df: DataFrame, group_col: str = "respondent", value_col: str = "value"
) -> DataFrame:
    """Per-group min/max params (MinMaxScaler equivalent)."""
    return df.groupBy(group_col).agg(
        F.min(value_col).alias("v_min"), F.max(value_col).alias("v_max")
    )


def fit_standard(
    df: DataFrame, group_col: str = "respondent", value_col: str = "value"
) -> DataFrame:
    """Per-group mean/std params (StandardScaler equivalent; sample std,
    matching sklearn's ddof=0? No: sklearn StandardScaler uses ddof=0 --
    population std -- so we use stddev_pop here)."""
    return df.groupBy(group_col).agg(
        F.avg(value_col).alias("v_mean"), F.stddev_pop(value_col).alias("v_std")
    )


def apply_minmax(
    df: DataFrame,
    params: DataFrame,
    group_col: str = "respondent",
    value_col: str = "value",
    out_col: str = "value_scaled",
) -> DataFrame:
    """scaled = (v - min) / (max - min); broadcast join, one pass."""
    joined = df.join(F.broadcast(params), group_col)
    rng = F.col("v_max") - F.col("v_min")
    scaled = F.when(rng != 0, (F.col(value_col) - F.col("v_min")) / rng).otherwise(0.0)
    return joined.withColumn(out_col, scaled).drop("v_min", "v_max")


def apply_standard(
    df: DataFrame,
    params: DataFrame,
    group_col: str = "respondent",
    value_col: str = "value",
    out_col: str = "value_scaled",
) -> DataFrame:
    joined = df.join(F.broadcast(params), group_col)
    scaled = F.when(
        F.col("v_std") != 0, (F.col(value_col) - F.col("v_mean")) / F.col("v_std")
    ).otherwise(0.0)
    return joined.withColumn(out_col, scaled).drop("v_mean", "v_std")


def inverse_minmax(
    df: DataFrame,
    params: DataFrame,
    group_col: str = "respondent",
    scaled_col: str = "value_scaled",
    out_col: str = "value",
) -> DataFrame:
    """v = scaled * (max - min) + min -- the inverse transform applied to
    forecasts (`core/kubeflow_pipeline.py:307-308`)."""
    joined = df.join(F.broadcast(params), group_col)
    return joined.withColumn(
        out_col,
        F.col(scaled_col) * (F.col("v_max") - F.col("v_min")) + F.col("v_min"),
    ).drop("v_min", "v_max")

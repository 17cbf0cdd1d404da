"""Hyperparameter search as a Spark fan-out (SURVEY §3.3 re-design).

The reference runs Katib: one K8s pod per trial, each re-reading the data
and printing metrics to stdout (`core/train_katib.py`). Spark-first, the
trial grid is a DataFrame crossed with the group keys; applyInPandas on
(group, trial) trains every combination in parallel on executors, and
"metrics collection" is just the returned DataFrame -- best trial = a
window rank, not a controller parsing stdout."""

from __future__ import annotations

import json
from itertools import product

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from electricity_forecast_pipeline_airflow_k8s_spark.ml.mlp import train_mlp


def trial_grid(spark, param_grid: dict[str, list]) -> DataFrame:
    """Cartesian product of the grid as a DataFrame: (trial_id, params_json).
    Mirrors Katib's grid search space (`core/airflow_dag.py` katib spec)."""
    keys = sorted(param_grid)
    combos = [dict(zip(keys, vals)) for vals in product(*(param_grid[k] for k in keys))]
    rows = [(i, json.dumps(c, sort_keys=True)) for i, c in enumerate(combos)]
    return spark.createDataFrame(rows, "trial_id int, params string")


def run_trials(
    windows: DataFrame,
    param_grid: dict[str, list],
    group_col: str = "respondent",
    split_col: str = "split",
) -> DataFrame:
    """Train one model per (group, trial) and return the metric table.

    windows: (group, split, x, y) as produced by sequence_windows over a
    chronological split. Each (group, trial) cell sees the group's train/val
    windows once -- the join replicates rows per trial, so at scale prefer
    persisting `windows` first (trials x data is the unavoidable HPO cost;
    the reference pays it as pods re-reading MinIO)."""
    spark = windows.sparkSession
    grid = trial_grid(spark, param_grid)
    data = windows.filter(F.col(split_col).isin("train", "val")).select(
        group_col, split_col, "x", "y"
    )
    crossed = data.join(F.broadcast(grid))

    schema = T.StructType(
        [
            T.StructField(group_col, T.StringType()),
            T.StructField("trial_id", T.IntegerType()),
            T.StructField("params", T.StringType()),
            T.StructField("val_loss", T.DoubleType()),
            T.StructField("n_train", T.LongType()),
        ]
    )

    def train_one(pdf: pd.DataFrame) -> pd.DataFrame:
        key = pdf[group_col].iloc[0]
        trial = int(pdf["trial_id"].iloc[0])
        params = json.loads(pdf["params"].iloc[0])
        tr = pdf[pdf[split_col] == "train"]
        va = pdf[pdf[split_col] == "val"]
        if len(tr) == 0:
            return pd.DataFrame(
                {
                    group_col: [key],
                    "trial_id": [trial],
                    "params": [pdf["params"].iloc[0]],
                    "val_loss": [float("nan")],
                    "n_train": [0],
                }
            )
        x_tr = np.stack(tr["x"].to_numpy())
        y_tr = np.stack(tr["y"].to_numpy())
        x_va = np.stack(va["x"].to_numpy()) if len(va) else None
        y_va = np.stack(va["y"].to_numpy()) if len(va) else None
        _, val_loss = train_mlp(x_tr, y_tr, x_va, y_va, **params)
        return pd.DataFrame(
            {
                group_col: [key],
                "trial_id": [trial],
                "params": [pdf["params"].iloc[0]],
                "val_loss": [val_loss],
                "n_train": [len(tr)],
            }
        )

    return crossed.groupBy(group_col, "trial_id").applyInPandas(train_one, schema)


def best_trials(metrics: DataFrame, group_col: str = "respondent") -> DataFrame:
    """Best params per group by validation loss (deterministic tiebreak)."""
    w = Window.partitionBy(group_col).orderBy("val_loss", "trial_id")
    return (
        metrics.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .drop("rk")
    )

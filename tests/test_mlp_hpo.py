"""MLP trainer semantics (early stopping, determinism, clipping) and the
Spark HPO fan-out."""

import datetime as dt
import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from electricity_forecast_pipeline_airflow_k8s_spark.ml.hpo import best_trials, run_trials
from electricity_forecast_pipeline_airflow_k8s_spark.ml.mlp import (
    flatten_params,
    predict_mlp,
    train_mlp,
    unflatten_params,
)
from electricity_forecast_pipeline_airflow_k8s_spark.operators.timeseries import (
    chronological_split,
    sequence_windows,
)

L, H = 16, 4


def _toy_data(n=200, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.normal(0, 1, (n, L))
    # target depends on the inputs, so the mean predictor is genuinely bad
    y = 0.5 * x[:, -H:] + np.tanh(x[:, :H]) * 0.3
    return x, y


def test_mlp_learns_and_is_deterministic():
    x, y = _toy_data()
    p1, loss1 = train_mlp(x[:150], y[:150], x[150:], y[150:], epochs=150, lr=3e-3, seed=7)
    p2, loss2 = train_mlp(x[:150], y[:150], x[150:], y[150:], epochs=150, lr=3e-3, seed=7)
    assert loss1 == loss2
    for k in p1:
        assert np.array_equal(p1[k], p2[k])
    # learns: beats predicting the mean
    naive = float(((y[150:] - y[:150].mean(0)) ** 2).mean())
    assert loss1 < naive * 0.5, (loss1, naive)


def test_mlp_early_stopping_restores_best():
    x, y = _toy_data()
    p, best_loss = train_mlp(
        x[:150], y[:150], x[150:], y[150:], epochs=500, patience=3, seed=1
    )
    out = predict_mlp(p, x[150:])
    final_loss = float(((out - y[150:]) ** 2).mean())
    assert math.isclose(final_loss, best_loss, rel_tol=1e-9)


def test_param_flatten_roundtrip():
    x, y = _toy_data(50)
    p, _ = train_mlp(x, y, epochs=3, hidden=8, seed=2)
    back = unflatten_params(np.array(flatten_params(p)), L, 8, H)
    for k in p:
        assert np.allclose(p[k], back[k])


@pytest.fixture(scope="module")
def windows(spark):
    base = dt.datetime(2024, 1, 1)
    rows = []
    for region, amp in [("CAL", 1.0), ("TEX", 2.0)]:
        for h in range(420):
            v = amp * math.sin(2 * math.pi * (h % 24) / 24)
            rows.append((base + dt.timedelta(hours=h), region, v))
    df = spark.createDataFrame(rows, "period timestamp, respondent string, value double")
    split = chronological_split(df)
    return sequence_windows(
        split, lookback=L, horizon=H, extra_partition_cols=("split",)
    ).cache()


def test_hpo_fanout_and_best_selection(windows):
    grid = {"hidden": [8, 32], "epochs": [15], "seed": [3]}
    metrics = run_trials(windows, grid)
    rows = metrics.collect()
    assert len(rows) == 2 * 2  # 2 groups x 2 trials
    assert all(np.isfinite(r["val_loss"]) for r in rows)
    best = {r["respondent"]: r for r in best_trials(metrics).collect()}
    assert set(best) == {"CAL", "TEX"}
    for r in best.values():
        losses = [
            x["val_loss"] for x in rows if x["respondent"] == r["respondent"]
        ]
        assert r["val_loss"] == min(losses)

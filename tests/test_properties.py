"""Property-based invariants (hypothesis): each property generates many
random groups and checks them in ONE Spark job, so example count doesn't
multiply JVM round-trips."""

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from electricity_forecast_pipeline_airflow_k8s_spark.operators.timeseries import (
    chronological_split,
    sequence_windows,
)

_settings = settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

group_sizes = st.lists(st.integers(min_value=1, max_value=120), min_size=1, max_size=8)


def _series(spark, sizes):
    base = dt.datetime(2024, 1, 1)
    rows = [
        (f"g{gi}", base + dt.timedelta(hours=i), float(i))
        for gi, n in enumerate(sizes)
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "respondent string, period timestamp, value double")


@given(sizes=group_sizes)
@_settings
def test_split_sizes_floor_invariant(spark, sizes):
    """train = floor(0.7n), val = floor(0.15n), test = rest -- per group,
    for any group size (`core/kubeflow_pipeline.py:127-132`)."""
    df = _series(spark, sizes)
    out = chronological_split(df)
    counts = {
        (r["respondent"], r["split"]): r["n"]
        for r in out.groupBy("respondent", "split").agg(F.count("*").alias("n")).collect()
    }
    for gi, n in enumerate(sizes):
        g = f"g{gi}"
        tr, va = int(n * 0.7), int(n * 0.15)
        assert counts.get((g, "train"), 0) == tr
        assert counts.get((g, "val"), 0) == va
        assert counts.get((g, "test"), 0) == n - tr - va


@given(
    sizes=group_sizes,
    lookback=st.integers(min_value=1, max_value=30),
    horizon=st.integers(min_value=1, max_value=10),
)
@_settings
def test_window_count_invariant(spark, sizes, lookback, horizon):
    """windows per group == max(n - L - H + 1, 0) (`core/model.py:32-33`)."""
    df = _series(spark, sizes)
    wins = sequence_windows(df, lookback=lookback, horizon=horizon)
    counts = {
        r["respondent"]: r["n"]
        for r in wins.groupBy("respondent").agg(F.count("*").alias("n")).collect()
    }
    for gi, n in enumerate(sizes):
        expected = max(n - lookback - horizon + 1, 0)
        assert counts.get(f"g{gi}", 0) == expected

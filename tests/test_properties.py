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


@given(sizes=group_sizes, n_folds=st.integers(min_value=1, max_value=6))
@_settings
def test_backtest_folds_partition_invariant(spark, sizes, n_folds):
    """Rolling-origin folds: for every group of size n and K folds,
    fold i's train is floor((i+1)n/(K+1)) rows, train+test never exceeds
    n, and train counts strictly grow with the fold whenever slices are
    non-empty."""
    from electricity_forecast_pipeline_airflow_k8s_spark.operators.timeseries import (
        backtest_folds,
    )

    df = _series(spark, sizes)
    out = backtest_folds(df, n_folds=n_folds)
    rows = {(r["respondent"], r["fold"]): r for r in out.collect()}
    slices = n_folds + 1
    for gi, n in enumerate(sizes):
        for i in range(n_folds):
            r = rows.get((f"g{gi}", i))
            if r is None:
                # fold with zero train AND zero test rows (tiny group):
                # absent from the aggregate by construction
                assert ((i + 2) * n) // slices == 0
                continue
            assert r["train_n"] == ((i + 1) * n) // slices
            assert r["test_n"] == ((i + 2) * n) // slices - ((i + 1) * n) // slices
            assert r["train_n"] + r["test_n"] <= n
            if r["test_n"]:
                assert r["train_end_ts"] is None or r["test_end_ts"] > r["train_end_ts"]


@given(
    texts=st.lists(
        st.text(
            alphabet=st.characters(min_codepoint=32, max_codepoint=126),
            min_size=0,
            max_size=80,
        ),
        min_size=1,
        max_size=12,
    )
)
@_settings
def test_char_entropy_bounds_property(spark, texts):
    """0 <= entropy <= log2(n_distinct_chars) for any printable text; the
    upper bound is tight only for uniform distributions."""
    import math

    from electricity_forecast_pipeline_airflow_k8s_spark.operators.text import (
        char_entropy,
    )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    for r in char_entropy(df).collect():
        assert r["entropy_bits"] >= 0.0
        ub = math.log2(max(r["n_distinct_chars"], 1))
        assert r["entropy_bits"] <= ub + 1e-6


@given(sizes=group_sizes)
@_settings
def test_salted_stats_equals_plain_agg(spark, sizes):
    """Two-level salted aggregation must be value-identical to the plain
    single-level aggregate for any distribution (including 1-row groups
    and heavy skew)."""
    from electricity_forecast_pipeline_airflow_k8s_spark.plans.skew import salted_stats

    df = _series(spark, sizes)
    salted = {
        r["respondent"]: r
        for r in salted_stats(df, ["respondent"], "value", n_salts=8).collect()
    }
    plain = {
        r["respondent"]: r
        for r in df.groupBy("respondent")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (
                F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
                / F.count("value")
            ).alias("mean_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
        .collect()
    }
    assert salted.keys() == plain.keys()
    for g in plain:
        assert salted[g]["n"] == plain[g]["n"]
        assert salted[g]["mean_value"] == plain[g]["mean_value"]
        assert salted[g]["min_value"] == plain[g]["min_value"]
        assert salted[g]["max_value"] == plain[g]["max_value"]

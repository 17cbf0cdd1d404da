"""Unit invariants for the round-3 forecasting-prep and corpus operators
(oracle parity is covered separately by test_oracle_parity)."""

import datetime as dt
import math

from pyspark.sql import functions as F

from electricity_forecast_pipeline_airflow_k8s_spark.operators.similarity import (
    centroid_assign,
)
from electricity_forecast_pipeline_airflow_k8s_spark.operators.text import char_entropy
from electricity_forecast_pipeline_airflow_k8s_spark.operators.timeseries import (
    backtest_folds,
    calendar_features,
)


def _series(spark, n=100):
    base = dt.datetime(2024, 1, 1)
    rows = [("a", base + dt.timedelta(hours=i), float(i)) for i in range(n)]
    return spark.createDataFrame(rows, "g string, ts timestamp, v double")


def test_calendar_cyclic_wraparound(spark):
    df = _series(spark, 24)  # exactly one day (2024-01-01, a Monday)
    feats = {r["hour"]: r for r in calendar_features(df, ts_col="ts").collect()}
    # hour 23 and hour 0 are adjacent on the circle: euclidean distance in
    # (sin, cos) space must be small (~2*sin(pi/24)), far smaller than the
    # raw-feature distance of 23
    d = math.hypot(
        feats[23]["hour_sin"] - feats[0]["hour_sin"],
        feats[23]["hour_cos"] - feats[0]["hour_cos"],
    )
    assert d < 0.3
    assert feats[0]["hour_sin"] == 0.0 and feats[0]["hour_cos"] == 1.0
    # isodow is 1..7 with Monday=1 (2024-01-01 was a Monday)
    assert feats[0]["isodow"] == 1 and not feats[0]["is_weekend"]


def test_backtest_folds_expanding_and_ordered(spark):
    df = _series(spark, 100)
    out = backtest_folds(df, n_folds=4, group_col="g", ts_col="ts").collect()
    assert len(out) == 4
    by_fold = {r["fold"]: r for r in out}
    for i in range(4):
        r = by_fold[i]
        # expanding window: train grows by one slice per fold; test is one slice
        assert r["train_n"] == (i + 1) * 20
        assert r["test_n"] == 20
        # temporal ordering: train always precedes test
        assert r["train_end_ts"] < r["test_end_ts"]
    # later folds end no earlier than earlier folds
    assert by_fold[3]["train_end_ts"] > by_fold[0]["train_end_ts"]


def test_char_entropy_bounds(spark):
    df = spark.createDataFrame(
        [(1, "aaaaaaaa"), (2, "abababab"), (3, "abcdefgh")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in char_entropy(df).collect()}
    assert rows[1]["entropy_bits"] == 0.0  # single symbol
    assert abs(rows[2]["entropy_bits"] - 1.0) < 1e-9  # two equiprobable
    assert abs(rows[3]["entropy_bits"] - 3.0) < 1e-9  # eight equiprobable
    assert rows[3]["n_distinct_chars"] == 8


def test_centroid_assign_separated_clusters(spark):
    # two well-separated labels: every vector must assign to its own centroid
    rows = [(i, [10.0, 10.0, float(i % 3)], 0) for i in range(6)] + [
        (10 + i, [-10.0, -10.0, float(i % 3)], 1) for i in range(6)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = centroid_assign(df).collect()
    assert len(out) == 12
    assert all(r["is_own_centroid"] for r in out)
    assert all(r["assigned_label"] == r["true_label"] for r in out)


def test_scd2_changelog_collapse_and_asof(spark):
    import datetime as dt

    from electricity_forecast_pipeline_airflow_k8s_spark.operators.scd import (
        scd2_from_changelog,
        scd2_point_in_time,
    )

    t = lambda d: dt.datetime(2024, 1, d)  # noqa: E731
    rows = [
        # key 1: a -> a (renewal, suppressed) -> b -> a
        (1, "a", t(1), 1),
        (1, "a", t(2), 2),
        (1, "b", t(3), 3),
        (1, "a", t(4), 4),
        # key 2: null attr versions are null-safe-equal (one version)
        (2, None, t(1), 5),
        (2, None, t(5), 6),
    ]
    df = spark.createDataFrame(rows, "k long, attr string, ts timestamp, id long")
    dim = scd2_from_changelog(
        df, key_cols=("k",), attr_cols=("attr",), ts_col="ts", tiebreak_cols=("id",)
    )
    got = [(r["k"], r["attr"], r["valid_from"].day,
            r["valid_to"].day if r["valid_to"] else None, r["is_current"])
           for r in dim.orderBy("k", "valid_from").collect()]
    assert got == [
        (1, "a", 1, 3, False),
        (1, "b", 3, 4, False),
        (1, "a", 4, None, True),
        (2, None, 1, None, True),
    ]
    # as-of day 3 12:00 -> key 1 is in state b, key 2 in its null version
    asof = {
        r["k"]: r["attr"]
        for r in scd2_point_in_time(dim, "2024-01-03 12:00:00").collect()
    }
    assert asof == {1: "b", 2: None}

"""Misra-Gries exact heavy hitters (operators/heavyhitters.py).

Pins the MG merge (hand-modeled), the candidate superset guarantee under
adversarial partition splits, and end-to-end equality with the exact
brute-force word count at the same threshold.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from electricity_forecast_pipeline_airflow_k8s_spark.operators.heavyhitters import (
    _mg_merge,
    heavy_hitters_exact,
    mg_candidates,
)


def test_mg_merge_hand_model():
    # stream: a x5, b x3, c x2, d x1 with k=2 counters
    s = _mg_merge({}, {"a": 5, "b": 3}, 2)
    assert s == {"a": 5, "b": 3}
    s = _mg_merge(s, {"c": 2, "d": 1}, 2)
    # third largest of {a:5, b:3, c:2, d:1} is 2 -> subtract 2, drop <=0
    assert s == {"a": 3, "b": 1}
    # lower bound property: estimate >= true - n/(k+1) (n=11, bound 3.67)
    assert s["a"] >= 5 - 11 / 3


def test_mg_candidates_bounded_output(spark):
    df = spark.range(0, 10_000).select(
        F.concat(F.lit("t"), (F.col("id") % 500).cast("string")).alias("tok")
    ).repartition(8)
    out = mg_candidates(df, "tok", 5).collect()
    per_pid_rows = len(out)
    assert per_pid_rows <= 8 * (5 + 1)  # <= k counters + 1 count row per partition
    n = sum(r["lower_bound"] for r in out if r["token"] is None)
    assert n == 10_000


@pytest.mark.parametrize("parts", [1, 3, 13])
def test_heavy_hitters_equal_bruteforce(spark, parts):
    # skewed synthetic stream: token "hot" holds ~30%, "warm" ~8%, rest uniform
    df = spark.range(0, 6000).select(
        F.when(F.col("id") % 10 < 3, "hot")
        .when(F.col("id") % 12 == 3, "warm")
        .otherwise(F.concat(F.lit("cold"), (F.col("id") % 700).cast("string")))
        .alias("token")
    ).repartition(parts)
    k = 9  # threshold share 1/10
    got = sorted(
        tuple(r) for r in heavy_hitters_exact(df, "token", k).collect()
    )
    n = df.count()
    expect = sorted(
        tuple(r)
        for r in df.groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
        .where(F.col("freq") * (k + 1) > F.lit(n))
        .collect()
    )
    assert got == expect and len(expect) >= 1


def test_heavy_hitters_empty_and_null(spark):
    empty = spark.createDataFrame([], "token string")
    assert heavy_hitters_exact(empty, "token", 5).count() == 0
    nulls = spark.createDataFrame([(None,), ("x",)], ["token"])
    got = heavy_hitters_exact(nulls, "token", 1).collect()
    assert [(r["token"], r["freq"]) for r in got] == [("x", 1)]


def test_mg_rejects_bad_k(spark):
    df = spark.createDataFrame([("x",)], ["token"])
    with pytest.raises(ValueError):
        mg_candidates(df, "token", 0)

"""Count-min sketch (operators/sketches.py).

Pins the portable hash (Python == JVM expression), the one-sided error
guarantee, partitioning-invariance (CMS is linear, so the merged sketch
must not depend on how the data was split), and exactness when the
width is collision-free.
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from electricity_forecast_pipeline_airflow_k8s_spark.operators.sketches import (
    _bucket_expr,
    _bucket_py,
    cms_build,
    cms_build_exprs,
    cms_estimate,
)

WORDS = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta"]


def _token_df(spark, counts: dict[str, int], partitions: int):
    rows = [(w,) for w, c in counts.items() for _ in range(c)]
    return spark.createDataFrame(rows, "token string").repartition(partitions)


def test_bucket_hash_python_matches_jvm(spark):
    df = spark.createDataFrame([(w,) for w in WORDS], "token string")
    rows = df.select(
        "token",
        *[
            _bucket_expr(F.lit(j), F.col("token"), 256).alias(f"b{j}")
            for j in range(4)
        ],
    ).collect()
    for r in rows:
        for j in range(4):
            assert r[f"b{j}"] == _bucket_py(j, r["token"], 256)


def test_never_underestimates_and_exact_without_collisions(spark):
    counts = {w: (i + 1) * 3 for i, w in enumerate(WORDS)}
    tok = _token_df(spark, counts, 4)
    # width 4096 over 8 tokens: collision probability across 4 rows ~ 0;
    # verify exactness explicitly (if a collision DID occur the >= branch
    # below still holds and the == assertions would catch a hash change)
    sketch = cms_build(tok, "token", depth=4, width=4096)
    probes = spark.createDataFrame([(w,) for w in WORDS], "token string")
    est = {
        r["token"]: r["cms_est"]
        for r in cms_estimate(sketch, probes, "token", depth=4, width=4096).collect()
    }
    for w, c in counts.items():
        assert est[w] >= c
        assert est[w] == c


def test_partitioning_invariance(spark):
    counts = {w: (i * 7) % 11 + 1 for i, w in enumerate(WORDS)}
    results = []
    for parts in (1, 3, 8):
        tok = _token_df(spark, counts, parts)
        sketch = cms_build(tok, "token", depth=3, width=16)
        results.append(
            sorted(tuple(r) for r in sketch.collect())
        )
    assert results[0] == results[1] == results[2]


def test_narrow_width_overestimates_but_never_under(spark):
    counts = {w: (i + 1) * 5 for i, w in enumerate(WORDS)}
    tok = _token_df(spark, counts, 2)
    sketch = cms_build(tok, "token", depth=2, width=3)  # heavy collisions
    probes = spark.createDataFrame([(w,) for w in WORDS], "token string")
    est = {
        r["token"]: r["cms_est"]
        for r in cms_estimate(sketch, probes, "token", depth=2, width=3).collect()
    }
    n = sum(counts.values())
    for w, c in counts.items():
        assert c <= est[w] <= n


def test_unseen_probe_token_estimates_from_collisions_only(spark):
    tok = _token_df(spark, {"alpha": 10}, 1)
    sketch = cms_build(tok, "token", depth=4, width=4096)
    probes = spark.createDataFrame([("nosuchword",)], "token string")
    [r] = cms_estimate(sketch, probes, "token", depth=4, width=4096).collect()
    assert r["cms_est"] == 0


def test_invalid_params_raise(spark):
    tok = _token_df(spark, {"alpha": 1}, 1)
    with pytest.raises(ValueError):
        cms_build(tok, "token", depth=0, width=8)
    with pytest.raises(ValueError):
        cms_build(tok, "token", depth=2, width=0)


def test_jvm_build_equals_local_grid_build(spark):
    # CMS is linear: the JVM explode+hashagg build and the mapInPandas
    # local-grid build must produce bit-identical cells
    counts = {w: (i * 5) % 9 + 1 for i, w in enumerate(WORDS)}
    tok = _token_df(spark, counts, 5)
    a = sorted(tuple(r) for r in cms_build(tok, "token", depth=3, width=32).collect())
    b = sorted(
        tuple(r)
        for r in cms_build_exprs(tok, "token", depth=3, width=32).collect()
    )
    assert a == b


def test_jvm_build_shuffle_is_bounded(spark):
    # partial aggregation must appear below the exchange so each partition
    # ships at most depth*width cells, not one row per token occurrence
    from electricity_forecast_pipeline_airflow_k8s_spark.plans.inspect import (
        explain_str,
    )

    tok = _token_df(spark, {w: 10 for w in WORDS}, 4)
    plan = explain_str(cms_build_exprs(tok, "token", depth=4, width=256))
    before_exchange = plan.split("Exchange")[-1]
    assert "HashAggregate" in before_exchange, plan

"""Distributed global rank / exact NTILE (operators/ranking.py).

Pins three things:
  * global_rank == row_number() OVER (ORDER BY ...) for total orders,
    including descending keys, many partitions, and n < num_partitions;
  * ntile_exact's closed-form bucket math == F.ntile for awkward (n, k)
    combos (remainder buckets, n < k, k = 1);
  * the scale plan contains NO window node at all (the whole point), and
    rel_rfm_segments_scale equals the exact-window rel_rfm_segments.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from electricity_forecast_pipeline_airflow_k8s_spark.operators.ranking import (
    exact_quantiles,
    global_rank,
    ntile_exact,
    ntile_global,
)


def _rows(df, *cols):
    return [tuple(r) for r in df.select(*cols).collect()]


def test_global_rank_matches_window_row_number(spark):
    df = spark.range(0, 1000).select(
        (F.col("id") * 2654435761 % 997).alias("key"), F.col("id").alias("tie")
    )
    expect = df.withColumn(
        "rn", F.row_number().over(Window.orderBy("key", "tie"))
    )
    got = global_rank(df, ["key", "tie"], rank_col="rn", num_partitions=7)
    assert sorted(_rows(got, "key", "tie", "rn")) == sorted(
        _rows(expect, "key", "tie", "rn")
    )


def test_global_rank_descending_and_small_n(spark):
    df = spark.createDataFrame(
        [(5, "a"), (3, "b"), (9, "c")], ["v", "k"]
    )
    got = global_rank(
        df, [F.col("v").desc(), "k"], rank_col="rn", num_partitions=8
    )
    assert sorted(_rows(got, "k", "rn")) == [("a", 2), ("b", 3), ("c", 1)]


def test_global_rank_empty_frame(spark):
    df = spark.range(0).select(F.col("id").alias("v"))
    assert global_rank(df, ["v"], num_partitions=4).count() == 0


@pytest.mark.parametrize("n,k", [(10, 3), (7, 7), (3, 5), (100, 1), (13, 4)])
def test_ntile_exact_matches_builtin(spark, n, k):
    df = spark.range(1, n + 1).select(F.col("id").alias("v"))
    expect = df.withColumn("t", F.ntile(k).over(Window.orderBy("v")))
    got = df.withColumn("t", ntile_exact(F.col("v"), n, k))
    assert sorted(_rows(got, "v", "t")) == sorted(_rows(expect, "v", "t"))


def test_ntile_exact_rejects_bad_k():
    with pytest.raises(ValueError):
        ntile_exact(F.lit(1), 10, 0)


def test_ntile_global_no_window_in_plan(spark):
    df = spark.range(0, 200).select(
        (F.col("id") % 17).alias("key"), F.col("id").alias("tie")
    )
    tiled = ntile_global(df, ["key", "tie"], k=4, tile_col="t")
    plan = tiled._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan  # the single-partition sort never appears
    expect = df.withColumn("t", F.ntile(4).over(Window.orderBy("key", "tie")))
    assert sorted(_rows(tiled, "key", "tie", "t")) == sorted(
        _rows(expect, "key", "tie", "t")
    )


def test_rfm_scale_equals_exact_window(spark, sf_dir):
    from electricity_forecast_pipeline_airflow_k8s_spark.queries import queries

    qs = queries()
    exact = qs["rel_rfm_segments"](spark, sf_dir).collect()
    scale = qs["rel_rfm_segments_scale"](spark, sf_dir).collect()
    assert [tuple(r) for r in exact] == [tuple(r) for r in scale]


def test_exact_quantiles_matches_percentile(spark):
    from pyspark.sql import functions as F2

    df = spark.range(0, 5000).select(
        ((F.col("id") * 2654435761 % 9973) / 7.0).alias("v")
    )
    probs = [0.0, 0.1, 0.5, 0.9, 0.99, 1.0]
    got = {
        r["q"]: r["value"]
        for r in exact_quantiles(df, "v", probs, num_partitions=7).collect()
    }
    expect = df.select(
        F2.percentile("v", F2.array(*[F2.lit(p) for p in probs])).alias("p")
    ).collect()[0]["p"]
    assert set(got) == set(probs)
    for p, e in zip(probs, expect):
        assert abs(got[p] - e) < 1e-9, (p, got[p], e)


def test_exact_quantiles_single_row_and_nulls(spark):
    df = spark.createDataFrame([(42.0,), (None,)], ["v"])
    got = exact_quantiles(df, "v", [0.0, 0.5, 1.0], num_partitions=4).collect()
    assert {r["value"] for r in got} == {42.0}
    empty = spark.createDataFrame([], "v double")
    assert exact_quantiles(empty, "v", [0.5]).count() == 0


def test_exact_quantiles_rejects_bad_prob(spark):
    df = spark.range(3).select(F.col("id").cast("double").alias("v"))
    with pytest.raises(ValueError):
        exact_quantiles(df, "v", [1.5]).collect()


def test_weighted_quantiles_hand_model(spark):
    # values 10,20,30 with weights 1,2,1 (W=4): cum 1,3,4
    # p=1/4 -> units ceil(4/4)=1 -> 10; p=1/2 -> units 2 -> 20; p=3/4 -> units 3 -> 20
    from electricity_forecast_pipeline_airflow_k8s_spark.operators.ranking import (
        weighted_quantiles,
    )

    df = spark.createDataFrame([(10.0, 1), (20.0, 2), (30.0, 1)], ["v", "w"])
    got = {
        r["q"]: r["value"]
        for r in weighted_quantiles(
            df, "v", "w", [(1, 4), (1, 2), (3, 4), (1, 1)], num_partitions=3
        ).collect()
    }
    assert got == {0.25: 10.0, 0.5: 20.0, 0.75: 20.0, 1.0: 30.0}


def test_weighted_quantiles_matches_bruteforce(spark):
    from pyspark.sql import Window as W2

    from electricity_forecast_pipeline_airflow_k8s_spark.operators.ranking import (
        weighted_quantiles,
    )

    df = spark.range(0, 3000).select(
        ((F.col("id") * 48271 % 1013) / 3.0).alias("v"),
        ((F.col("id") * 16807 % 7) + 1).alias("w"),
    )
    total = df.agg(F.sum("w")).collect()[0][0]
    cum = df.withColumn(
        "cw",
        F.sum("w").over(W2.orderBy("v").rangeBetween(W2.unboundedPreceding, 0)),
    )
    for num, den in [(1, 10), (1, 2), (9, 10)]:
        expect = (
            cum.where(F.col("cw") * den >= F.lit(num * total))
            .agg(F.min("v"))
            .collect()[0][0]
        )
        got = weighted_quantiles(df, "v", "w", [(num, den)], num_partitions=6)
        assert got.collect()[0]["value"] == expect, (num, den)


def test_weighted_quantiles_unit_weights_edge_cases(spark):
    from electricity_forecast_pipeline_airflow_k8s_spark.operators.ranking import (
        weighted_quantiles,
    )

    df = spark.createDataFrame(
        [(1.0, 1), (2.0, 0), (None, 5), (3.0, None), (4.0, 1)], ["v", "w"]
    )
    # zero/null weights and null values carry no mass
    got = {
        r["q"]: r["value"]
        for r in weighted_quantiles(df, "v", "w", [(0, 1), (1, 1)]).collect()
    }
    assert got == {0.0: 1.0, 1.0: 4.0}
    empty = spark.createDataFrame([], "v double, w long")
    assert weighted_quantiles(empty, "v", "w", [(1, 2)]).count() == 0
    with pytest.raises(ValueError):
        weighted_quantiles(df, "v", "w", [(3, 2)])


def test_global_prefix_sum_matches_sequential(spark):
    import random

    from electricity_forecast_pipeline_airflow_k8s_spark.operators.ranking import (
        global_prefix_sum,
    )

    rng = random.Random(99)
    rows = [(i, rng.randint(-50, 100)) for i in range(500)]
    for parts in (1, 4, 16):
        df = spark.createDataFrame(rows, "k long, v long").repartition(parts)
        out, total = global_prefix_sum(df, ["k"], "v", cum_col="c", num_partitions=parts)
        got = {r["k"]: r["c"] for r in out.collect()}
        run = 0
        for k, v in sorted(rows):
            run += v
            assert got[k] == run
        assert total == sum(v for _, v in rows)


def test_global_prefix_sum_desc_order_with_tiebreak(spark):
    from electricity_forecast_pipeline_airflow_k8s_spark.operators.ranking import (
        global_prefix_sum,
    )
    from pyspark.sql import functions as F

    rows = [("a", 5), ("b", 5), ("c", 1)]
    df = spark.createDataFrame(rows, "k string, v long")
    out, total = global_prefix_sum(
        df, [F.col("v").desc(), "k"], "v", cum_col="c", num_partitions=3
    )
    got = {r["k"]: r["c"] for r in out.collect()}
    assert got == {"a": 5, "b": 10, "c": 11} and total == 11


def test_ntile_by_edges_matches_ntile(spark):
    from electricity_forecast_pipeline_airflow_k8s_spark.operators.ranking import (
        ntile_by_edges,
    )

    for n, k in [(200, 4), (203, 10), (64, 64), (50, 64), (1000, 7)]:
        df = spark.range(0, n).select(
            (F.col("id") % 17).alias("key"), F.col("id").alias("tie")
        )
        got = ntile_by_edges(df, ["key", "tie"], k=k, tile_col="t")
        expect = df.withColumn("t", F.ntile(k).over(Window.orderBy("key", "tie")))
        assert sorted(_rows(got, "key", "tie", "t")) == sorted(
            _rows(expect, "key", "tie", "t")
        ), (n, k)


def test_ntile_by_edges_no_window_and_rejects_partial_order(spark):
    from electricity_forecast_pipeline_airflow_k8s_spark.operators.ranking import (
        ntile_by_edges,
    )

    df = spark.range(0, 500).select(
        F.col("id").alias("v"), (F.col("id") * 7).alias("tie")
    )
    tiled = ntile_by_edges(df, ["v", "tie"], k=8, tile_col="b")
    plan = tiled._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    # a non-total order duplicates a boundary tuple -> loud failure, never
    # a silently ambiguous bucket assignment
    dup = spark.range(0, 100).select(F.lit(1).alias("key"))
    with pytest.raises(ValueError, match="not a total order"):
        ntile_by_edges(dup, ["key"], k=4, tile_col="t")


def test_ntile_edges_split_composes_identically(spark):
    """Round-12 split: ntile_edges + apply_ntile_edges must reproduce
    ntile_by_edges exactly (the layout lanes derive several dimensions'
    edges concurrently and attach them to one frame)."""
    from electricity_forecast_pipeline_airflow_k8s_spark.operators.ranking import (
        apply_ntile_edges,
        ntile_by_edges,
        ntile_edges,
    )

    df = spark.range(0, 321).select(
        (F.col("id") % 13).alias("a"), (F.col("id") % 7).alias("b"),
        F.col("id").alias("tie"),
    )
    # two independent orders attached to the SAME frame, zorder-style
    ea, na = ntile_edges(df, ["a", "tie"], k=9)
    eb, nb = ntile_edges(df, ["b", "tie"], k=5)
    got = apply_ntile_edges(
        apply_ntile_edges(df, ["a", "tie"], ea, na, tile_col="ta"),
        ["b", "tie"], eb, nb, tile_col="tb",
    )
    want_a = ntile_by_edges(df, ["a", "tie"], k=9, tile_col="ta")
    want_b = ntile_by_edges(df, ["b", "tie"], k=5, tile_col="tb")
    got_rows = sorted(_rows(got, "tie", "ta", "tb"))
    wa = {r[0]: r[1] for r in _rows(want_a, "tie", "ta")}
    wb = {r[0]: r[1] for r in _rows(want_b, "tie", "tb")}
    assert got_rows == sorted((t, wa[t], wb[t]) for t in wa)
    # empty input: bucket column is NULL, no crash
    empty = df.filter(F.col("tie") < 0)
    ee, ne = ntile_edges(empty, ["a", "tie"], k=4)
    assert ne == 0
    assert apply_ntile_edges(empty, ["a", "tie"], ee, ne, tile_col="t").count() == 0

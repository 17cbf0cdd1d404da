"""Skew stress (VERDICT r3 item 6): the reference's data shape is few
group keys x many rows per key (`core/data_validation.py:176-218` profiles
a handful of respondents over dense series). At 100 TB that shape makes
key skew the #1 failure mode, so this module pins the two defenses:

1. AQE skew-join splitting really ENGAGES on a deliberately skewed join
   (one key holding ~50% of the fact rows) -- asserted on the executed
   adaptive plan, not assumed from the conf being set.
2. Salted two-level aggregation stays value-identical to the plain
   aggregate under the same hot-key distribution, and its partial stage
   fans the hot key over n_salts reducers (plan shape).
"""

import pyspark.sql.functions as F
import pytest

from electricity_forecast_pipeline_airflow_k8s_spark.plans.skew import (
    salted_count,
    salted_stats,
)
from electricity_forecast_pipeline_airflow_k8s_spark.sources.tables import load_table


def _skewed_events(spark, sf_dir):
    """events with a synthetic hot key: ~50% of rows map to key 'hot',
    the rest spread over 97 warm keys. The sha2-derived payload padding
    pumps POST-COMPRESSION partition bytes (map-status sizes are
    compressed; constant padding vanishes) and the repartition(16) gives
    the skewed shuffle multiple map tasks -- AQE's split granularity is
    per-mapper output block, so a single-mapper shuffle is unsplittable."""
    ev = load_table(spark, "events", sf_dir).repartition(16)
    pad = F.concat(
        *[
            F.sha2(F.concat(F.col("event_id").cast("string"), F.lit(i)), 256)
            for i in range(8)
        ]
    )
    return ev.select(
        F.when(F.col("event_id") % 2 == 0, F.lit("hot"))
        .otherwise(F.concat(F.lit("k"), (F.col("event_id") % 97).cast("string")))
        .alias("k"),
        "event_id",
        "value",
        pad.alias("pad"),
    )


def _scoped_conf(spark, conf: dict):
    prior = {k: spark.conf.get(k, None) for k in conf}
    for k, v in conf.items():
        spark.conf.set(k, v)
    return prior


def _restore_conf(spark, prior: dict):
    for k, v in prior.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_aqe_skew_join_engages(spark, sf_dir):
    """With skew thresholds scaled to test data, the executed adaptive
    plan must mark the sort-merge join skew=true -- proof the runtime
    skew-split path this repo relies on at 100 TB actually fires.

    Two engagement preconditions discovered while pinning this (now
    documented in SCALING.md):
    - split granularity is per-mapper output block, so the skewed shuffle
      needs >1 map task (hence the repartition(16) in the fixture);
    - OptimizeSkewedJoin only matches Sort(ShuffleQueryStage) on BOTH
      sides -- an aggregate (e.g. .distinct()) directly feeding the join
      blocks the rule entirely, so the dim here is a plain source.
    """
    fact = _skewed_events(spark, sf_dir)
    dim = spark.createDataFrame(
        [("hot", "label-hot")] + [(f"k{i}", f"label-k{i}") for i in range(97)],
        "k string, label string",
    )
    prior = _scoped_conf(
        spark,
        {
            # force SMJ (skew splitting doesn't apply to broadcast joins)
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            # scale detection thresholds to KB-sized test partitions; note
            # map-status sizes are POST-compression, so the fixture pad is
            # sha2-derived (a constant pad compresses to ~nothing and the
            # hot partition never crosses the threshold)
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "1KB",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "1KB",
            "spark.sql.adaptive.coalescePartitions.enabled": "false",
            "spark.sql.adaptive.forceOptimizeSkewedJoin": "true",
        },
    )
    try:
        joined = fact.join(dim, "k").select("label", "pad", "value")
        rows = joined.collect()
        assert len(rows) == fact.count()  # every fact row matched a dim key
        executed = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in executed, executed[:3000]
    finally:
        _restore_conf(spark, prior)


def test_salted_count_correct_under_hot_key(spark, sf_dir):
    skewed = _skewed_events(spark, sf_dir)
    plain = {r["k"]: r["n"] for r in skewed.groupBy("k").agg(F.count(F.lit(1)).alias("n")).collect()}
    salted = {r["k"]: r["n"] for r in salted_count(skewed, ["k"], n_salts=8).collect()}
    assert salted == plain
    # the hot key really is hot in the fixture (else this test proves nothing)
    assert plain["hot"] >= 0.4 * sum(plain.values())


def test_salted_stats_correct_under_hot_key(spark, sf_dir):
    skewed = _skewed_events(spark, sf_dir).select("k", "value", "event_id")
    plain = {
        (r["k"]): (r["n"], float(r["mean"]), r["mn"], r["mx"])
        for r in skewed.groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (
                F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
                / F.count("value")
            ).alias("mean"),
            F.min("value").alias("mn"),
            F.max("value").alias("mx"),
        )
        .collect()
    }
    got = {
        r["k"]: (r["n"], float(r["mean_value"]), r["min_value"], r["max_value"])
        for r in salted_stats(skewed, ["k"], "value", n_salts=8).collect()
    }
    assert got == plain


def test_salted_partial_fans_hot_key_across_salts(spark, sf_dir):
    """Plan/shape check: the partial stage keys on (k, _salt), so the hot
    key occupies up to n_salts partial rows instead of one hot reducer."""
    skewed = _skewed_events(spark, sf_dir)
    from electricity_forecast_pipeline_airflow_k8s_spark.plans.skew import salt_keys

    partial = (
        salt_keys(skewed, n_salts=8)
        .groupBy("k", "_salt")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("k") == "hot")
        .collect()
    )
    assert len(partial) == 8, f"hot key landed on {len(partial)} salts, want 8"

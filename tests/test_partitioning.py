"""Focused tests for operators/partitioning.py (round-11 optimization
primitives): fanout (input-parallelism repair) and reuse (the F4
shared-subtree mark)."""

from __future__ import annotations

from pyspark.sql import functions as F

from electricity_forecast_pipeline_airflow_k8s_spark.operators.partitioning import (
    fanout,
    reuse,
)


def test_fanout_widens_narrow_input(spark):
    df = spark.range(0, 1000).coalesce(1)
    out = fanout(df)
    assert out.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    assert out.count() == 1000


def test_fanout_is_noop_when_already_wide(spark):
    n = spark.sparkContext.defaultParallelism
    df = spark.range(0, 1000).repartition(n + 4)
    out = fanout(df)
    # already at/above parallelism: the SAME plan object, no new exchange
    assert out is df


def test_reuse_scoped_persists(spark):
    df = spark.range(0, 100).withColumn("v", F.col("id") * 2)
    out = reuse(df, scoped=True)
    assert out.storageLevel.useMemory  # persisted
    assert out.count() == 100
    out.unpersist()


def test_reuse_bench_mode_is_lazy_and_identical(spark):
    """Bench mode must (a) not run anything at build time and (b) return
    the same rows: the checkpoint is a lineage cut, not a semantic
    change."""
    df = spark.range(0, 100).withColumn("v", F.col("id") * 3)
    tracker = spark.sparkContext.statusTracker()
    before_ids = set(tracker.getJobIdsForGroup(None) or [])
    out = reuse(df, scoped=False)
    after_ids = set(tracker.getJobIdsForGroup(None) or [])
    assert before_ids == after_ids, "lazy reuse must not launch jobs at build"
    expect = sorted(r["v"] for r in df.collect())
    got = sorted(r["v"] for r in out.collect())
    assert got == expect

"""Pin single-fact-scan behavior for self-joined aggregates.

Operators that join an aggregate against itself (Theil-Sen's daily
partials; setsim's ordered token sets feeding the prefix index AND both
verify sides) must not scan + aggregate the fact table once per branch:
the branches plan DIFFERENT exchange types (broadcast vs shuffle), so
Catalyst's ReuseExchange cannot stamp them, and the honest fix is the
scoped-cache persist (the pagerank pattern). These tests pin that the
cached plans really do collapse to one parquet scan — and that the
generic identical-exchange case still reuses without any cache.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from electricity_forecast_pipeline_airflow_k8s_spark.plans.inspect import explain_str


def test_theilsen_single_fact_scan_under_scoped_cache(spark, sf_dir, monkeypatch):
    from electricity_forecast_pipeline_airflow_k8s_spark.queries import registry

    monkeypatch.setenv("SPARK_GRAFT_SCOPED_CACHE", "1")
    df = registry()["ts_theilsen_trend"].build(spark, sf_dir)
    plan = explain_str(df)
    # both branches must read the SAME cached relation: the formatted
    # tree prints each InMemoryRelation's lineage, so count distinct scan
    # node ids, not substring occurrences
    import re

    scan_ids = set(re.findall(r"Scan parquet\s*\((\d+)\)", plan))
    assert len(scan_ids) <= 1, (
        "daily partials must be persisted so events is scanned once:\n" + plan
    )
    assert plan.count("InMemoryTableScan") >= 2


def test_setsim_single_corpus_scan_under_scoped_cache(spark, monkeypatch):
    from electricity_forecast_pipeline_airflow_k8s_spark.operators.setsim import (
        setsim_prefix_join,
    )

    monkeypatch.setenv("SPARK_GRAFT_SCOPED_CACHE", "1")
    docs = spark.createDataFrame(
        [("a", "x y z"), ("b", "x y z"), ("c", "p q r")],
        "doc_id string, text string",
    )
    df = setsim_prefix_join(docs, num=1, den=2)
    plan = explain_str(df)
    # the three consumers must all read the cached ordered sets
    assert plan.count("InMemoryTableScan") >= 3, plan
    # and the result is still exact
    rows = {(r["doc_a"], r["doc_b"]) for r in df.collect()}
    assert rows == {("a", "b")}


def test_static_plan_never_stamps_reuse_under_aqe(spark):
    # why the persist (not ReuseExchange) is the pinned mechanism: with
    # AQE on, exchange reuse is deferred to runtime stage dedup and the
    # static plan never shows ReusedExchange even for bit-identical
    # branches — so a "reuse will save us" assumption is untestable and
    # the explicit cache is the only guarantee a reviewer can check.
    df = spark.range(1000).select(
        (F.col("id") % 7).alias("g"), (F.col("id") % 13).alias("v")
    )
    agg = df.groupBy("g").agg(F.sum("v").alias("s"))
    a, b = agg.alias("a"), agg.alias("b")
    joined = a.join(b, F.col("a.g") == F.col("b.g")).select(F.col("a.g"))
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    assert "ReusedExchange" not in explain_str(joined)

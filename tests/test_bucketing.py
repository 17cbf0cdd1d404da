"""Bucketed co-located joins: the write-time shuffle elimination the
mandate calls out ("repartition() / bucketing for co-located joins").
Proves the 100 TB claim at the plan level: two tables bucketed on the
join key join with ZERO exchanges, and the result is identical to the
plain shuffled join."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from electricity_forecast_pipeline_airflow_k8s_spark.plans.bucketing import (
    bucket_join,
    exchange_count,
    write_bucketed,
)


@pytest.fixture()
def bucketed_tables(spark, sf_dir):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    write_bucketed(o, "b_orders", ["o_orderkey"], 8, sort_cols=["o_orderkey"])
    write_bucketed(
        li.withColumnRenamed("l_orderkey", "o_orderkey"),
        "b_lineitem",
        ["o_orderkey"],
        8,
        sort_cols=["o_orderkey"],
    )
    try:
        yield o, li
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_has_zero_exchanges(spark, bucketed_tables):
    j = bucket_join(spark, "b_orders", "b_lineitem", ["o_orderkey"])
    assert exchange_count(j) == 0, j._jdf.queryExecution().executedPlan().toString()[
        :2000
    ]


def test_plain_join_pays_the_shuffle_bucketed_join_skips(spark, bucketed_tables):
    o, li = bucketed_tables
    plain = o.join(
        li.withColumnRenamed("l_orderkey", "o_orderkey"), ["o_orderkey"]
    )
    # disable broadcast so the plain path shows its true shuffled shape
    saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        assert exchange_count(plain) >= 2  # both sides shuffle
        assert exchange_count(
            bucket_join(spark, "b_orders", "b_lineitem", ["o_orderkey"])
        ) == 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)


def test_bucketed_join_values_match_plain_join(spark, bucketed_tables):
    o, li = bucketed_tables
    j = bucket_join(spark, "b_orders", "b_lineitem", ["o_orderkey"]).groupBy().agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("sq"),
    )
    plain = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy()
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("sq"),
        )
    )
    assert [tuple(r) for r in j.collect()] == [tuple(r) for r in plain.collect()]


def test_groupby_on_bucket_key_also_skips_shuffle(spark, bucketed_tables):
    agg = (
        spark.table("b_lineitem")
        .groupBy("o_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
    )
    assert exchange_count(agg) == 0

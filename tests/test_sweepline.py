"""Sweep-line max-concurrent intervals (rel_max_concurrent_intervals).

Hand-models the +1/-1 running-sum semantics on a tiny fixture where the
peak, its day, and the half-open [s, e) boundary behavior are all known:
an interval ending on day d must NOT count as concurrent with one
starting on day d.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Window
from pyspark.sql import functions as F


def _max_concurrent(spark, intervals):
    """The exact plan shape used by q_rel_max_concurrent_intervals."""
    li = spark.createDataFrame(intervals, "k int, s date, e date")
    ev = li.select("k", F.col("s").alias("d"), F.lit(1).alias("delta")).unionAll(
        li.select("k", F.col("e").alias("d"), F.lit(-1).alias("delta"))
    )
    byday = ev.groupBy("k", "d").agg(F.sum("delta").alias("delta"))
    w = Window.partitionBy("k").orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    run = byday.withColumn("run", F.sum("delta").over(w))
    mx = F.max("run").over(Window.partitionBy("k"))
    return {
        r["k"]: (r["max_concurrent"], r["peak_day"])
        for r in run.withColumn("mx", mx)
        .filter(F.col("run") == F.col("mx"))
        .groupBy("k")
        .agg(F.max("run").alias("max_concurrent"), F.min("d").alias("peak_day"))
        .collect()
    }


def D(day: int) -> dt.date:
    return dt.date(2020, 1, day)


def test_hand_model_peak_and_day(spark):
    got = _max_concurrent(
        spark,
        [
            # group 1: [1,4) [2,5) [3,6) -> peak 3 on day 3
            (1, D(1), D(4)),
            (1, D(2), D(5)),
            (1, D(3), D(6)),
            # group 2: disjoint -> peak 1, earliest start day wins
            (2, D(1), D(2)),
            (2, D(5), D(6)),
        ],
    )
    assert got[1] == (3, D(3))
    assert got[2] == (1, D(1))


def test_half_open_boundary_not_concurrent(spark):
    # [1,3) and [3,5): at day 3 the first has ended -> peak is 1
    got = _max_concurrent(spark, [(1, D(1), D(3)), (1, D(3), D(5))])
    assert got[1] == (1, D(1))


def test_duplicate_days_aggregate_before_running_sum(spark):
    # three intervals starting the same day: peak 3 at that day
    got = _max_concurrent(
        spark, [(1, D(2), D(4)), (1, D(2), D(3)), (1, D(2), D(5))]
    )
    assert got[1] == (3, D(2))

"""Invariants for time-series prep ops (reference semantics:
`core/model.py:19-41`, `core/kubeflow_pipeline.py:127-136`)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from electricity_forecast_pipeline_airflow_k8s_spark.operators.scaling import (
    apply_minmax,
    fit_minmax,
    inverse_minmax,
)
from electricity_forecast_pipeline_airflow_k8s_spark.operators.timeseries import (
    chronological_split,
    fill_gaps_hourly,
    sequence_windows,
)


@pytest.fixture(scope="module")
def hourly(spark):
    base = dt.datetime(2024, 1, 1)
    rows = [
        (base + dt.timedelta(hours=h), region, float(1000 + h))
        for region in ("CAL", "TEX")
        for h in range(400)
    ]
    return spark.createDataFrame(rows, "period timestamp, respondent string, value double")


def test_split_floor_semantics(hourly):
    out = chronological_split(hourly)
    counts = {
        (r["respondent"], r["split"]): r["n"]
        for r in out.groupBy("respondent", "split").agg(F.count("*").alias("n")).collect()
    }
    # n=400: train=floor(280)=280, val=floor(60)=60, test=rest=60
    for region in ("CAL", "TEX"):
        assert counts[(region, "train")] == 280
        assert counts[(region, "val")] == 60
        assert counts[(region, "test")] == 60


def test_window_count_invariant_per_split(hourly):
    split = chronological_split(hourly)
    wins = sequence_windows(
        split, lookback=168, horizon=24, extra_partition_cols=("split",)
    )
    counts = {
        (r["respondent"], r["split"]): r["n"]
        for r in wins.groupBy("respondent", "split").agg(F.count("*").alias("n")).collect()
    }
    # per segment: n - 168 - 24 + 1 (train 280 -> 89); segments shorter than
    # L+H yield no windows (val/test 60 < 192)
    for region in ("CAL", "TEX"):
        assert counts[(region, "train")] == 280 - 168 - 24 + 1
        assert (region, "val") not in counts
        assert (region, "test") not in counts


def test_windows_do_not_cross_split_boundary(hourly):
    split = chronological_split(hourly)
    wins = sequence_windows(
        split, lookback=10, horizon=2, extra_partition_cols=("split",)
    )
    row = (
        wins.filter((F.col("respondent") == "CAL") & (F.col("split") == "val"))
        .orderBy("window_start")
        .first()
    )
    # first val window starts at hour 280 (val segment start), x strictly
    # inside val values 1280..1289
    assert row["x"] == [float(1000 + 280 + i) for i in range(10)]


def test_windows_preserve_null_values(spark):
    """Regression: collect_list skips nulls, which silently shortened
    windows over series with missing values; the struct wrap keeps them."""
    import datetime as dt

    rows = [
        (dt.datetime(2024, 1, 1) + dt.timedelta(hours=h), "CAL",
         None if h == 5 else float(h))
        for h in range(12)
    ]
    df = spark.createDataFrame(rows, "period timestamp, respondent string, value double")
    wins = sequence_windows(df, lookback=3, horizon=2)
    assert wins.count() == 12 - 3 - 2 + 1  # invariant holds despite the null
    first = wins.orderBy("window_start").collect()[3]  # x = hours 3,4,5
    assert first["x"] == [3.0, 4.0, None]


def test_ks_drift_one_sided_group_excluded(spark):
    """Regression: a group entirely before/after the split must be
    excluded (KS undefined), not crash with DIVIDE_BY_ZERO (ANSI mode)."""
    import datetime as dt

    from pyspark.sql import functions as F

    from electricity_forecast_pipeline_airflow_k8s_spark.operators.timeseries import ks_drift

    rows = [
        (dt.datetime(2024, 1, 1 + d), "BOTH", float(d)) for d in range(10)
    ] + [
        (dt.datetime(2024, 1, 1 + d), "REF_ONLY", float(d)) for d in range(4)
    ]
    df = spark.createDataFrame(rows, "period timestamp, respondent string, value double")
    out = ks_drift(df, split_ts=F.lit("2024-01-06").cast("timestamp"))
    groups = {r["respondent"] for r in out.collect()}
    assert groups == {"BOTH"}


def test_minmax_roundtrip(hourly):
    params = fit_minmax(hourly)
    scaled = apply_minmax(hourly, params)
    mm = scaled.agg(F.min("value_scaled"), F.max("value_scaled")).collect()[0]
    assert mm[0] == 0.0 and mm[1] == 1.0
    back = inverse_minmax(
        scaled.select("respondent", "period", "value_scaled"), params, out_col="value2"
    )
    joined = back.join(hourly, ["respondent", "period"])
    bad = joined.filter(F.abs(F.col("value2") - F.col("value")) > 1e-9).count()
    assert bad == 0


def test_approx_quantiles_within_documented_tolerance(spark, sf_dir):
    """scale_mode contract (SURVEY §7.3 risk 1): percentile_approx must
    stay within ~1% relative of the exact interpolating percentile on the
    real events distribution."""
    from electricity_forecast_pipeline_airflow_k8s_spark.sources.tables import load_table

    ev = load_table(spark, "events", sf_dir)
    both = ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.5)).alias("exact"),
        F.percentile_approx("value", F.lit(0.5)).alias("approx"),
    )
    for r in both.collect():
        assert abs(r["approx"] - r["exact"]) <= max(0.01 * abs(r["exact"]), 1e-9), r


def test_fill_gaps_hourly(hourly):
    gapped = hourly.filter(
        ~((F.col("respondent") == "CAL") & F.col("period").between(
            "2024-01-03 05:00:00", "2024-01-03 09:00:00"))
    )
    filled = fill_gaps_hourly(gapped)
    assert filled.count() == 800  # full grid restored
    assert filled.filter(F.col("value").isNull()).count() == 5


def test_gap_fill_locf_equals_single_window_form(spark):
    """The bucket-parallel two-phase LOCF must be row-identical to the
    textbook one-window form, including runs of fully-empty days."""
    import datetime as dt

    from pyspark.sql import Window

    from electricity_forecast_pipeline_airflow_k8s_spark.operators.timeseries import (
        gap_fill_locf,
    )

    base = dt.datetime(2024, 1, 1, 0, 0)
    rows = []
    # group "a": obs at hours 0, 1, then a 3-day hole, then hour 73
    for h in (0, 1, 73):
        rows.append(("a", base + dt.timedelta(hours=h), float(10 + h)))
    # group "b": an all-null-value bucket mid-series stays a gap but
    # carries the prior value
    rows += [
        ("b", base, 5.0),
        ("b", base + dt.timedelta(hours=1), None),
        ("b", base + dt.timedelta(hours=2), 7.0),
    ]
    df = spark.createDataFrame(rows, "g string, ts timestamp, value double")
    got = {
        (r.g, r.hour, r.value_filled, r.is_gap)
        for r in gap_fill_locf(df, "g", "ts", "value").collect()
    }

    from electricity_forecast_pipeline_airflow_k8s_spark.functions.stats import exact_mean

    obs = df.groupBy("g", F.date_trunc("hour", "ts").alias("hour")).agg(
        (F.floor(exact_mean("value") * 10000 + 0.5) / 10000).alias("v_obs")
    )
    spans = obs.groupBy("g").agg(F.min("hour").alias("t0"), F.max("hour").alias("t1"))
    grid = spans.select(
        "g", F.explode(F.sequence("t0", "t1", F.expr("INTERVAL 1 HOUR"))).alias("hour")
    )
    w = (
        Window.partitionBy("g")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ref = (
        grid.join(obs, ["g", "hour"], "left")
        .select(
            "g",
            "hour",
            F.last("v_obs", ignorenulls=True).over(w).alias("value_filled"),
            F.col("v_obs").isNull().alias("is_gap"),
        )
    )
    expect = {(r.g, r.hour, r.value_filled, r.is_gap) for r in ref.collect()}
    assert got == expect
    # the 3-day hole is filled with the hour-1 value
    assert ("a", base + dt.timedelta(hours=48), 11.0, True) in got
    # the all-null bucket is flagged gap but carries 5.0
    assert ("b", base + dt.timedelta(hours=1), 5.0, True) in got


def test_bigram_lm_score_small_example(spark):
    """Hand-checkable corpus: 'ab' repeated docs dominate the model, so a
    doc of rare bigrams scores strictly lower."""
    from electricity_forecast_pipeline_airflow_k8s_spark.operators.text import (
        bigram_lm_score,
    )

    docs = spark.createDataFrame(
        [(0, "ababab"), (1, "ababab"), (2, "xyz"), (3, "q")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in bigram_lm_score(docs).collect()}
    assert 3 not in out  # single char: no bigrams
    assert out[0].n_bigrams == 5 and out[0].n_distinct_bigrams == 2
    assert out[2].n_bigrams == 2 and out[2].n_distinct_bigrams == 2
    assert out[0].mean_log2_prob > out[2].mean_log2_prob


def test_time_weighted_avg_semantics(spark, tmp_path):
    """TWA ground truths the oracle can't express: (1) a constant series
    has TWA == the constant regardless of sampling pattern; (2) burst
    sampling near one value must NOT drag TWA toward it the way the plain
    mean is dragged (the whole point of duration weighting)."""
    import datetime as dt

    from electricity_forecast_pipeline_airflow_k8s_spark.queries import registry

    base = dt.datetime(2024, 1, 1)
    rows = []
    # constant series, irregular gaps
    for m in (0, 1, 5, 30, 31, 600):
        rows.append((100 + m, base + dt.timedelta(minutes=m), 1, "const", 7.0, None))
    # burst series: value 100 held for 10h, then 60 rapid samples of 0
    rows.append((200, base, 1, "burst", 100.0, None))
    for s in range(60):
        rows.append(
            (201 + s, base + dt.timedelta(hours=10, seconds=s), 1, "burst", 0.0, None)
        )
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    sf = str(tmp_path / "sf")
    import os

    os.makedirs(sf, exist_ok=True)
    df.write.parquet(f"{sf}/events.parquet")
    out = {
        r["event_type"]: r
        for r in registry()["ts_time_weighted_avg"].build(spark, sf).collect()
    }
    assert out["const"]["twa"] == 7.0
    # plain mean of burst = (100 + 60*0)/61 ~ 1.64; TWA must stay near 100
    # (100 held for 10h of the ~10h0m59s span)
    assert out["burst"]["twa"] > 99.0

"""Time-series prep queries (SURVEY §2.5 W3-W5, §2.10 U3) on the events
table. Split/window/scaler semantics replicate the reference exactly
(floor splits, n-L-H+1 window counts)."""

from __future__ import annotations

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from electricity_forecast_pipeline_airflow_k8s_spark.operators.scaling import (
    apply_minmax,
    fit_minmax,
    fit_standard,
)
from electricity_forecast_pipeline_airflow_k8s_spark.operators.timeseries import (
    backtest_folds,
    calendar_features,
    chronological_split,
    ks_drift,
    psi_drift,
    resample,
    sequence_windows,
    tail_window,
)
from electricity_forecast_pipeline_airflow_k8s_spark.functions.stats import (
    portable_round,
    portable_round_sql,
)
from electricity_forecast_pipeline_airflow_k8s_spark.queries import register, table
from electricity_forecast_pipeline_airflow_k8s_spark.querydefs.validation import EVENTS_SRC

LOOKBACK, HORIZON = 48, 12


# -- W4: chronological 70/15/15 split, exact floor semantics ----------------
@register(
    "ts_split_counts",
    oracle=f"""
WITH ranked AS (
  SELECT event_type,
         row_number() OVER (PARTITION BY event_type ORDER BY ts, event_id) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM {EVENTS_SRC}
)
SELECT event_type,
       CASE WHEN rn <= floor(n * 0.7) THEN 'train'
            WHEN rn <= floor(n * 0.7) + floor(n * 0.15) THEN 'val'
            ELSE 'test' END AS split,
       count(*) AS n_rows
FROM ranked GROUP BY 1, 2 ORDER BY 1, 2
""",
)
def q_split_counts(spark: SparkSession, sf_dir: str):
    ev = table(spark, "events", sf_dir)
    split = chronological_split(
        ev, group_col="event_type", ts_col="ts", tiebreak_cols=("event_id",)
    )
    return (
        split.groupBy("event_type", "split")
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .orderBy("event_type", "split")
    )


# -- W3: sequence-window count invariant: n - L - H + 1 per group -----------
# (`core/model.py:32-33`; the oracle IS the invariant)
@register(
    "ts_window_counts",
    oracle=f"""
SELECT event_type,
       greatest(count(*) - {LOOKBACK} - {HORIZON} + 1, 0) AS n_windows
FROM events GROUP BY event_type ORDER BY event_type
""",
)
def q_window_counts(spark: SparkSession, sf_dir: str):
    ev = table(spark, "events", sf_dir)
    wins = sequence_windows(
        ev,
        group_col="event_type",
        ts_col="ts",
        value_col="value",
        lookback=LOOKBACK,
        horizon=HORIZON,
        tiebreak_cols=("event_id",),
    )
    counts = wins.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_windows"))
    # groups too small for any window must still appear with 0; null-safe
    # join so a NULL group key keeps its real count (plain equality would
    # never match it and report 0)
    allg = ev.select("event_type").distinct()
    return (
        allg.join(
            counts.withColumnRenamed("event_type", "_g"),
            F.col("event_type").eqNullSafe(F.col("_g")),
            "left",
        )
        .select("event_type", F.coalesce("n_windows", F.lit(0)).alias("n_windows"))
        .orderBy("event_type")
    )


# -- W3: the windows themselves (x[L], y[H] arrays), early slice ------------
@register(
    "ts_sequence_windows",
    # Flat digest of each (x[L], y[H]) window: the driver canonicalizer
    # cannot sort array columns, so each window is proven by its length,
    # endpoints, and a DECIMAL-exact (summation-order-free) sum. The
    # arrays themselves stay the operator's product (ml/forecast consumes
    # them); only this registered projection is flattened.
    oracle=f"""
SELECT event_type, window_start,
       len(x) AS x_len, len(y) AS y_len,
       x[1] AS x_first, x[{LOOKBACK}] AS x_last,
       y[1] AS y_first, y[{HORIZON}] AS y_last,
       CAST(list_aggregate(list_transform(x, v -> CAST(v AS DECIMAL(18,2))), 'sum')
            AS DOUBLE) AS x_sum,
       CAST(list_aggregate(list_transform(y, v -> CAST(v AS DECIMAL(18,2))), 'sum')
            AS DOUBLE) AS y_sum
FROM (
  SELECT event_type, ts AS window_start,
         list(value) OVER (PARTITION BY event_type
              ORDER BY ts NULLS FIRST, event_id
              ROWS BETWEEN CURRENT ROW AND {LOOKBACK - 1} FOLLOWING) AS x,
         list(value) OVER (PARTITION BY event_type
              ORDER BY ts NULLS FIRST, event_id
              ROWS BETWEEN {LOOKBACK} FOLLOWING AND {LOOKBACK + HORIZON - 1} FOLLOWING) AS y
  FROM {EVENTS_SRC}
)
WHERE len(x) = {LOOKBACK} AND len(y) = {HORIZON}
  AND window_start < TIMESTAMP '2024-01-03'
ORDER BY event_type, window_start
""",
)
def q_sequence_windows(spark: SparkSession, sf_dir: str):
    ev = table(spark, "events", sf_dir)
    wins = sequence_windows(
        ev,
        group_col="event_type",
        ts_col="ts",
        value_col="value",
        lookback=LOOKBACK,
        horizon=HORIZON,
        tiebreak_cols=("event_id",),
    )

    def _dec_sum(col: str):
        return F.aggregate(
            col,
            F.lit(0).cast("decimal(28,2)"),
            lambda acc, v: (acc + v.cast("decimal(18,2)")).cast("decimal(28,2)"),
        ).cast("double")

    return (
        wins.filter(F.col("window_start") < "2024-01-03")
        .select(
            "event_type",
            "window_start",
            F.size("x").alias("x_len"),
            F.size("y").alias("y_len"),
            F.element_at("x", 1).alias("x_first"),
            F.element_at("x", LOOKBACK).alias("x_last"),
            F.element_at("y", 1).alias("y_first"),
            F.element_at("y", HORIZON).alias("y_last"),
            _dec_sum("x").alias("x_sum"),
            _dec_sum("y").alias("y_sum"),
        )
        .orderBy("event_type", "window_start")
    )


# -- W5: tail window (last N per group, ascending restored) -----------------
@register(
    "ts_tail_window",
    oracle=f"""
SELECT event_id, event_type, ts FROM (
  SELECT event_id, event_type, ts,
         row_number() OVER (PARTITION BY event_type ORDER BY ts DESC, event_id DESC)
           AS rn
  FROM {EVENTS_SRC}
) WHERE rn <= 50 ORDER BY event_type, ts, event_id
""",
)
def q_tail_window(spark: SparkSession, sf_dir: str):
    ev = table(spark, "events", sf_dir)
    tail = tail_window(
        ev, group_col="event_type", ts_col="ts", n=50, tiebreak_cols=("event_id",)
    )
    return tail.select("event_id", "event_type", "ts").orderBy(
        "event_type", "ts", "event_id"
    )


# -- U3/J3: scaler params as data (minmax + standard in one row per group) --
@register(
    "ts_scaler_params",
    oracle="""
SELECT event_type,
       floor((min(value)) * 10000 + 0.5) / 10000 AS v_min,
       floor((max(value)) * 10000 + 0.5) / 10000 AS v_max,
       floor((CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(value)) * 10000 + 0.5) / 10000
         AS v_mean,
       floor((stddev_pop(value)) * 10000 + 0.5) / 10000 AS v_std
FROM events GROUP BY event_type ORDER BY event_type
""",
)
def q_scaler_params(spark: SparkSession, sf_dir: str):
    from electricity_forecast_pipeline_airflow_k8s_spark.functions.stats import exact_mean

    ev = table(spark, "events", sf_dir)
    mm = fit_minmax(ev, group_col="event_type")
    st = fit_standard(ev, group_col="event_type")
    # exact-decimal mean for the comparison surface (the library scalers
    # keep full-precision avg(); 2-decimal input makes the cast lossless)
    means = ev.groupBy("event_type").agg(exact_mean("value").alias("v_mean_exact"))
    return (
        mm.join(st, "event_type")
        .join(means, "event_type")
        .select(
            "event_type",
            portable_round("v_min", 4).alias("v_min"),
            portable_round("v_max", 4).alias("v_max"),
            portable_round(F.col("v_mean_exact"), 4).alias("v_mean"),
            portable_round("v_std", 4).alias("v_std"),
        )
        .orderBy("event_type")
    )


# -- J3: scaled values via broadcast param join (leak-faithful full fit) ----
@register(
    "ts_scaled_values",
    oracle="""
WITH params AS (
  SELECT event_type, min(value) AS v_min, max(value) AS v_max
  FROM events GROUP BY event_type
)
SELECT e.event_id, e.event_type,
       CASE WHEN p.v_max != p.v_min
            THEN floor(((e.value - p.v_min) / (p.v_max - p.v_min)) * 10000 + 0.5) / 10000
            ELSE 0.0 END AS value_scaled
FROM events e JOIN params p USING (event_type)
WHERE e.event_id % 20 = 0
ORDER BY e.event_id
""",
)
def q_scaled_values(spark: SparkSession, sf_dir: str):
    ev = table(spark, "events", sf_dir)
    params = fit_minmax(ev, group_col="event_type")
    scaled = apply_minmax(ev, params, group_col="event_type")
    return (
        scaled.filter(F.col("event_id") % 20 == 0)
        .select(
            "event_id", "event_type", portable_round(F.col("value_scaled"), 4).alias("value_scaled")
        )
        .orderBy("event_id")
    )


# -- §2.9: tumbling-window resample (batch analog of streaming window()) ----
@register(
    "ts_resample_hourly",
    oracle=f"""
SELECT event_type, date_trunc('hour', ts) AS bucket,
       count(*) AS n,
       floor((CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(value)) * 10000 + 0.5) / 10000
         AS avg_value
FROM {EVENTS_SRC}
GROUP BY 1, 2 ORDER BY 1, 2
""",
)
def q_resample_hourly(spark: SparkSession, sf_dir: str):
    ev = table(spark, "events", sf_dir)
    return resample(ev, group_col="event_type", ts_col="ts", interval="hour")


# -- drift: PSI between reference and current windows (config.yaml:44-47) ---
@register(
    "ts_psi_drift",
    oracle="""
WITH bucketed AS (
  SELECT event_type,
         CASE WHEN ts < TIMESTAMP '2024-01-20' THEN 'ref' ELSE 'cur' END AS win,
         least(floor(value / 20.0), 9) AS bucket
  FROM events WHERE value IS NOT NULL
), counts AS (
  SELECT event_type, win, bucket, count(*) AS n FROM bucketed GROUP BY 1, 2, 3
), frac AS (
  SELECT event_type, win, bucket,
         n * 1.0 / sum(n) OVER (PARTITION BY event_type, win) AS p
  FROM counts
), pivoted AS (
  SELECT coalesce(r.event_type, c.event_type) AS event_type,
         coalesce(r.p, 0.0) AS p_ref, coalesce(c.p, 0.0) AS p_cur
  FROM (SELECT * FROM frac WHERE win = 'ref') r
  FULL JOIN (SELECT * FROM frac WHERE win = 'cur') c
    ON r.event_type = c.event_type AND r.bucket = c.bucket
)
SELECT event_type,
       floor((sum((p_ref + 1e-6 - p_cur - 1e-6) * ln((p_ref + 1e-6) / (p_cur + 1e-6)))) * 10000 + 0.5) / 10000
         AS psi
FROM pivoted GROUP BY event_type ORDER BY event_type
""",
)
def q_psi_drift(spark: SparkSession, sf_dir: str):
    ev = table(spark, "events", sf_dir)
    return psi_drift(
        ev,
        split_ts=F.lit("2024-01-20").cast("timestamp"),
        group_col="event_type",
        ts_col="ts",
        value_col="value",
    )


# -- drift: exact KS statistic via window-function ECDFs --------------------
@register(
    "ts_ks_drift",
    oracle="""
WITH tagged AS (
  SELECT event_type AS g, value AS v,
         CASE WHEN ts < TIMESTAMP '2024-01-20' THEN 'ref' ELSE 'cur' END AS win
  FROM events WHERE value IS NOT NULL
),
totals AS (
  SELECT g,
         sum(CASE WHEN win = 'ref' THEN 1 ELSE 0 END) AS n_ref,
         sum(CASE WHEN win = 'cur' THEN 1 ELSE 0 END) AS n_cur
  FROM tagged GROUP BY g
),
ecdf AS (
  SELECT g, v,
         sum(CASE WHEN win = 'ref' THEN 1 ELSE 0 END) OVER w AS cum_ref,
         sum(CASE WHEN win = 'cur' THEN 1 ELSE 0 END) OVER w AS cum_cur
  FROM tagged
  WINDOW w AS (PARTITION BY g ORDER BY v
               RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT e.g AS event_type,
       floor((max(abs(e.cum_ref * 1.0 / t.n_ref - e.cum_cur * 1.0 / t.n_cur))) * 10000 + 0.5) / 10000
         AS ks_stat
FROM ecdf e JOIN totals t USING (g)
WHERE t.n_ref > 0 AND t.n_cur > 0
GROUP BY e.g ORDER BY e.g
""",
)
def q_ks_drift(spark: SparkSession, sf_dir: str):
    ev = table(spark, "events", sf_dir)
    return ks_drift(
        ev,
        split_ts=F.lit("2024-01-20").cast("timestamp"),
        group_col="event_type",
        ts_col="ts",
        value_col="value",
    )


# -- hourly coverage: hours in span with no events (gap-fill analog) --------
@register(
    "ts_hour_coverage",
    oracle=f"""
WITH ev AS (SELECT event_type, ts::TIMESTAMP AS ts FROM events),
spans AS (
  SELECT event_type, date_trunc('hour', min(ts)) AS t0, date_trunc('hour', max(ts)) AS t1
  FROM ev GROUP BY event_type
), grid AS (
  SELECT event_type, unnest(generate_series(t0, t1, INTERVAL 1 HOUR)) AS hour_ts
  FROM spans
), obs AS (
  SELECT DISTINCT event_type, date_trunc('hour', ts) AS hour_ts FROM ev
)
SELECT g.event_type,
       count(*) AS n_hours,
       CAST(sum(CASE WHEN o.hour_ts IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_empty_hours
FROM grid g LEFT JOIN obs o
  ON g.event_type = o.event_type AND g.hour_ts = o.hour_ts
GROUP BY g.event_type ORDER BY g.event_type
""",
)
def q_hour_coverage(spark: SparkSession, sf_dir: str):
    ev = table(spark, "events", sf_dir)
    spans = ev.groupBy("event_type").agg(
        F.date_trunc("hour", F.min("ts")).alias("t0"),
        F.date_trunc("hour", F.max("ts")).alias("t1"),
    )
    grid = spans.select(
        "event_type",
        F.explode(F.sequence("t0", "t1", F.expr("INTERVAL 1 HOUR"))).alias("hour_ts"),
    )
    obs = ev.select(
        "event_type", F.date_trunc("hour", "ts").alias("hour_ts")
    ).distinct()
    return (
        grid.join(obs.withColumn("seen", F.lit(1)), ["event_type", "hour_ts"], "left")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_hours"),
            F.sum(F.when(F.col("seen").isNull(), 1).otherwise(0)).alias("n_empty_hours"),
        )
        .orderBy("event_type")
    )


# -- calendar feature engineering for forecasting (round 3) -----------------
# Aggregated per (group, hour, isodow) so the driver compares a bounded
# frame; the cyclic encodings are recomputed on the grouped keys, exactly
# the per-row expressions calendar_features() emits.
@register(
    "ts_calendar_features",
    oracle=f"""
WITH ev AS (
  SELECT event_type, ts::TIMESTAMP AS ts, value FROM events WHERE ts IS NOT NULL
)
SELECT event_type,
       hour(ts) AS hour,
       isodow(ts) AS isodow,
       (isodow(ts) >= 6) AS is_weekend,
       count(*) AS n,
       {portable_round_sql("avg(value)", 4)} AS avg_value,
       {portable_round_sql("sin(hour(ts) * 2 * pi() / 24.0)", 6)} AS hour_sin,
       {portable_round_sql("cos(hour(ts) * 2 * pi() / 24.0)", 6)} AS hour_cos,
       {portable_round_sql("sin((isodow(ts) - 1) * 2 * pi() / 7.0)", 6)} AS dow_sin,
       {portable_round_sql("cos((isodow(ts) - 1) * 2 * pi() / 7.0)", 6)} AS dow_cos
FROM ev GROUP BY 1, 2, 3, 4 ORDER BY 1, 2, 3
""",
)
def q_calendar_features(spark: SparkSession, sf_dir: str):
    ev = table(spark, "events", sf_dir).filter(F.col("ts").isNotNull())
    feats = calendar_features(ev, ts_col="ts", round_to=6)
    return (
        feats.groupBy("event_type", "hour", "isodow", "is_weekend")
        .agg(
            F.count(F.lit(1)).alias("n"),
            portable_round(F.avg("value"), 4).alias("avg_value"),
            F.first("hour_sin").alias("hour_sin"),
            F.first("hour_cos").alias("hour_cos"),
            F.first("dow_sin").alias("dow_sin"),
            F.first("dow_cos").alias("dow_cos"),
        )
        .orderBy("event_type", "hour", "isodow")
    )


# -- rolling-origin backtest folds (forecast HPO layout, round 3) -----------
@register(
    "ts_backtest_folds",
    oracle=f"""
WITH ev AS (
  SELECT event_type, ts::TIMESTAMP AS ts, event_id FROM events
),
ranked AS (
  SELECT event_type, ts,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY ts ASC NULLS LAST, event_id) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM ev
),
folds AS (
  SELECT r.*, f.fold FROM ranked r
  CROSS JOIN (SELECT unnest(range(4)) AS fold) f
),
tagged AS (
  SELECT event_type, fold, ts,
         CASE WHEN rn <= (fold + 1) * n // 5 THEN 'train'
              WHEN rn <= (fold + 2) * n // 5 THEN 'test' END AS part
  FROM folds
)
SELECT event_type, CAST(fold AS INT) AS fold,
       CAST(sum(CASE WHEN part = 'train' THEN 1 ELSE 0 END) AS BIGINT) AS train_n,
       CAST(sum(CASE WHEN part = 'test' THEN 1 ELSE 0 END) AS BIGINT) AS test_n,
       max(CASE WHEN part = 'train' THEN ts END) AS train_end_ts,
       max(CASE WHEN part = 'test' THEN ts END) AS test_end_ts
FROM tagged WHERE part IS NOT NULL
GROUP BY 1, 2 ORDER BY 1, 2
""",
)
def q_backtest_folds(spark: SparkSession, sf_dir: str):
    ev = table(spark, "events", sf_dir)
    out = backtest_folds(
        ev, n_folds=4, group_col="event_type", ts_col="ts", order_cols=("event_id",)
    )
    return out.withColumn("fold", F.col("fold").cast("int"))


# -- sub-hour resample via epoch bucketing (round 3) ------------------------
# date_trunc stops at minute/hour granularity; arbitrary-interval buckets
# (15 min here) come from integer epoch arithmetic -- pure codegen, and
# the same epoch-aligned semantics as DuckDB's time_bucket.
@register(
    "ts_resample_15min",
    oracle=f"""
WITH ev AS (
  SELECT event_type, time_bucket(INTERVAL '15 minutes', ts::TIMESTAMP) AS bucket,
         value
  FROM events WHERE ts IS NOT NULL
)
SELECT event_type, bucket,
       count(*) AS n,
       {portable_round_sql("CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(value)", 4)}
         AS avg_value
FROM ev GROUP BY 1, 2 ORDER BY 1, 2
""",
)
def q_resample_15min(spark: SparkSession, sf_dir: str):
    ev = table(spark, "events", sf_dir).filter(F.col("ts").isNotNull())
    step = 15 * 60 * 1_000_000
    bucket = F.timestamp_micros(
        (F.floor(F.unix_micros("ts") / step) * step).cast("long")
    )
    return (
        ev.select("event_type", bucket.alias("bucket"), "value")
        .groupBy("event_type", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            portable_round(
                F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
                / F.count("value"),
                4,
            ).alias("avg_value"),
        )
        .orderBy("event_type", "bucket")
    )


# -- per-group EWMA (round 4) ------------------------------------------------
# Exponentially weighted moving average: inherently RECURSIVE
# (y_i = a*x_i + (1-a)*y_{i-1}), so no window frame can express it -- this
# is the canonical applyInPandas case (SURVEY §2.10 U2), and unlike most
# Python-edge operators it still gets a FULL value oracle: DuckDB replays
# the identical recursion via a recursive CTE. Both sides compute
# a*x + (1.0 - a)*y in doubles in the same order, so values are
# bit-identical before the 6-decimal output rounding.
#
# Scale: one shuffle on the group key; each group's series streams through
# one Arrow batch sequence on one executor -- O(n) per group, the same
# distribution shape as per-group training.
_EWMA_ALPHA = 0.3

_EWMA_ORACLE = f"""
WITH RECURSIVE ev AS (
  SELECT event_type, event_id, value,
         row_number() OVER (PARTITION BY event_type ORDER BY ts, event_id) AS rn
  FROM {EVENTS_SRC} WHERE value IS NOT NULL AND ts IS NOT NULL
),
rec(event_type, rn, event_id, y) AS (
  SELECT event_type, rn, event_id, value FROM ev WHERE rn = 1
  UNION ALL
  SELECT e.event_type, e.rn, e.event_id,
         {_EWMA_ALPHA} * e.value + (1.0 - {_EWMA_ALPHA}) * r.y
  FROM ev e JOIN rec r ON e.event_type = r.event_type AND e.rn = r.rn + 1
)
SELECT event_type, event_id,
       floor(y * 1000000 + 0.5) / 1000000 AS ewma
FROM rec WHERE event_id % 25 = 0
ORDER BY event_type, event_id
"""


@register("ts_ewma", oracle=_EWMA_ORACLE)
def q_ts_ewma(spark: SparkSession, sf_dir: str):
    import pandas as pd

    ev = (
        table(spark, "events", sf_dir)
        .filter(F.col("value").isNotNull() & F.col("ts").isNotNull())
        .select("event_type", "event_id", "ts", "value")
    )
    alpha = _EWMA_ALPHA
    one_minus = 1.0 - alpha  # same literal subtraction as the oracle

    def ewma(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
        vals = pdf["value"].to_numpy()
        out = []
        acc = None
        for v in vals:
            acc = float(v) if acc is None else alpha * float(v) + one_minus * acc
            out.append(acc)
        pdf = pdf.assign(ewma=out)
        keep = pdf[pdf["event_id"] % 25 == 0]
        return keep[["event_type", "event_id", "ewma"]]

    out = ev.groupBy("event_type").applyInPandas(
        ewma, "event_type string, event_id long, ewma double"
    )
    return out.select(
        "event_type",
        "event_id",
        (F.floor(F.col("ewma") * 1000000 + 0.5) / 1000000).alias("ewma"),
    ).orderBy("event_type", "event_id")


# -- hourly gap fill with LOCF (round 4) ------------------------------------
# Spark: the bucket-parallel two-phase carry (operators/timeseries.py::
# gap_fill_locf) whose parallelism follows (group x day); oracle: the
# textbook ONE-window IGNORE NULLS form -- the scale restructure is proven
# row-identical to the reference semantics, not assumed.
@register(
    "ts_gap_fill_locf",
    oracle="""
WITH obs AS (
  SELECT event_type, date_trunc('hour', ts) AS hour,
         floor(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(value)
               * 10000 + 0.5) / 10000 AS v_obs
  FROM events WHERE ts IS NOT NULL
  GROUP BY 1, 2
),
span AS (SELECT event_type, min(hour) AS t0, max(hour) AS t1 FROM obs GROUP BY 1),
grid AS (
  SELECT s.event_type,
         unnest(generate_series(s.t0, s.t1, INTERVAL 1 HOUR)) AS hour
  FROM span s
),
joined AS (
  SELECT g.event_type, g.hour, o.v_obs
  FROM grid g LEFT JOIN obs o USING (event_type, hour)
)
SELECT event_type, hour,
       last_value(v_obs IGNORE NULLS) OVER (
         PARTITION BY event_type ORDER BY hour
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_filled,
       v_obs IS NULL AS is_gap
FROM joined ORDER BY event_type, hour
""",
)
def q_ts_gap_fill_locf(spark: SparkSession, sf_dir: str):
    from electricity_forecast_pipeline_airflow_k8s_spark.operators.timeseries import (
        gap_fill_locf,
    )

    ev = table(spark, "events", sf_dir)
    return gap_fill_locf(
        ev, group_col="event_type", ts_col="ts", value_col="value"
    ).orderBy("event_type", "hour")


# -- CUSUM changepoint (round 4) --------------------------------------------
# Level-shift detection per group: argmax |running sum of mean deviations|.
# Deviations quantized at 1e-6 into DECIMAL cumulative sums =
# association-order-free; deterministic tie-break (earliest row). Oracle
# re-derives everything with a window + row_number formulation.
@register(
    "ts_cusum_changepoint",
    oracle="""
WITH base AS (
  SELECT event_type, ts::TIMESTAMP AS ts, event_id, value
  FROM events WHERE value IS NOT NULL AND ts IS NOT NULL
),
mu AS (
  SELECT event_type,
         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(value) AS mu
  FROM base GROUP BY event_type
),
cs AS (
  SELECT b.event_type, b.ts, b.event_id,
         abs(sum(CAST(floor((b.value - m.mu) * 1000000 + 0.5) AS DECIMAL(28,0)))
             OVER (PARTITION BY b.event_type ORDER BY b.ts, b.event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS ac
  FROM base b JOIN mu m USING (event_type)
),
ranked AS (
  SELECT event_type, ts, ac,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY ac DESC, ts, event_id) AS rn
  FROM cs
)
SELECT event_type, ts AS cp_ts,
       floor(CAST(ac AS DOUBLE) / 1000000 * 10000 + 0.5) / 10000 AS max_abs_cusum
FROM ranked WHERE rn = 1 ORDER BY event_type
""",
)
def q_ts_cusum_changepoint(spark: SparkSession, sf_dir: str):
    from electricity_forecast_pipeline_airflow_k8s_spark.operators.timeseries import (
        cusum_changepoint,
    )

    ev = table(spark, "events", sf_dir)
    return cusum_changepoint(
        ev, group_col="event_type", ts_col="ts", value_col="value", id_col="event_id"
    ).orderBy("event_type")


# -- recursive CTE week spine (round 4) ------------------------------------
# Spark 4's WITH RECURSIVE (UNION ALL + terminating predicate -- Spark
# does not yet support UNION inside recursion, so only acyclic/linear
# recursions are expressible; cyclic closure stays on the iterative CC
# operator). A per-group week spine densified from each group's span,
# with zero-event weeks preserved -- the recursive twin of the
# sequence()-explode grid in gap_fill_locf, run as real recursion on BOTH
# engines.
@register(
    "ts_week_spine_rcte",
    oracle="""
WITH RECURSIVE spans AS (
  SELECT event_type,
         CAST(date_trunc('week', min(ts::TIMESTAMP)) AS TIMESTAMP) AS m0,
         CAST(date_trunc('week', max(ts::TIMESTAMP)) AS TIMESTAMP) AS m1
  FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL
  GROUP BY event_type
),
spine(event_type, week, m1) AS (
  SELECT event_type, m0, m1 FROM spans
  UNION ALL
  SELECT event_type, week + INTERVAL 7 DAY, m1
  FROM spine WHERE week < m1
),
counts AS (
  SELECT event_type, CAST(date_trunc('week', ts::TIMESTAMP) AS TIMESTAMP) AS week,
         count(*) AS n
  FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL
  GROUP BY 1, 2
)
SELECT s.event_type, s.week, coalesce(c.n, 0) AS n_events
FROM spine s LEFT JOIN counts c USING (event_type, week)
ORDER BY s.event_type, s.week
""",
)
def q_ts_week_spine_rcte(spark: SparkSession, sf_dir: str):
    ev = table(spark, "events", sf_dir)
    ev.filter(
        F.col("ts").isNotNull() & F.col("event_type").isNotNull()
    ).createOrReplaceTempView("events_rcte_src")
    return spark.sql(
        """
        WITH RECURSIVE spans AS (
          SELECT event_type,
                 date_trunc('week', min(ts)) AS m0,
                 date_trunc('week', max(ts)) AS m1
          FROM events_rcte_src GROUP BY event_type
        ),
        spine(event_type, week, m1) AS (
          SELECT event_type, m0, m1 FROM spans
          UNION ALL
          SELECT event_type, week + INTERVAL 7 DAY, m1
          FROM spine WHERE week < m1
        ),
        counts AS (
          SELECT event_type, date_trunc('week', ts) AS week, count(*) AS n
          FROM events_rcte_src GROUP BY 1, 2
        )
        SELECT s.event_type, s.week, coalesce(c.n, 0) AS n_events
        FROM spine s LEFT JOIN counts c USING (event_type, week)
        ORDER BY s.event_type, s.week
        """
    )


# -- seasonal-naive forecast error (round 4) --------------------------------
# The reference's RMSE / MAPE evaluation targets (`README.md:733-734`) as
# pure relational aggregates against the canonical baseline every
# forecaster must beat: predict value(t) = value(t - 24h). Hourly exact
# means, self-join on the shifted hour, per-term quantized decimal error
# sums (association-order free), sqrt/round at the edge.
@register(
    "ts_seasonal_naive_error",
    oracle="""
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS hour,
         floor(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(value)
               * 10000 + 0.5) / 10000 AS v
  FROM events WHERE ts IS NOT NULL
  GROUP BY 1, 2
),
paired AS (
  SELECT a.event_type, a.v AS actual, p.v AS pred
  FROM hourly a
  JOIN hourly p ON p.event_type = a.event_type
                AND p.hour = a.hour - INTERVAL 24 HOUR
  WHERE a.v IS NOT NULL AND p.v IS NOT NULL
),
terms AS (
  SELECT event_type,
         CAST(floor(abs(actual - pred) / abs(actual) * 100000000 + 0.5)
              AS DECIMAL(38,0)) AS qape,
         CAST(floor((actual - pred) * (actual - pred) * 10000 + 0.5)
              AS DECIMAL(38,0)) AS qse
  FROM paired WHERE actual <> 0
)
SELECT event_type,
       count(*) AS n_pairs,
       floor(CAST(sum(qape) AS DOUBLE) / count(*) / 100000000 * 1000000 + 0.5)
         / 1000000 AS mape,
       floor(sqrt(CAST(sum(qse) AS DOUBLE) / count(*) / 10000) * 10000 + 0.5)
         / 10000 AS rmse
FROM terms GROUP BY event_type ORDER BY event_type
""",
)
def q_ts_seasonal_naive_error(spark: SparkSession, sf_dir: str):
    from electricity_forecast_pipeline_airflow_k8s_spark.functions.stats import (
        exact_mean,
    )

    ev = table(spark, "events", sf_dir).filter(F.col("ts").isNotNull())
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hour")
    ).agg((F.floor(exact_mean("value") * 10000 + 0.5) / 10000).alias("v"))
    a = hourly.select("event_type", "hour", F.col("v").alias("actual"))
    p = hourly.select(
        "event_type",
        (F.col("hour") + F.expr("INTERVAL 24 HOUR")).alias("hour"),
        F.col("v").alias("pred"),
    )
    paired = (
        a.join(p, ["event_type", "hour"])
        .filter(F.col("actual").isNotNull() & F.col("pred").isNotNull())
        .filter(F.col("actual") != 0)
    )
    qape = F.floor(
        F.abs(F.col("actual") - F.col("pred")) / F.abs(F.col("actual")) * 100000000
        + 0.5
    ).cast("decimal(38,0)")
    qse = F.floor(
        (F.col("actual") - F.col("pred")) * (F.col("actual") - F.col("pred")) * 10000
        + 0.5
    ).cast("decimal(38,0)")
    return (
        paired.select("event_type", qape.alias("qape"), qse.alias("qse"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            (
                F.floor(
                    F.sum("qape").cast("double")
                    / F.count(F.lit(1))
                    / 100000000
                    * 1000000
                    + 0.5
                )
                / 1000000
            ).alias("mape"),
            (
                F.floor(
                    F.sqrt(F.sum("qse").cast("double") / F.count(F.lit(1)) / 10000)
                    * 10000
                    + 0.5
                )
                / 10000
            ).alias("rmse"),
        )
        .orderBy("event_type")
    )

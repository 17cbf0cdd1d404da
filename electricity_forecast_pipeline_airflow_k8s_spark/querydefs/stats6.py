"""Round-5 continuation: survival / long-memory / forecast-evaluation
operators — Kaplan-Meier repurchase survival, Hurst R/S exponent,
pinball-loss quantile-forecast evaluation, decile lift table, and the
Ljung-Box autocorrelation test.

Numeric policy (same as stats5/timeseries2): every group/window sum runs
on exact integers or fixed-decimal quantities so accumulation is
order-free; transcendentals (ln/log2/exp/sqrt) are applied once per row
to IDENTICAL doubles on both engines and quantized through the 1e9
fixed-point grid before any further summation; final outputs go through
the portable 1e-4 rounding grid.
"""

from __future__ import annotations

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from electricity_forecast_pipeline_airflow_k8s_spark.functions.stats import (
    portable_round,
)
from electricity_forecast_pipeline_airflow_k8s_spark.queries import register, table
from electricity_forecast_pipeline_airflow_k8s_spark.querydefs.validation import (
    EVENTS_SRC,
)

_FP = 1_000_000_000  # 1e9 fixed-point grid for per-row transcendentals


# -- Kaplan-Meier repurchase survival ---------------------------------------
# Survival curve over inter-order gaps: each consecutive order pair of a
# customer contributes an observed "repurchase after t days" event; the
# open gap from a customer's last order to the global max order date is a
# censored observation. Product-limit estimator S(t) = prod(1 - d/n) over
# event times, accumulated as a cumulative sum of per-time ln(1 - d/n)
# terms on the 1e9 grid (exact decimal cumsum, one exp at the edge).
#
# Scale: the lead() window shuffles the fact once on o_custkey (same
# shape as rel_purchase_gap_stats); everything after the groupBy(t) runs
# on #distinct-durations rows (bounded by the date span, thousands at
# most), so the single-partition KM windows never see fact-sized data.
# Reference parity: forecast-horizon retention curves
# (/root/reference/core/data_validation.py gap/coverage family).
@register(
    "rel_km_repurchase",
    oracle=f"""
WITH o AS (
  SELECT o_custkey AS c, o_orderdate::DATE AS d, o_orderkey AS k FROM orders
),
mx AS (SELECT max(d) AS mxd FROM o),
gaps AS (
  SELECT c, d, lead(d) OVER (PARTITION BY c ORDER BY d, k) AS nd FROM o
),
subj AS (
  SELECT CASE WHEN nd IS NULL THEN (SELECT mxd FROM mx) - d ELSE nd - d END AS t,
         CASE WHEN nd IS NULL THEN 0 ELSE 1 END AS ev
  FROM gaps
),
agg AS (
  SELECT t, sum(ev) AS d_ev, sum(1 - ev) AS c_cens, count(*) AS m
  FROM subj GROUP BY t
),
tot AS (SELECT count(*) AS n FROM subj),
risk AS (
  SELECT t, d_ev, c_cens,
         (SELECT n FROM tot)
           - coalesce(sum(m) OVER (ORDER BY t
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n_risk
  FROM agg
),
terms AS (
  SELECT t, d_ev, c_cens, n_risk,
         CASE WHEN d_ev = 0 OR d_ev >= n_risk THEN CAST(0 AS DECIMAL(28,0))
              ELSE CAST(floor(ln(1.0 - d_ev * 1.0 / n_risk) * {_FP} + 0.5)
                        AS DECIMAL(28,0)) END AS term_fp,
         CASE WHEN d_ev >= n_risk THEN 1 ELSE 0 END AS died_out
  FROM risk
),
surv AS (
  SELECT t, d_ev, c_cens, n_risk,
         sum(term_fp) OVER (ORDER BY t) AS logsum_fp,
         max(died_out) OVER (ORDER BY t) AS hit_zero
  FROM terms
)
SELECT CAST(t AS BIGINT) AS t_days, CAST(n_risk AS BIGINT) AS n_risk,
       CAST(d_ev AS BIGINT) AS n_events, CAST(c_cens AS BIGINT) AS n_censored,
       CASE WHEN hit_zero = 1 THEN 0.0
            ELSE floor(exp(CAST(logsum_fp AS DOUBLE) / {_FP}) * 10000 + 0.5)
                 / 10000 END AS survival
FROM surv WHERE d_ev > 0 ORDER BY t_days
""",
)
def q_rel_km_repurchase(spark: SparkSession, sf_dir: str):
    o = table(spark, "orders", sf_dir).select(
        F.col("o_custkey").alias("c"),
        F.col("o_orderdate").cast("date").alias("d"),
        F.col("o_orderkey").alias("k"),
    )
    mxd = o.agg(F.max("d").alias("mxd"))
    w = Window.partitionBy("c").orderBy("d", "k")
    subj = (
        o.withColumn("nd", F.lead("d").over(w))
        .crossJoin(F.broadcast(mxd))
        .select(
            F.when(
                F.col("nd").isNull(), F.datediff("mxd", "d")
            )
            .otherwise(F.datediff("nd", "d"))
            .alias("t"),
            F.when(F.col("nd").isNull(), F.lit(0)).otherwise(F.lit(1)).alias("ev"),
        )
    )
    agg = subj.groupBy("t").agg(
        F.sum("ev").alias("d_ev"),
        F.sum(1 - F.col("ev")).alias("c_cens"),
        F.count(F.lit(1)).alias("m"),
    )
    tot = subj.agg(F.count(F.lit(1)).alias("n"))
    wt = Window.orderBy("t")
    prior = wt.rowsBetween(Window.unboundedPreceding, -1)
    risk = agg.crossJoin(F.broadcast(tot)).withColumn(
        "n_risk",
        F.col("n") - F.coalesce(F.sum("m").over(prior), F.lit(0)),
    )
    terms = risk.select(
        "t",
        "d_ev",
        "c_cens",
        "n_risk",
        F.when(
            (F.col("d_ev") == 0) | (F.col("d_ev") >= F.col("n_risk")),
            F.lit(0).cast("decimal(28,0)"),
        )
        .otherwise(
            F.floor(
                F.log(1.0 - F.col("d_ev") * 1.0 / F.col("n_risk")) * _FP + 0.5
            ).cast("decimal(28,0)")
        )
        .alias("term_fp"),
        F.when(F.col("d_ev") >= F.col("n_risk"), F.lit(1))
        .otherwise(F.lit(0))
        .alias("died_out"),
    )
    cum = wt.rowsBetween(Window.unboundedPreceding, 0)
    surv = terms.select(
        "t",
        "d_ev",
        "c_cens",
        "n_risk",
        F.sum("term_fp").over(cum).alias("logsum_fp"),
        F.max("died_out").over(cum).alias("hit_zero"),
    )
    return (
        surv.filter(F.col("d_ev") > 0)
        .select(
            F.col("t").cast("long").alias("t_days"),
            F.col("n_risk").cast("long").alias("n_risk"),
            F.col("d_ev").cast("long").alias("n_events"),
            F.col("c_cens").cast("long").alias("n_censored"),
            F.when(F.col("hit_zero") == 1, F.lit(0.0))
            .otherwise(
                portable_round(
                    F.exp(F.col("logsum_fp").cast("double") / _FP), 4
                )
            )
            .alias("survival"),
        )
        .orderBy("t_days")
    )


# -- Hurst exponent via rescaled-range (R/S) analysis -----------------------
# Long-memory estimate of the hourly event-count series: for power-of-two
# window sizes w, split the dense hour spine into full chunks of w,
# compute the rescaled range R/S per chunk from exact-integer cumulative
# deviations (R = (max-min)/w of w*cumsum(x) - (pos+1)*sum(x); S from the
# integer moment identity), then fit log2(R/S) against log2(w) = {4..7}
# by closed-form least squares. H ~ 0.5 for a memoryless series.
#
# Scale: the only fact-sized stage is the groupBy(hour) count; chunk
# windows partition on (w, chunk) with frames capped at 128 rows, so
# parallelism follows #chunks, which grows linearly with the time span.
@register(
    "ts_hurst_rs",
    oracle=f"""
WITH ev AS (
  SELECT CAST(floor(date_part('epoch', ts) / 3600) AS BIGINT) AS h
  FROM {EVENTS_SRC} AS e WHERE ts IS NOT NULL
),
bounds AS (SELECT min(h) AS h0, max(h) AS h1 FROM ev),
spine AS (
  SELECT unnest(generate_series((SELECT h0 FROM bounds),
                                (SELECT h1 FROM bounds))) AS h
),
series AS (
  SELECT s.h - (SELECT h0 FROM bounds) AS idx, coalesce(c.n, 0) AS x
  FROM spine s
  LEFT JOIN (SELECT h, count(*) AS n FROM ev GROUP BY h) c ON c.h = s.h
),
total AS (SELECT count(*) AS n_hours FROM series),
sizes AS (SELECT unnest([16, 32, 64, 128]) AS w),
chunked AS (
  SELECT z.w, s.idx // z.w AS chunk, s.idx % z.w AS pos, s.x
  FROM series s CROSS JOIN sizes z
  WHERE s.idx // z.w < (SELECT n_hours FROM total) // z.w
),
run AS (
  SELECT w, chunk, pos, x,
         sum(x) OVER (PARTITION BY w, chunk ORDER BY pos) AS s_run,
         sum(x) OVER (PARTITION BY w, chunk) AS s_tot,
         sum(x * x) OVER (PARTITION BY w, chunk) AS ss_tot
  FROM chunked
),
devs AS (
  SELECT w, chunk, s_tot, ss_tot,
         max(w * s_run - (pos + 1) * s_tot) AS mx,
         min(w * s_run - (pos + 1) * s_tot) AS mn
  FROM run GROUP BY w, chunk, s_tot, ss_tot
),
rs AS (
  SELECT w,
         CAST(floor(log2((mx - mn) /
                sqrt(CAST(w AS DOUBLE) * ss_tot - CAST(s_tot AS DOUBLE) * s_tot))
                * {_FP} + 0.5) AS DECIMAL(28,0)) AS fp
  FROM devs WHERE w * ss_tot - s_tot * s_tot > 0
),
per_w AS (
  SELECT w, count(*) AS n_chunks,
         CAST(sum(fp) AS DOUBLE) / {_FP} / count(*) AS y
  FROM rs GROUP BY w
),
fit AS (
  SELECT (count(*) * sum(log2(w) * y) - sum(log2(w)) * sum(y))
         / (count(*) * sum(log2(w) * log2(w)) - sum(log2(w)) * sum(log2(w)))
           AS slope
  FROM per_w
)
SELECT CAST(w AS BIGINT) AS window_hours, CAST(n_chunks AS BIGINT) AS n_chunks,
       floor(y * 10000 + 0.5) / 10000 AS mean_log2_rs,
       floor((SELECT slope FROM fit) * 10000 + 0.5) / 10000 AS hurst_exponent
FROM per_w ORDER BY window_hours
""",
)
def q_ts_hurst_rs(spark: SparkSession, sf_dir: str):
    ev = (
        table(spark, "events", sf_dir)
        .filter(F.col("ts").isNotNull())
        .select(
            F.floor(F.unix_timestamp("ts") / 3600).cast("long").alias("h")
        )
    )
    cnts = ev.groupBy("h").agg(F.count(F.lit(1)).alias("n"))
    bounds = ev.agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
    spine = bounds.select(
        F.explode(F.sequence("h0", "h1")).alias("h"), "h0"
    )
    series = (
        spine.join(cnts, "h", "left")
        .select(
            (F.col("h") - F.col("h0")).alias("idx"),
            F.coalesce("n", F.lit(0)).alias("x"),
        )
    )
    total = series.agg(F.count(F.lit(1)).alias("n_hours"))
    sizes = spark.createDataFrame([(16,), (32,), (64,), (128,)], "w int")
    chunked = (
        series.crossJoin(F.broadcast(sizes))
        .crossJoin(F.broadcast(total))
        .filter(
            F.floor(F.col("idx") / F.col("w"))
            < F.floor(F.col("n_hours") / F.col("w"))
        )
        .select(
            "w",
            F.floor(F.col("idx") / F.col("w")).alias("chunk"),
            (F.col("idx") % F.col("w")).alias("pos"),
            "x",
        )
    )
    wc = Window.partitionBy("w", "chunk")
    wrun = wc.orderBy("pos")
    run = chunked.select(
        "w",
        "chunk",
        "pos",
        "x",
        F.sum("x").over(wrun).alias("s_run"),
        F.sum("x").over(wc).alias("s_tot"),
        F.sum(F.col("x") * F.col("x")).over(wc).alias("ss_tot"),
    )
    devs = run.groupBy("w", "chunk", "s_tot", "ss_tot").agg(
        F.max(
            F.col("w") * F.col("s_run") - (F.col("pos") + 1) * F.col("s_tot")
        ).alias("mx"),
        F.min(
            F.col("w") * F.col("s_run") - (F.col("pos") + 1) * F.col("s_tot")
        ).alias("mn"),
    )
    rs = devs.filter(
        F.col("w") * F.col("ss_tot") - F.col("s_tot") * F.col("s_tot") > 0
    ).select(
        "w",
        F.floor(
            F.log2(
                (F.col("mx") - F.col("mn"))
                / F.sqrt(
                    F.col("w").cast("double") * F.col("ss_tot")
                    - F.col("s_tot").cast("double") * F.col("s_tot")
                )
            )
            * _FP
            + 0.5
        )
        .cast("decimal(28,0)")
        .alias("fp"),
    )
    per_w = rs.groupBy("w").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        (F.sum("fp").cast("double") / _FP / F.count(F.lit(1))).alias("y"),
    )
    lw = F.log2(F.col("w"))
    fit = per_w.agg(
        (
            (F.count(F.lit(1)) * F.sum(lw * F.col("y")) - F.sum(lw) * F.sum("y"))
            / (F.count(F.lit(1)) * F.sum(lw * lw) - F.sum(lw) * F.sum(lw))
        ).alias("slope")
    )
    return (
        per_w.crossJoin(F.broadcast(fit))
        .select(
            F.col("w").cast("long").alias("window_hours"),
            F.col("n_chunks").cast("long").alias("n_chunks"),
            portable_round(F.col("y"), 4).alias("mean_log2_rs"),
            portable_round(F.col("slope"), 4).alias("hurst_exponent"),
        )
        .orderBy("window_hours")
    )


# -- Pinball loss of per-hour-of-day empirical quantile forecasts -----------
# Quantile-forecast evaluation: train on the first 80% of days, forecast
# each (event_type, hour-of-day) as the train-set exact quantile of the
# hourly mean value at q in {0.1, 0.5, 0.9}, score the held-out days with
# the pinball (quantile) loss. Exact percentile == quantile_cont is the
# proven A8 contract; per-row loss terms are quantized to the 1e9 grid
# before the order-free decimal mean.
#
# Scale: one fact shuffle to (event_type, hour) means; the forecast table
# is (types x 24 x 3) rows and broadcast to the test join.
@register(
    "ts_pinball_loss",
    oracle=f"""
WITH hourly AS (
  SELECT event_type,
         CAST(floor(date_part('epoch', ts) / 3600) AS BIGINT) AS hour_idx,
         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(value) AS hv
  FROM {EVENTS_SRC} AS e
  WHERE ts IS NOT NULL AND value IS NOT NULL
  GROUP BY 1, 2
),
days AS (SELECT min(hour_idx // 24) AS d0, max(hour_idx // 24) AS d1 FROM hourly),
split AS (
  SELECT d0 + CAST(floor((d1 - d0 + 1) * 0.8) AS BIGINT) AS cut FROM days
),
train AS (
  SELECT event_type, hour_idx % 24 AS how, hv FROM hourly
  WHERE hour_idx // 24 < (SELECT cut FROM split)
),
fc AS (
  SELECT event_type, how,
         quantile_cont(hv, 0.1) AS f10,
         quantile_cont(hv, 0.5) AS f50,
         quantile_cont(hv, 0.9) AS f90
  FROM train GROUP BY 1, 2
),
test AS (
  SELECT event_type, hour_idx % 24 AS how, hv FROM hourly
  WHERE hour_idx // 24 >= (SELECT cut FROM split)
),
scored AS (
  SELECT t.event_type, q.q,
         CAST(floor(greatest(q.q * (t.hv - q.f), (q.q - 1.0) * (t.hv - q.f))
                    * {_FP} + 0.5) AS DECIMAL(28,0)) AS term_fp
  FROM test t
  JOIN fc f ON f.event_type = t.event_type AND f.how = t.how
  CROSS JOIN LATERAL (
    SELECT unnest([0.1, 0.5, 0.9]) AS q,
           unnest([f.f10, f.f50, f.f90]) AS f
  ) q
)
SELECT event_type, q AS quantile, count(*) AS n_test_hours,
       floor(CAST(sum(term_fp) AS DOUBLE) / {_FP} / count(*) * 10000 + 0.5)
         / 10000 AS pinball_loss
FROM scored GROUP BY 1, 2 ORDER BY event_type, quantile
""",
)
def q_ts_pinball_loss(spark: SparkSession, sf_dir: str):
    hourly = (
        table(spark, "events", sf_dir)
        .filter(F.col("ts").isNotNull() & F.col("value").isNotNull())
        .groupBy(
            "event_type",
            F.floor(F.unix_timestamp("ts") / 3600).cast("long").alias("hour_idx"),
        )
        .agg(
            (
                F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
                / F.count("value")
            ).alias("hv")
        )
    )
    days = hourly.agg(
        F.min(F.floor(F.col("hour_idx") / 24)).alias("d0"),
        F.max(F.floor(F.col("hour_idx") / 24)).alias("d1"),
    )
    split = days.select(
        (
            F.col("d0")
            + F.floor((F.col("d1") - F.col("d0") + 1) * 0.8).cast("long")
        ).alias("cut")
    )
    base = hourly.crossJoin(F.broadcast(split)).withColumn(
        "how", F.col("hour_idx") % 24
    )
    train = base.filter(F.floor(F.col("hour_idx") / 24) < F.col("cut"))
    fc = train.groupBy("event_type", "how").agg(
        F.percentile("hv", F.lit(0.1)).alias("f10"),
        F.percentile("hv", F.lit(0.5)).alias("f50"),
        F.percentile("hv", F.lit(0.9)).alias("f90"),
    )
    test = base.filter(F.floor(F.col("hour_idx") / 24) >= F.col("cut"))
    joined = test.join(F.broadcast(fc), ["event_type", "how"])
    scored = joined.select(
        "event_type",
        F.explode(
            F.array(
                F.struct(F.lit(0.1).alias("q"), F.col("f10").alias("f")),
                F.struct(F.lit(0.5).alias("q"), F.col("f50").alias("f")),
                F.struct(F.lit(0.9).alias("q"), F.col("f90").alias("f")),
            )
        ).alias("p"),
        "hv",
    ).select(
        "event_type",
        F.col("p.q").alias("q"),
        F.floor(
            F.greatest(
                F.col("p.q") * (F.col("hv") - F.col("p.f")),
                (F.col("p.q") - 1.0) * (F.col("hv") - F.col("p.f")),
            )
            * _FP
            + 0.5
        )
        .cast("decimal(28,0)")
        .alias("term_fp"),
    )
    return (
        scored.groupBy("event_type", F.col("q").alias("quantile"))
        .agg(
            F.count(F.lit(1)).alias("n_test_hours"),
            portable_round(
                F.sum("term_fp").cast("double") / _FP / F.count(F.lit(1)), 4
            ).alias("pinball_loss"),
        )
        .orderBy("event_type", "quantile")
    )


# -- Decile lift table -------------------------------------------------------
# Model-evaluation staple: rank customers by account balance (the
# "score"), cut into deciles, and report per-decile buyer rate plus
# cumulative lift vs the base rate. ntile(10) over a total order
# (c_acctbal DESC, c_custkey) is deterministic across engines; every
# ratio is exact-integer-derived. The global window runs on the customer
# DIMENSION (same documented trade-off as rel_ntile_deciles; the
# distributed-offsets NTILE in rel_rfm_segments_scale is the fact-sized
# path).
@register(
    "rel_decile_lift",
    oracle="""
WITH buyers AS (SELECT DISTINCT o_custkey AS c FROM orders),
base AS (
  SELECT c_custkey, CASE WHEN b.c IS NULL THEN 0 ELSE 1 END AS buyer,
         ntile(10) OVER (ORDER BY c_acctbal DESC, c_custkey) AS decile
  FROM customer LEFT JOIN buyers b ON b.c = c_custkey
),
agg AS (
  SELECT decile, count(*) AS n_cust, sum(buyer) AS n_buyers
  FROM base GROUP BY decile
),
tot AS (SELECT sum(n_buyers) AS tb, sum(n_cust) AS tc FROM agg),
cum AS (
  SELECT decile, n_cust, n_buyers,
         sum(n_buyers) OVER (ORDER BY decile) AS cb,
         sum(n_cust) OVER (ORDER BY decile) AS cc
  FROM agg
)
SELECT decile, CAST(n_cust AS BIGINT) AS n_cust,
       CAST(n_buyers AS BIGINT) AS n_buyers,
       floor(n_buyers * 1.0 / n_cust * 10000 + 0.5) / 10000 AS buyer_rate,
       floor((cb * 1.0 / cc)
             / ((SELECT tb FROM tot) * 1.0 / (SELECT tc FROM tot))
             * 10000 + 0.5) / 10000 AS cum_lift
FROM cum ORDER BY decile
""",
)
def q_rel_decile_lift(spark: SparkSession, sf_dir: str):
    buyers = (
        table(spark, "orders", sf_dir)
        .select(F.col("o_custkey").alias("c"))
        .distinct()
    )
    cust = table(spark, "customer", sf_dir).select("c_custkey", "c_acctbal")
    base = (
        cust.join(buyers, cust.c_custkey == buyers.c, "left")
        .select(
            "c_custkey",
            "c_acctbal",
            F.when(F.col("c").isNull(), F.lit(0)).otherwise(F.lit(1)).alias("buyer"),
        )
        .withColumn(
            "decile",
            F.ntile(10).over(
                Window.orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
            ),
        )
    )
    agg = base.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_cust"), F.sum("buyer").alias("n_buyers")
    )
    tot = agg.agg(F.sum("n_buyers").alias("tb"), F.sum("n_cust").alias("tc"))
    wcum = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    cum = agg.select(
        "decile",
        "n_cust",
        "n_buyers",
        F.sum("n_buyers").over(wcum).alias("cb"),
        F.sum("n_cust").over(wcum).alias("cc"),
    )
    return (
        cum.crossJoin(F.broadcast(tot))
        .select(
            "decile",
            F.col("n_cust").cast("long").alias("n_cust"),
            F.col("n_buyers").cast("long").alias("n_buyers"),
            portable_round(F.col("n_buyers") * 1.0 / F.col("n_cust"), 4).alias(
                "buyer_rate"
            ),
            portable_round(
                (F.col("cb") * 1.0 / F.col("cc"))
                / (F.col("tb") * 1.0 / F.col("tc")),
                4,
            ).alias("cum_lift"),
        )
        .orderBy("decile")
    )


# -- Ljung-Box white-noise test ---------------------------------------------
# Per event type, test the dense zero-filled hourly-count series for
# autocorrelation: rho_k = c_k / c_0 from full-series-mean autocovariances
# (all sums exact integers -> identical doubles), cumulative Ljung-Box
# Q_k = n(n+2) * sum_{j<=k} rho_j^2 / (n - j) via a 6-row ordered window.
# Spark pairs x_t with x_{t-k} through a RANGE(-k,-k) frame on the dense
# spine (no join); the oracle re-derives the same pairs with an explicit
# idx equi-join — independent formulations.
@register(
    "ts_ljung_box",
    oracle=f"""
WITH ev AS (
  SELECT event_type,
         CAST(floor(date_part('epoch', ts) / 3600) AS BIGINT) AS h
  FROM {EVENTS_SRC} AS e WHERE ts IS NOT NULL
),
bounds AS (SELECT min(h) AS h0, max(h) AS h1 FROM ev),
spine AS (
  SELECT unnest(generate_series((SELECT h0 FROM bounds),
                                (SELECT h1 FROM bounds))) AS h
),
types AS (SELECT DISTINCT event_type FROM ev),
series AS (
  SELECT g.event_type, g.h - (SELECT h0 FROM bounds) AS idx,
         coalesce(c.n, 0) AS x
  FROM (SELECT t.event_type, s.h FROM types t CROSS JOIN spine s) g
  LEFT JOIN (SELECT event_type, h, count(*) AS n FROM ev GROUP BY 1, 2) c
    ON c.event_type = g.event_type AND c.h = g.h
),
stats AS (
  SELECT event_type, count(*) AS n, sum(x) AS sx, sum(x * x) AS sxx
  FROM series GROUP BY 1
),
lags AS (SELECT unnest([1, 2, 3, 4, 5, 6]) AS k),
pairs AS (
  SELECT a.event_type, l.k,
         sum(a.x * b.x) AS sxy, sum(a.x) AS sa, sum(b.x) AS sb,
         count(*) AS m
  FROM series a
  CROSS JOIN lags l
  JOIN series b ON b.event_type = a.event_type AND b.idx = a.idx - l.k
  GROUP BY 1, 2
),
rho AS (
  SELECT p.event_type, p.k, s.n,
         (p.sxy - (s.sx * 1.0 / s.n) * p.sa - (s.sx * 1.0 / s.n) * p.sb
            + (s.sx * 1.0 / s.n) * (s.sx * 1.0 / s.n) * p.m)
         / (s.sxx - (s.sx * 1.0 / s.n) * s.sx) AS r
  FROM pairs p JOIN stats s ON s.event_type = p.event_type
),
q AS (
  SELECT event_type, k, n, r,
         n * (n + 2.0) * sum(r * r / (n - k)) OVER (
           PARTITION BY event_type ORDER BY k) AS q_stat
  FROM rho
)
SELECT event_type, CAST(k AS BIGINT) AS lag, CAST(n AS BIGINT) AS n_hours,
       floor(r * 10000 + 0.5) / 10000 AS rho,
       floor(q_stat * 10000 + 0.5) / 10000 AS q_ljung_box
FROM q ORDER BY event_type, lag
""",
)
def q_ts_ljung_box(spark: SparkSession, sf_dir: str):
    lags = [1, 2, 3, 4, 5, 6]
    ev = (
        table(spark, "events", sf_dir)
        .filter(F.col("ts").isNotNull())
        .select(
            "event_type",
            F.floor(F.unix_timestamp("ts") / 3600).cast("long").alias("h"),
        )
    )
    bounds = ev.agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
    spine = bounds.select(F.explode(F.sequence("h0", "h1")).alias("h"), "h0")
    types = ev.select("event_type").distinct()
    cnts = ev.groupBy("event_type", "h").agg(F.count(F.lit(1)).alias("n"))
    series = (
        types.crossJoin(F.broadcast(spine))
        .join(cnts, ["event_type", "h"], "left")
        .select(
            "event_type",
            (F.col("h") - F.col("h0")).alias("idx"),
            F.coalesce("n", F.lit(0)).alias("x"),
        )
    )
    stats = series.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    lagged = series
    for k in lags:
        w = (
            Window.partitionBy("event_type")
            .orderBy("idx")
            .rangeBetween(-k, -k)
        )
        lagged = lagged.withColumn(f"x_lag{k}", F.first("x").over(w))
    stacked = lagged.select(
        "event_type",
        "x",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("k"), F.col(f"x_lag{k}").alias("y")
                    )
                    for k in lags
                ]
            )
        ).alias("p"),
    ).select("event_type", F.col("p.k").alias("k"), "x", F.col("p.y").alias("y"))
    pairs = (
        stacked.filter(F.col("y").isNotNull())
        .groupBy("event_type", "k")
        .agg(
            F.sum(F.col("x") * F.col("y")).alias("sxy"),
            F.sum("x").alias("sa"),
            F.sum("y").alias("sb"),
            F.count(F.lit(1)).alias("m"),
        )
    )
    m_mean = F.col("sx") * 1.0 / F.col("n")
    rho = pairs.join(F.broadcast(stats), "event_type").select(
        "event_type",
        "k",
        "n",
        (
            (
                F.col("sxy")
                - m_mean * F.col("sa")
                - m_mean * F.col("sb")
                + m_mean * m_mean * F.col("m")
            )
            / (F.col("sxx") - m_mean * F.col("sx"))
        ).alias("r"),
    )
    wq = (
        Window.partitionBy("event_type")
        .orderBy("k")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    q = rho.withColumn(
        "q_stat",
        F.col("n")
        * (F.col("n") + 2.0)
        * F.sum(F.col("r") * F.col("r") / (F.col("n") - F.col("k"))).over(wq),
    )
    return q.select(
        "event_type",
        F.col("k").cast("long").alias("lag"),
        F.col("n").cast("long").alias("n_hours"),
        portable_round(F.col("r"), 4).alias("rho"),
        portable_round(F.col("q_stat"), 4).alias("q_ljung_box"),
    ).orderBy("event_type", "lag")

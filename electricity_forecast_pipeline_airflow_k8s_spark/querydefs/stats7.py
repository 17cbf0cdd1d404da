"""Round-5 closing-stretch operators (batch 7).

Time-series risk/diagnostics: maximum drawdown of the hourly load level,
Lo-MacKinlay variance-ratio test for mean reversion, partial
autocorrelation (PACF) via the Durbin-Levinson recursion. Planning /
governance: power-law degree-distribution fit, largest-remainder integer
allocation, t-closeness privacy audit, sequential compaction planning,
out-of-vocabulary rate, K-step absorbing-Markov conversion probability,
Croston's intermittent-demand forecast.

Numeric policy (same as stats5/stats6/timeseries2): every group/window
sum runs on exact integers or fixed-decimal quantities so accumulation is
order-free; transcendentals (ln/exp/sqrt) are applied once per row to
IDENTICAL doubles on both engines and quantized through the 1e9
fixed-point grid before any further summation; final outputs go through
the portable 1e-4 rounding grid.

Reference parity: extends the validation/drift family of
/root/reference/core/data_validation.py (gap/coverage/outlier reporting)
with the risk, privacy, and planning diagnostics a production pipeline
runs beside it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from electricity_forecast_pipeline_airflow_k8s_spark.functions.stats import (
    portable_round,
)
from electricity_forecast_pipeline_airflow_k8s_spark.queries import register, table
from electricity_forecast_pipeline_airflow_k8s_spark.querydefs.validation import (
    EVENTS_SRC,
)

_FP = 1_000_000_000  # 1e9 fixed-point grid for per-row transcendentals

# Dense zero-filled hourly count series per event type -- the same spine
# construction ts_ljung_box uses (counts are exact integers, so every
# downstream sum is order-free). Shared by the variance-ratio and PACF
# operators below.
_SERIES_SQL = f"""
ev AS (
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
)
"""


def _dense_hourly_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_type, idx, x): zero-filled hourly event counts on a shared
    integer spine. One shuffle for the (type, hour) count, the spine and
    type list broadcast into the fill join."""
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
    return (
        types.crossJoin(F.broadcast(spine))
        .join(cnts, ["event_type", "h"], "left")
        .select(
            "event_type",
            (F.col("h") - F.col("h0")).alias("idx"),
            F.coalesce("n", F.lit(0)).alias("x"),
        )
    )


# -- Maximum drawdown of the hourly load level -------------------------------
# Per event type, treat the hourly mean value as a level series and
# report the worst peak-to-trough decline: running peak via a cumulative
# max window, drawdown = peak - level at each hour, plus the relative
# drawdown against the peak at the same hour. The classic risk metric for
# "how far below its best level has this meter/series fallen".
#
# Numerics: the hourly mean is an exact DECIMAL sum divided by an integer
# count -- one double, identical on both engines; the running max and the
# final maxima only SELECT among those identical doubles (no double
# accumulation anywhere).
#
# Scale: one shuffle for the hourly aggregate, one repartition by type
# for the cumulative window. The window partition is a single series
# whose length is bounded by the retention span in hours (tens of
# thousands of rows), never by event volume -- safe at 100x data.
@register(
    "ts_max_drawdown",
    oracle=f"""
WITH hourly AS (
  SELECT event_type,
         CAST(floor(date_part('epoch', ts) / 3600) AS BIGINT) AS hour_idx,
         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS hv
  FROM {EVENTS_SRC} AS e
  WHERE ts IS NOT NULL AND value IS NOT NULL
  GROUP BY 1, 2
),
dd AS (
  SELECT event_type, hv,
         max(hv) OVER (PARTITION BY event_type ORDER BY hour_idx
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS peak
  FROM hourly
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_hours,
       floor(max(peak) * 10000 + 0.5) / 10000 AS peak_value,
       floor(max(peak - hv) * 10000 + 0.5) / 10000 AS max_drawdown,
       floor(max(CASE WHEN peak <> 0 THEN (peak - hv) / peak END)
             * 10000 + 0.5) / 10000 AS max_drawdown_pct
FROM dd
GROUP BY event_type
ORDER BY event_type
""",
)
def q_ts_max_drawdown(spark: SparkSession, sf_dir: str):
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
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour_idx")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    dd = hourly.select(
        "event_type", "hv", F.max("hv").over(w).alias("peak")
    )
    return (
        dd.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_hours"),
            portable_round(F.max("peak"), 4).alias("peak_value"),
            portable_round(F.max(F.col("peak") - F.col("hv")), 4).alias(
                "max_drawdown"
            ),
            portable_round(
                F.max(
                    F.when(
                        F.col("peak") != 0,
                        (F.col("peak") - F.col("hv")) / F.col("peak"),
                    )
                ),
                4,
            ).alias("max_drawdown_pct"),
        )
        .orderBy("event_type")
    )


# -- Lo-MacKinlay variance-ratio test ----------------------------------------
# Per event type on the dense zero-filled hourly count series: VR(q) =
# Var(q-period differences) / (q * Var(1-period differences)), with
# overlapping q-period differences. VR < 1 signals mean reversion, VR > 1
# trending/persistence -- the complement of ts_hurst_rs from the
# long-memory family. q = 4 hours.
#
# Numerics: differences of integer counts are integers; both variances
# come from exact integer (sum, sum-of-squares) pairs, so every double is
# derived identically on both engines from exact sums.
#
# Scale: the spine-fill join broadcasts the spine; the per-type lag
# windows partition by series (bounded by span hours, not event volume).
@register(
    "ts_variance_ratio",
    oracle=f"""
WITH {_SERIES_SQL},
d1 AS (
  SELECT a.event_type, a.x - b.x AS d
  FROM series a JOIN series b
    ON b.event_type = a.event_type AND b.idx = a.idx - 1
),
dq AS (
  SELECT a.event_type, a.x - b.x AS d
  FROM series a JOIN series b
    ON b.event_type = a.event_type AND b.idx = a.idx - 4
),
v1 AS (
  SELECT event_type, count(*) AS m1, sum(d) AS s1, sum(d * d) AS ss1
  FROM d1 GROUP BY 1
),
vq AS (
  SELECT event_type, count(*) AS mq, sum(d) AS sq, sum(d * d) AS ssq
  FROM dq GROUP BY 1
)
SELECT v1.event_type,
       CAST(v1.m1 AS BIGINT) AS n_diffs_1,
       CAST(vq.mq AS BIGINT) AS n_diffs_q,
       floor((v1.ss1 * 1.0 / v1.m1 - (v1.s1 * 1.0 / v1.m1) * (v1.s1 * 1.0 / v1.m1))
             * 10000 + 0.5) / 10000 AS var_1,
       floor((vq.ssq * 1.0 / vq.mq - (vq.sq * 1.0 / vq.mq) * (vq.sq * 1.0 / vq.mq))
             * 10000 + 0.5) / 10000 AS var_q,
       floor((vq.ssq * 1.0 / vq.mq - (vq.sq * 1.0 / vq.mq) * (vq.sq * 1.0 / vq.mq))
             / (4.0 * (v1.ss1 * 1.0 / v1.m1
                       - (v1.s1 * 1.0 / v1.m1) * (v1.s1 * 1.0 / v1.m1)))
             * 10000 + 0.5) / 10000 AS variance_ratio
FROM v1 JOIN vq ON vq.event_type = v1.event_type
ORDER BY v1.event_type
""",
)
def q_ts_variance_ratio(spark: SparkSession, sf_dir: str):
    series = _dense_hourly_counts(spark, sf_dir)
    lagged = series
    for k in (1, 4):
        w = (
            Window.partitionBy("event_type")
            .orderBy("idx")
            .rangeBetween(-k, -k)
        )
        lagged = lagged.withColumn(f"x_lag{k}", F.first("x").over(w))
    diffs = lagged.select(
        "event_type",
        (F.col("x") - F.col("x_lag1")).alias("d1"),
        (F.col("x") - F.col("x_lag4")).alias("dq"),
    )
    agg = diffs.groupBy("event_type").agg(
        F.count("d1").alias("m1"),
        F.sum("d1").alias("s1"),
        F.sum(F.col("d1") * F.col("d1")).alias("ss1"),
        F.count("dq").alias("mq"),
        F.sum("dq").alias("sq"),
        F.sum(F.col("dq") * F.col("dq")).alias("ssq"),
    )
    var_1 = F.col("ss1") * 1.0 / F.col("m1") - (
        F.col("s1") * 1.0 / F.col("m1")
    ) * (F.col("s1") * 1.0 / F.col("m1"))
    var_q = F.col("ssq") * 1.0 / F.col("mq") - (
        F.col("sq") * 1.0 / F.col("mq")
    ) * (F.col("sq") * 1.0 / F.col("mq"))
    return agg.select(
        "event_type",
        F.col("m1").cast("long").alias("n_diffs_1"),
        F.col("mq").cast("long").alias("n_diffs_q"),
        portable_round(var_1, 4).alias("var_1"),
        portable_round(var_q, 4).alias("var_q"),
        portable_round(var_q / (4.0 * var_1), 4).alias("variance_ratio"),
    ).orderBy("event_type")


# -- Partial autocorrelation via Durbin-Levinson -----------------------------
# Per event type on the dense hourly count series: autocorrelations
# rho_1..rho_3 with the standard full-series-mean autocovariance (same
# estimator ts_ljung_box pins), then the Durbin-Levinson recursion for
# the partial autocorrelations:
#   phi_11 = r1
#   phi_22 = (r2 - r1^2) / (1 - r1^2)
#   phi_21 = r1 * (1 - phi_22)
#   phi_33 = (r3 - phi_21*r2 - phi_22*r1) / (1 - phi_21*r1 - phi_22*r2)
# The PACF is what an AR-order selection actually reads -- rho alone
# (ts_acf / ts_ljung_box) cannot separate direct lag-k dependence from
# propagated lag-1 dependence.
#
# Numerics: rho_k comes from exact integer sums; the recursion is scalar
# double arithmetic applied identically on both engines -- no double is
# ever summed across rows.
@register(
    "ts_pacf",
    oracle=f"""
WITH {_SERIES_SQL},
stats AS (
  SELECT event_type, count(*) AS n, sum(x) AS sx, sum(x * x) AS sxx
  FROM series GROUP BY 1
),
lags AS (SELECT unnest([1, 2, 3]) AS k),
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
  SELECT p.event_type, p.k,
         (p.sxy - (s.sx * 1.0 / s.n) * p.sa - (s.sx * 1.0 / s.n) * p.sb
            + (s.sx * 1.0 / s.n) * (s.sx * 1.0 / s.n) * p.m)
         / (s.sxx - (s.sx * 1.0 / s.n) * s.sx) AS r
  FROM pairs p JOIN stats s ON s.event_type = p.event_type
),
piv AS (
  SELECT event_type,
         max(CASE WHEN k = 1 THEN r END) AS r1,
         max(CASE WHEN k = 2 THEN r END) AS r2,
         max(CASE WHEN k = 3 THEN r END) AS r3
  FROM rho GROUP BY 1
),
phi AS (
  SELECT event_type, r1, r2, r3,
         r1 AS phi11,
         (r2 - r1 * r1) / (1 - r1 * r1) AS phi22
  FROM piv
),
phi2 AS (
  SELECT event_type, r1, r2, r3, phi11, phi22,
         r1 * (1 - phi22) AS phi21
  FROM phi
)
SELECT event_type, CAST(lag AS BIGINT) AS lag,
       floor(pacf * 10000 + 0.5) / 10000 AS pacf
FROM (
  SELECT event_type, 1 AS lag, phi11 AS pacf FROM phi2
  UNION ALL
  SELECT event_type, 2, phi22 FROM phi2
  UNION ALL
  SELECT event_type, 3,
         (r3 - phi21 * r2 - phi22 * r1) / (1 - phi21 * r1 - phi22 * r2)
  FROM phi2
)
ORDER BY event_type, lag
""",
)
def q_ts_pacf(spark: SparkSession, sf_dir: str):
    lags = [1, 2, 3]
    series = _dense_hourly_counts(spark, sf_dir)
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
                    F.struct(F.lit(k).alias("k"), F.col(f"x_lag{k}").alias("y"))
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
    piv = rho.groupBy("event_type").agg(
        F.max(F.when(F.col("k") == 1, F.col("r"))).alias("r1"),
        F.max(F.when(F.col("k") == 2, F.col("r"))).alias("r2"),
        F.max(F.when(F.col("k") == 3, F.col("r"))).alias("r3"),
    )
    phi22 = (F.col("r2") - F.col("r1") * F.col("r1")) / (
        F.lit(1.0) - F.col("r1") * F.col("r1")
    )
    phi = piv.select("event_type", "r1", "r2", "r3", phi22.alias("phi22"))
    phi = phi.withColumn("phi21", F.col("r1") * (1 - F.col("phi22")))
    phi33 = (
        F.col("r3") - F.col("phi21") * F.col("r2") - F.col("phi22") * F.col("r1")
    ) / (
        F.lit(1.0)
        - F.col("phi21") * F.col("r1")
        - F.col("phi22") * F.col("r2")
    )
    out = phi.select(
        "event_type",
        F.explode(
            F.array(
                F.struct(F.lit(1).alias("lag"), F.col("r1").alias("pacf")),
                F.struct(F.lit(2).alias("lag"), F.col("phi22").alias("pacf")),
                F.struct(F.lit(3).alias("lag"), phi33.alias("pacf")),
            )
        ).alias("p"),
    ).select(
        "event_type",
        F.col("p.lag").cast("long").alias("lag"),
        portable_round(F.col("p.pacf"), 4).alias("pacf"),
    )
    return out.orderBy("event_type", "lag")


# -- Power-law degree-distribution fit ---------------------------------------
# Degree of each customer in the customer->part bipartite purchase graph
# (distinct parts ever ordered), log2-bucketed histogram plus the
# continuous maximum-likelihood power-law exponent
#   alpha = 1 + n / sum(ln(d / (dmin - 1/2)))          (dmin = 1)
# (Clauset-Shalizi-Newman continuous approximation). The shape of this
# fit is what decides whether degree-skew mitigations (salting, skew-join
# hints) are needed downstream.
#
# Numerics: ln(2d) is one transcendental per row on identical integers,
# quantized to the 1e9 grid and summed in DECIMAL (exact, order-free;
# BIGINT sums would overflow at 100x cardinality). The log2 bucket is a
# per-row double op on identical inputs -> identical bucket ids.
#
# Scale: one join shuffle (orders |x| lineitem on orderkey), one distinct
# agg on (custkey, partkey), one count agg -- all key-partitioned; the
# histogram and alpha reductions run on degree-bounded rows.
@register(
    "graph_degree_powerlaw",
    oracle="""
WITH deg AS (
  SELECT o_custkey AS c, count(DISTINCT l_partkey) AS d
  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
  GROUP BY 1
),
fit AS (
  SELECT count(*) AS n,
         sum(CAST(floor(ln(2.0 * d) * 1000000000 + 0.5) AS DECIMAL(38,0)))
           AS slnq
  FROM deg
),
hist AS (
  SELECT CAST(floor(ln(d) / ln(2.0)) AS BIGINT) AS deg_bucket,
         count(*) AS n_custs
  FROM deg GROUP BY 1
)
SELECT deg_bucket, CAST(n_custs AS BIGINT) AS n_custs,
       floor(n_custs * 1.0 / (SELECT n FROM fit) * 10000 + 0.5) / 10000
         AS share,
       floor((1.0 + (SELECT n FROM fit)
                    / (CAST((SELECT slnq FROM fit) AS DOUBLE) / 1000000000))
             * 10000 + 0.5) / 10000 AS alpha_mle
FROM hist ORDER BY deg_bucket
""",
)
def q_graph_degree_powerlaw(spark: SparkSession, sf_dir: str):
    orders = table(spark, "orders", sf_dir).select("o_orderkey", "o_custkey")
    li = table(spark, "lineitem", sf_dir).select("l_orderkey", "l_partkey")
    deg = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("o_custkey")
        .agg(F.countDistinct("l_partkey").alias("d"))
    )
    fit = deg.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.floor(F.log(2.0 * F.col("d")) * _FP + 0.5).cast("decimal(38,0)")
        ).alias("slnq"),
    )
    hist = deg.groupBy(
        F.floor(F.log("d") / F.log(F.lit(2.0))).cast("long").alias("deg_bucket")
    ).agg(F.count(F.lit(1)).alias("n_custs"))
    return (
        hist.crossJoin(F.broadcast(fit))
        .select(
            "deg_bucket",
            F.col("n_custs").cast("long").alias("n_custs"),
            portable_round(F.col("n_custs") * 1.0 / F.col("n"), 4).alias(
                "share"
            ),
            portable_round(
                1.0 + F.col("n") / (F.col("slnq").cast("double") / _FP), 4
            ).alias("alpha_mle"),
        )
        .orderBy("deg_bucket")
    )


# -- Largest-remainder integer allocation ------------------------------------
# Allocate a fixed integer budget (1000 capacity units) across nations
# proportionally to customer-order revenue using the Hare-quota
# largest-remainder method: floor every quota, then hand the leftover
# units to the largest fractional remainders (nation key breaks ties).
# The standard exact-integer answer to "split N shards / slots / seats
# proportionally" -- float rounding would over- or under-allocate.
#
# Numerics: revenue is an exact DECIMAL(18,2) sum; the quota is scalar
# double arithmetic on identical inputs; floors, ranks, and the leftover
# count are exact integers. The final seat vector provably sums to the
# budget (pinned in tests).
#
# Scale: one fact shuffle (orders grouped by custkey->nation via a
# broadcast dim join); everything after the nation rollup is
# dimension-sized (25 rows), so the single-partition ranking window is
# metadata work.
@register(
    "rel_largest_remainder_alloc",
    oracle="""
WITH rev AS (
  SELECT n_nationkey, n_name,
         sum(CAST(o_totalprice AS DECIMAL(18,2))) AS r
  FROM orders
  JOIN customer ON c_custkey = o_custkey
  JOIN nation ON n_nationkey = c_nationkey
  GROUP BY 1, 2
),
tot AS (SELECT sum(r) AS t FROM rev),
quota AS (
  SELECT n_nationkey, n_name, r,
         CAST(r AS DOUBLE) * 1000 / CAST((SELECT t FROM tot) AS DOUBLE) AS q
  FROM rev
),
base AS (
  SELECT *, CAST(floor(q) AS BIGINT) AS b, q - floor(q) AS frac FROM quota
),
leftover AS (SELECT 1000 - sum(b) AS k FROM base),
ranked AS (
  SELECT *, row_number() OVER (ORDER BY frac DESC, n_nationkey) AS rk
  FROM base
)
SELECT n_nationkey, n_name,
       floor(CAST(r AS DOUBLE) * 100 + 0.5) / 100 AS revenue,
       floor(q * 10000 + 0.5) / 10000 AS quota,
       CAST(b + CASE WHEN rk <= (SELECT k FROM leftover) THEN 1 ELSE 0 END
            AS BIGINT) AS seats
FROM ranked ORDER BY n_nationkey
""",
)
def q_rel_largest_remainder_alloc(spark: SparkSession, sf_dir: str):
    orders = table(spark, "orders", sf_dir).select("o_custkey", "o_totalprice")
    cust = table(spark, "customer", sf_dir).select("c_custkey", "c_nationkey")
    nation = table(spark, "nation", sf_dir).select("n_nationkey", "n_name")
    rev = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_nationkey", "n_name")
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("r"))
    )
    tot = rev.agg(F.sum("r").alias("t"))
    quota = rev.crossJoin(F.broadcast(tot)).select(
        "n_nationkey",
        "n_name",
        "r",
        (F.col("r").cast("double") * 1000 / F.col("t").cast("double")).alias(
            "q"
        ),
    )
    base = quota.select(
        "*",
        F.floor("q").cast("long").alias("b"),
        (F.col("q") - F.floor("q")).alias("frac"),
    )
    leftover = base.agg((F.lit(1000) - F.sum("b")).alias("k"))
    ranked = base.withColumn(
        "rk",
        F.row_number().over(
            Window.orderBy(F.col("frac").desc(), F.col("n_nationkey"))
        ),
    )
    return (
        ranked.crossJoin(F.broadcast(leftover))
        .select(
            "n_nationkey",
            "n_name",
            portable_round(F.col("r").cast("double"), 2).alias("revenue"),
            portable_round(F.col("q"), 4).alias("quota"),
            (
                F.col("b")
                + F.when(F.col("rk") <= F.col("k"), F.lit(1)).otherwise(0)
            )
            .cast("long")
            .alias("seats"),
        )
        .orderBy("n_nationkey")
    )


# -- t-closeness privacy audit ------------------------------------------------
# Completes the k-anonymity / l-diversity suite (val_k_anonymity): for
# each quasi-identifier group (nation, market segment), the Earth Mover's
# Distance between the group's distribution of the ordered sensitive
# attribute (account-balance k$ bucket) and the global distribution:
#   EMD = sum_i |cumP_i - cumQ_i| / (m - 1)
# over the global ordered bucket domain. A group with small size can
# still leak if its balance distribution diverges -- that is what
# t-closeness catches and k-anonymity cannot.
#
# Numerics: cumP and cumQ are ratios of integer cumulative counts
# (exact); the per-bucket |diff| is quantized to the 1e9 grid and
# integer-summed, so the EMD sum is order-free.
#
# Scale: one shuffle for the (group, bucket) counts; the dense
# group x bucket grid is dimension-sized (quasi-identifier cardinality x
# bucket domain), so the windows run on metadata-scale rows no matter how
# many customer rows feed them.
@register(
    "val_t_closeness",
    oracle="""
WITH c AS (
  SELECT c_nationkey AS nat, c_mktsegment AS seg,
         CAST(floor(c_acctbal / 1000) AS BIGINT) AS b
  FROM customer
),
gb AS (SELECT nat, seg, b, count(*) AS cnt FROM c GROUP BY 1, 2, 3),
groups AS (SELECT nat, seg, sum(cnt) AS gn FROM gb GROUP BY 1, 2),
buckets AS (SELECT b, sum(cnt) AS tot FROM gb GROUP BY 1),
n AS (SELECT sum(cnt) AS nt, count(DISTINCT b) AS m FROM gb),
grid AS (
  SELECT g.nat, g.seg, g.gn, k.b, k.tot, coalesce(x.cnt, 0) AS cnt
  FROM groups g CROSS JOIN buckets k
  LEFT JOIN gb x ON x.nat = g.nat AND x.seg = g.seg AND x.b = k.b
),
cum AS (
  SELECT nat, seg, gn,
         sum(cnt) OVER (PARTITION BY nat, seg ORDER BY b) AS cp,
         sum(tot) OVER (PARTITION BY nat, seg ORDER BY b) AS cq
  FROM grid
),
emd AS (
  SELECT nat, seg, gn,
         sum(CAST(floor(abs(cp * 1.0 / gn - cq * 1.0 / (SELECT nt FROM n))
                        * 1000000000 + 0.5) AS BIGINT)) AS s
  FROM cum GROUP BY 1, 2, 3
)
SELECT nat AS c_nationkey, seg AS c_mktsegment,
       CAST(gn AS BIGINT) AS group_size,
       floor((s / 1000000000.0) / ((SELECT m FROM n) - 1) * 10000 + 0.5)
         / 10000 AS emd
FROM emd ORDER BY c_nationkey, c_mktsegment
""",
)
def q_val_t_closeness(spark: SparkSession, sf_dir: str):
    c = table(spark, "customer", sf_dir).select(
        F.col("c_nationkey").alias("nat"),
        F.col("c_mktsegment").alias("seg"),
        F.floor(F.col("c_acctbal") / 1000).cast("long").alias("b"),
    )
    gb = c.groupBy("nat", "seg", "b").agg(F.count(F.lit(1)).alias("cnt"))
    groups = gb.groupBy("nat", "seg").agg(F.sum("cnt").alias("gn"))
    buckets = gb.groupBy("b").agg(F.sum("cnt").alias("tot"))
    n = gb.agg(
        F.sum("cnt").alias("nt"), F.countDistinct("b").alias("m")
    )
    grid = (
        groups.crossJoin(F.broadcast(buckets))
        .join(gb, ["nat", "seg", "b"], "left")
        .select(
            "nat",
            "seg",
            "gn",
            "b",
            "tot",
            F.coalesce("cnt", F.lit(0)).alias("cnt"),
        )
    )
    w = (
        Window.partitionBy("nat", "seg")
        .orderBy("b")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = grid.select(
        "nat",
        "seg",
        "gn",
        F.sum("cnt").over(w).alias("cp"),
        F.sum("tot").over(w).alias("cq"),
    )
    emd = (
        cum.crossJoin(F.broadcast(n))
        .groupBy("nat", "seg", "gn", "m")
        .agg(
            F.sum(
                F.floor(
                    F.abs(
                        F.col("cp") * 1.0 / F.col("gn")
                        - F.col("cq") * 1.0 / F.col("nt")
                    )
                    * _FP
                    + 0.5
                ).cast("long")
            ).alias("s")
        )
    )
    return emd.select(
        F.col("nat").alias("c_nationkey"),
        F.col("seg").alias("c_mktsegment"),
        F.col("gn").cast("long").alias("group_size"),
        portable_round(
            (F.col("s") / float(_FP)) / (F.col("m") - 1), 4
        ).alias("emd"),
    ).orderBy("c_nationkey", "c_mktsegment")


# -- Sequential compaction plan ----------------------------------------------
# Small-file compaction planning: treat each order day as one input file
# (bytes estimated from its row count), walk the files in date order, and
# cut output bins every time the running byte total crosses the target
# size (total/32 -- one output file per shuffle slot). Exactly the greedy
# plan a table-maintenance job (OPTIMIZE / compaction) executes; the
# output reports per-bin file counts, bytes, and fill ratio so skewed
# bins are visible before any data is rewritten.
#
# Numerics/semantics: byte counts and the running cumulative sum are
# exact integers; bin id = floor((cum-1)/target) assigns each file to the
# bin its cumulative end lands in, so bins can overshoot by at most one
# file -- the standard streaming bin-packing bound, documented here.
#
# Scale: the per-day size listing is metadata (one row per file/day, not
# per data row) produced by one key-partitioned count shuffle; only that
# listing flows through the single-partition cumulative window, same as a
# real compaction planner reading a file manifest.
@register(
    "layout_compaction_plan",
    oracle="""
WITH files AS (
  SELECT CAST(o_orderdate AS DATE) AS day, count(*) * 120 AS bytes
  FROM orders GROUP BY 1
),
tot AS (
  SELECT sum(bytes) AS tb,
         CAST(ceil(sum(bytes) / 32.0) AS BIGINT) AS target
  FROM files
),
packed AS (
  SELECT day, bytes,
         CAST(floor((sum(bytes) OVER (ORDER BY day) - 1)
                    * 1.0 / (SELECT target FROM tot)) AS BIGINT) AS bin
  FROM files
)
SELECT bin, CAST(count(*) AS BIGINT) AS n_files,
       CAST(sum(bytes) AS BIGINT) AS bytes,
       CAST(min(day) AS VARCHAR) AS first_day,
       CAST(max(day) AS VARCHAR) AS last_day,
       floor(sum(bytes) * 1.0 / (SELECT target FROM tot) * 10000 + 0.5)
         / 10000 AS fill_ratio
FROM packed GROUP BY bin ORDER BY bin
""",
)
def q_layout_compaction_plan(spark: SparkSession, sf_dir: str):
    files = (
        table(spark, "orders", sf_dir)
        .groupBy(F.col("o_orderdate").cast("date").alias("day"))
        .agg((F.count(F.lit(1)) * 120).alias("bytes"))
    )
    tot = files.agg(
        F.ceil(F.sum("bytes") / 32.0).cast("long").alias("target")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    packed = files.crossJoin(F.broadcast(tot)).select(
        "day",
        "bytes",
        "target",
        F.floor((F.sum("bytes").over(w) - 1) * 1.0 / F.col("target"))
        .cast("long")
        .alias("bin"),
    )
    return (
        packed.groupBy("bin", "target")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_files"),
            F.sum("bytes").cast("long").alias("bytes"),
            F.min("day").cast("string").alias("first_day"),
            F.max("day").cast("string").alias("last_day"),
        )
        .select(
            "bin",
            "n_files",
            "bytes",
            "first_day",
            "last_day",
            portable_round(
                F.col("bytes") * 1.0 / F.col("target"), 4
            ).alias("fill_ratio"),
        )
        .orderBy("bin")
    )


_P6 = 10**6  # transition-probability fixed-point scale (same as pagerank)
_R9 = 10**9  # probability fixed-point scale


def _absorbing_oracle() -> str:
    head = f"""
WITH seq AS (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM {EVENTS_SRC}
  WHERE ts IS NOT NULL AND user_id IS NOT NULL
),
trans AS (
  SELECT a.event_type AS u, b.event_type AS v, count(*) AS c
  FROM seq a JOIN seq b ON b.user_id = a.user_id AND b.rn = a.rn + 1
  WHERE a.event_type <> 'purchase'
  GROUP BY 1, 2
),
outdeg AS (SELECT u, sum(c) AS tot FROM trans GROUP BY 1),
pm AS (
  SELECT t.u, t.v, (t.c * {_P6}) // o.tot AS p_fp
  FROM trans t JOIN outdeg o ON o.u = t.u
),
p1 AS (
  SELECT o.u, coalesce((
    SELECT (t.c * {_R9}) // o.tot FROM trans t
    WHERE t.u = o.u AND t.v = 'purchase'), 0) AS p_fp
  FROM outdeg o
)"""
    steps = []
    prev = "p1"
    for i in (2, 3):
        steps.append(
            f""",
p{i} AS (
  SELECT b.u, b.p_fp + coalesce((
    SELECT sum((w.p_fp * q.p_fp) // {_P6})
    FROM pm w JOIN {prev} q ON q.u = w.v
    WHERE w.u = b.u AND w.v <> 'purchase'), 0) AS p_fp
  FROM p1 b
)"""
        )
        prev = f"p{i}"
    tail = f"""
SELECT p1.u AS event_type,
       floor(p1.p_fp * 1.0 / {_R9 // 10000} + 0.5) / 10000 AS p_within_1,
       floor(p2.p_fp * 1.0 / {_R9 // 10000} + 0.5) / 10000 AS p_within_2,
       floor(p3.p_fp * 1.0 / {_R9 // 10000} + 0.5) / 10000 AS p_within_3
FROM p1 JOIN p2 ON p2.u = p1.u JOIN p3 ON p3.u = p1.u
ORDER BY event_type
"""
    return head + "".join(steps) + tail


# -- K-step absorbing-Markov conversion probability ---------------------------
# From the per-user event-type transition chain (same edge derivation as
# graph_pagerank / sess_markov_transitions), treat 'purchase' as an
# absorbing state and report, for every other state s, the probability
# of converting within 1, 2, and 3 steps:
#   p_k(s) = P(s->purchase) + sum_{m != purchase} P(s->m) * p_{k-1}(m).
# This answers "how close is each behavior state to a purchase" --
# next-step accuracy (sess_next_pred_accuracy) can't see multi-hop paths.
#
# Determinism: all probabilities live on fixed-point integer grids
# (transitions 1e6, probabilities 1e9) with per-term quantization before
# any sum -- integer sums are associative, so Spark matches the oracle's
# unrolled CTE iterations bit-for-bit (same policy as graph_pagerank).
#
# Scale: one events-sized pass for the bigram window + transition agg;
# every iteration joins node-bounded tables (|event types|^2 edges).
@register("sess_absorbing_markov", oracle=_absorbing_oracle())
def q_sess_absorbing_markov(spark: SparkSession, sf_dir: str):
    ev = (
        table(spark, "events", sf_dir)
        .filter(F.col("ts").isNotNull() & F.col("user_id").isNotNull())
        .select("user_id", "event_type", "ts", "event_id")
    )
    wseq = Window.partitionBy("user_id").orderBy("ts", "event_id")
    trans = (
        ev.withColumn("v", F.lead("event_type").over(wseq))
        .filter(F.col("v").isNotNull() & (F.col("event_type") != "purchase"))
        .groupBy(F.col("event_type").alias("u"), "v")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    # round-12 F4 (guide §2.4): `trans` feeds outdeg, the weight matrix
    # and the direct-conversion probe -- three consumers that each re-ran
    # the events-sized window pass in the lazy bench bracket. One
    # materialization; every leg reads the |event types|^2-bounded blocks.
    from electricity_forecast_pipeline_airflow_k8s_spark.operators.partitioning import (
        reuse,
    )

    trans = reuse(trans)
    outdeg = trans.groupBy("u").agg(F.sum("c").alias("tot"))
    pm = trans.join(outdeg, "u").select(
        "u", "v", F.expr(f"(c * {_P6}) div tot").alias("p_fp")
    )
    p_direct = (
        trans.filter(F.col("v") == "purchase")
        .join(outdeg, "u")
        .select("u", F.expr(f"(c * {_R9}) div tot").alias("d_fp"))
    )
    p1 = outdeg.join(p_direct, "u", "left").select(
        "u", F.coalesce("d_fp", F.lit(0)).alias("p_fp")
    )
    prev = p1
    outs = {1: p1}
    for i in (2, 3):
        cont = (
            pm.filter(F.col("v") != "purchase")
            .join(
                prev.select(F.col("u").alias("v"), F.col("p_fp").alias("q_fp")),
                "v",
            )
            .groupBy("u")
            .agg(F.sum(F.expr(f"(p_fp * q_fp) div {_P6}")).alias("s"))
        )
        prev = p1.join(cont, "u", "left").select(
            "u",
            (F.col("p_fp") + F.coalesce("s", F.lit(0))).alias("p_fp"),
        )
        outs[i] = prev
    j = (
        outs[1]
        .select("u", F.col("p_fp").alias("f1"))
        .join(outs[2].select("u", F.col("p_fp").alias("f2")), "u")
        .join(outs[3].select("u", F.col("p_fp").alias("f3")), "u")
    )
    q = _R9 // 10000
    return j.select(
        F.col("u").alias("event_type"),
        (F.floor(F.col("f1") * 1.0 / q + 0.5) / 10000).alias("p_within_1"),
        (F.floor(F.col("f2") * 1.0 / q + 0.5) / 10000).alias("p_within_2"),
        (F.floor(F.col("f3") * 1.0 / q + 0.5) / 10000).alias("p_within_3"),
    ).orderBy("event_type")


# -- Out-of-vocabulary rate ---------------------------------------------------
# Tokenizer-coverage audit: build the top-256 global token vocabulary
# (count desc, token asc -- a total order, so the cut is deterministic)
# and report per source the share of token OCCURRENCES and of distinct
# token TYPES that fall outside it. The standard pre-training check for
# "does the tokenizer/vocab cover this source, or will it shatter into
# bytes" -- complements text_tokenizer_fertility (cost) with coverage.
#
# Numerics: counts and distinct counts are exact integers; the two rates
# are single divisions rounded through the portable grid.
#
# Scale: one explode+agg for global counts (shuffle bounded by vocab
# cardinality after map-side combine), the 256-row vocabulary broadcast
# into the per-source probe join -- no second corpus-sized shuffle.
@register(
    "text_oov_rate",
    oracle=f"""
WITH tok AS (
  SELECT source, t.tok
  FROM documents, unnest({{toks}}) AS t(tok)
),
vocab AS (
  SELECT tok FROM (
    SELECT tok, count(*) AS c FROM tok GROUP BY 1
    ORDER BY c DESC, tok LIMIT 256
  )
),
per AS (
  SELECT s.source,
         count(*) AS n_occ,
         sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS oov_occ
  FROM tok s LEFT JOIN vocab v ON v.tok = s.tok
  GROUP BY 1
),
types AS (
  SELECT s.source,
         count(DISTINCT s.tok) AS n_types,
         count(DISTINCT CASE WHEN v.tok IS NULL THEN s.tok END) AS oov_types
  FROM tok s LEFT JOIN vocab v ON v.tok = s.tok
  GROUP BY 1
)
SELECT p.source,
       CAST(p.n_occ AS BIGINT) AS n_occurrences,
       CAST(t.n_types AS BIGINT) AS n_types,
       floor(p.oov_occ * 1.0 / p.n_occ * 10000 + 0.5) / 10000
         AS oov_occurrence_rate,
       floor(t.oov_types * 1.0 / t.n_types * 10000 + 0.5) / 10000
         AS oov_type_rate
FROM per p JOIN types t ON t.source = p.source
ORDER BY p.source
""".replace(
        "{toks}",
        r"list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x != '')",
    ),
)
def q_text_oov_rate(spark: SparkSession, sf_dir: str):
    from electricity_forecast_pipeline_airflow_k8s_spark.operators.text import (
        tokens,
    )

    docs = table(spark, "documents", sf_dir)
    tok = docs.select(
        "source", F.explode(tokens("text")).alias("tok")
    )
    vocab = (
        tok.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), "tok")
        .limit(256)
        .select("tok", F.lit(1).alias("in_vocab"))
    )
    probed = tok.join(F.broadcast(vocab), "tok", "left")
    per = probed.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_occ"),
        F.sum(F.when(F.col("in_vocab").isNull(), 1).otherwise(0)).alias(
            "oov_occ"
        ),
        F.countDistinct("tok").alias("n_types"),
        F.countDistinct(
            F.when(F.col("in_vocab").isNull(), F.col("tok"))
        ).alias("oov_types"),
    )
    return per.select(
        "source",
        F.col("n_occ").cast("long").alias("n_occurrences"),
        F.col("n_types").cast("long").alias("n_types"),
        portable_round(F.col("oov_occ") * 1.0 / F.col("n_occ"), 4).alias(
            "oov_occurrence_rate"
        ),
        portable_round(F.col("oov_types") * 1.0 / F.col("n_types"), 4).alias(
            "oov_type_rate"
        ),
    ).orderBy("source")


# -- Croston's intermittent-demand forecast -----------------------------------
# The forecasting companion to ts_intermittency_stats (same brand x
# ship-day demand series): simple exponential smoothing (alpha = 0.1)
# over (a) nonzero demand sizes and (b) inter-demand intervals, closed
# form instead of a sequential scan:
#   z_n = (1-a)^(n-1) d_1 + a * sum_{k>=2} (1-a)^(n-k) d_k
# and the same for intervals; forecast/day = z/p, with the
# Syntetos-Boylan (SBA) bias correction (1 - a/2) z/p. Croston is the
# standard method when most periods have zero demand and plain SES
# systematically overshoots.
#
# Numerics: the geometric weight is one exp/ln pair per row on identical
# (n - k) integers; each weighted term is quantized to the 1e9 grid and
# integer-summed (order-free), divisions happen once per brand at the
# edge.
#
# Scale: one shuffle for the daily demand agg, one brand-partitioned
# window pass for (row_number, lag, count) -- series length per brand is
# bounded by the date span, never by lineitem volume.
@register(
    "ts_croston",
    oracle="""
WITH daily AS (
  SELECT p.p_brand, l.l_shipdate::DATE AS d,
         CAST(sum(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS q
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  GROUP BY 1, 2
),
seq AS (
  SELECT p_brand, d, q,
         row_number() OVER (PARTITION BY p_brand ORDER BY d) AS k,
         count(*) OVER (PARTITION BY p_brand) AS n,
         d - lag(d) OVER (PARTITION BY p_brand ORDER BY d) AS iv
  FROM daily
),
dsum AS (
  SELECT p_brand, max(n) AS n,
         sum(CAST(floor(q * (CASE WHEN k = 1 THEN 1.0 ELSE 0.1 END)
                        * exp((n - k) * ln(0.9)) * 1000000000 + 0.5)
                  AS BIGINT)) AS z_fp
  FROM seq GROUP BY 1
),
psum AS (
  SELECT p_brand,
         sum(CAST(floor(iv * (CASE WHEN k = 2 THEN 1.0 ELSE 0.1 END)
                        * exp((n - k) * ln(0.9)) * 1000000000 + 0.5)
                  AS BIGINT)) AS p_fp
  FROM seq WHERE iv IS NOT NULL GROUP BY 1
)
SELECT d.p_brand,
       CAST(d.n AS BIGINT) AS n_demand_days,
       floor(d.z_fp / 1000000000.0 * 10000 + 0.5) / 10000 AS croston_size,
       floor(p.p_fp / 1000000000.0 * 10000 + 0.5) / 10000
         AS croston_interval_days,
       floor((d.z_fp * 1.0 / p.p_fp) * 10000 + 0.5) / 10000
         AS forecast_per_day,
       floor((d.z_fp * 1.0 / p.p_fp) * 0.95 * 10000 + 0.5) / 10000
         AS forecast_sba
FROM dsum d JOIN psum p ON p.p_brand = d.p_brand
WHERE d.n >= 2
ORDER BY d.p_brand
""",
)
def q_ts_croston(spark: SparkSession, sf_dir: str):
    li = table(spark, "lineitem", sf_dir)
    p = table(spark, "part", sf_dir).select("p_partkey", "p_brand")
    daily = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", F.col("l_shipdate").cast("date").alias("d"))
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("double")
            .alias("q")
        )
    )
    wo = Window.partitionBy("p_brand").orderBy("d")
    wall = Window.partitionBy("p_brand")
    seq = daily.select(
        "p_brand",
        "q",
        F.row_number().over(wo).alias("k"),
        F.count(F.lit(1)).over(wall).alias("n"),
        F.datediff(F.col("d"), F.lag("d").over(wo)).alias("iv"),
    )
    # geometric SES weight: exp((n-k) ln 0.9), leading term unscaled
    decay = F.exp((F.col("n") - F.col("k")) * F.log(F.lit(0.9)))
    a_or_1 = F.when(F.col("k") == 1, F.lit(1.0)).otherwise(F.lit(0.1))
    a_or_1_iv = F.when(F.col("k") == 2, F.lit(1.0)).otherwise(F.lit(0.1))
    dsum = seq.groupBy("p_brand").agg(
        F.max("n").alias("n"),
        F.sum(
            F.floor(F.col("q") * a_or_1 * decay * _FP + 0.5).cast("long")
        ).alias("z_fp"),
    )
    psum = (
        seq.filter(F.col("iv").isNotNull())
        .groupBy("p_brand")
        .agg(
            F.sum(
                F.floor(F.col("iv") * a_or_1_iv * decay * _FP + 0.5).cast(
                    "long"
                )
            ).alias("p_fp")
        )
    )
    out = dsum.join(psum, "p_brand").filter(F.col("n") >= 2)
    rate = F.col("z_fp") * 1.0 / F.col("p_fp")
    return out.select(
        "p_brand",
        F.col("n").cast("long").alias("n_demand_days"),
        portable_round(F.col("z_fp") / float(_FP), 4).alias("croston_size"),
        portable_round(F.col("p_fp") / float(_FP), 4).alias(
            "croston_interval_days"
        ),
        portable_round(rate, 4).alias("forecast_per_day"),
        portable_round(rate * 0.95, 4).alias("forecast_sba"),
    ).orderBy("p_brand")


# -- Load duration curve -------------------------------------------------------
# The power-engineering standard summary: per event type, the hourly load
# level (mean value) that is EXCEEDED during p% of all hours, for the
# canonical exceedance points 1/5/10/25/50/75/90%. Capacity planning
# reads this curve directly ("what load must we cover 95% of the time");
# it is the sorted-duration view that plain moment stats can't give.
#
# Numerics: hv is an exact DECIMAL sum over an integer count; the
# exceedance level is one exact interpolated percentile (Spark
# `percentile` == DuckDB `quantile_cont`, the A8-pinned pair) per point
# on identical doubles.
#
# Scale: one hourly-aggregate shuffle; the exact percentile runs per
# type over span-bounded hourly rows (the quarantine note on exact
# whole-partition percentiles in operators/profile.py applies -- at 100x
# the sketch path quality_profile_scale demonstrates the swap).
@register(
    "ts_load_duration_curve",
    oracle=f"""
WITH hourly AS (
  SELECT event_type,
         CAST(floor(date_part('epoch', ts) / 3600) AS BIGINT) AS h,
         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS hv
  FROM {EVENTS_SRC} AS e
  WHERE ts IS NOT NULL AND value IS NOT NULL
  GROUP BY 1, 2
),
agg AS (
  SELECT event_type,
         quantile_cont(hv, 0.99) AS q1,
         quantile_cont(hv, 0.95) AS q5,
         quantile_cont(hv, 0.90) AS q10,
         quantile_cont(hv, 0.75) AS q25,
         quantile_cont(hv, 0.50) AS q50,
         quantile_cont(hv, 0.25) AS q75,
         quantile_cont(hv, 0.10) AS q90
  FROM hourly GROUP BY 1
)
SELECT event_type, CAST(p AS BIGINT) AS exceedance_pct,
       floor(lv * 10000 + 0.5) / 10000 AS load_level
FROM agg, (VALUES (1), (5), (10), (25), (50), (75), (90)) pts(p),
LATERAL (SELECT CASE p WHEN 1 THEN q1 WHEN 5 THEN q5 WHEN 10 THEN q10
                       WHEN 25 THEN q25 WHEN 50 THEN q50 WHEN 75 THEN q75
                       ELSE q90 END AS lv)
ORDER BY event_type, exceedance_pct
""",
)
def q_ts_load_duration_curve(spark: SparkSession, sf_dir: str):
    pts = [1, 5, 10, 25, 50, 75, 90]
    hourly = (
        table(spark, "events", sf_dir)
        .filter(F.col("ts").isNotNull() & F.col("value").isNotNull())
        .groupBy(
            "event_type",
            F.floor(F.unix_timestamp("ts") / 3600).cast("long").alias("h"),
        )
        .agg(
            (
                F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
                / F.count("value")
            ).alias("hv")
        )
    )
    curve = hourly.groupBy("event_type").agg(
        *[
            F.percentile("hv", F.lit(1.0 - p / 100.0)).alias(f"q{p}")
            for p in pts
        ]
    )
    return (
        curve.select(
            "event_type",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(p).cast("long").alias("exceedance_pct"),
                            F.col(f"q{p}").alias("lv"),
                        )
                        for p in pts
                    ]
                )
            ).alias("e"),
        )
        .select(
            "event_type",
            "e.exceedance_pct",
            portable_round(F.col("e.lv"), 4).alias("load_level"),
        )
        .orderBy("event_type", "exceedance_pct")
    )


# -- Conditional value-at-risk of hourly ramps --------------------------------
# Per event type: the 95th-percentile absolute hour-over-hour ramp
# (VaR95) and the MEAN absolute ramp beyond it (CVaR / expected
# shortfall) -- what reserve capacity must actually absorb once the rare
# ramp happens. Complements ts_ramp_rate_stats (moments) with the tail
# expectation.
#
# Numerics: ramps are differences of identical doubles; VaR is the exact
# interpolated percentile; the tail mean quantizes each selected |ramp|
# to the 1e9 grid and integer-sums, so the only double sums are
# order-free fixed-point.
@register(
    "ts_cvar_ramp",
    oracle=f"""
WITH hourly AS (
  SELECT event_type,
         CAST(floor(date_part('epoch', ts) / 3600) AS BIGINT) AS h,
         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS hv
  FROM {EVENTS_SRC} AS e
  WHERE ts IS NOT NULL AND value IS NOT NULL
  GROUP BY 1, 2
),
ramp AS (
  SELECT event_type,
         abs(hv - lag(hv) OVER (PARTITION BY event_type ORDER BY h)) AS r
  FROM hourly
),
thr AS (
  SELECT event_type, quantile_cont(r, 0.95) AS var95
  FROM ramp WHERE r IS NOT NULL GROUP BY 1
),
tail AS (
  SELECT ramp.event_type, count(*) AS n_tail,
         sum(CAST(floor(r * 1000000000 + 0.5) AS BIGINT)) AS s_fp
  FROM ramp JOIN thr ON thr.event_type = ramp.event_type
  WHERE r > var95
  GROUP BY 1
)
SELECT t.event_type,
       floor(h.var95 * 10000 + 0.5) / 10000 AS var95_ramp,
       CAST(t.n_tail AS BIGINT) AS n_tail,
       floor(t.s_fp / 1000000000.0 / t.n_tail * 10000 + 0.5) / 10000
         AS cvar95_ramp
FROM tail t JOIN thr h ON h.event_type = t.event_type
ORDER BY t.event_type
""",
)
def q_ts_cvar_ramp(spark: SparkSession, sf_dir: str):
    hourly = (
        table(spark, "events", sf_dir)
        .filter(F.col("ts").isNotNull() & F.col("value").isNotNull())
        .groupBy(
            "event_type",
            F.floor(F.unix_timestamp("ts") / 3600).cast("long").alias("h"),
        )
        .agg(
            (
                F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
                / F.count("value")
            ).alias("hv")
        )
    )
    wseq = Window.partitionBy("event_type").orderBy("h")
    ramp = hourly.select(
        "event_type",
        F.abs(F.col("hv") - F.lag("hv").over(wseq)).alias("r"),
    ).filter(F.col("r").isNotNull())
    thr = ramp.groupBy("event_type").agg(
        F.percentile("r", F.lit(0.95)).alias("var95")
    )
    tail = (
        ramp.join(F.broadcast(thr), "event_type")
        .filter(F.col("r") > F.col("var95"))
        .groupBy("event_type", "var95")
        .agg(
            F.count(F.lit(1)).alias("n_tail"),
            F.sum(F.floor(F.col("r") * _FP + 0.5).cast("long")).alias("s_fp"),
        )
    )
    return tail.select(
        "event_type",
        portable_round(F.col("var95"), 4).alias("var95_ramp"),
        F.col("n_tail").cast("long").alias("n_tail"),
        portable_round(
            F.col("s_fp") / float(_FP) / F.col("n_tail"), 4
        ).alias("cvar95_ramp"),
    ).orderBy("event_type")


# -- mutual information (feature relevance, round 6) --------------------------
# I(X;Y) between event_type and hour-of-day -- THE feature-selection
# screen for categorical features against a target, complementing
# val_cramers_v's chi2 (effect size) with the information-theoretic view
# (bits shared). Exact integer cell counts; each cell's
# p(x,y) * log2(p(x,y)/(p(x)p(y))) term is quantized to the 1e-9 grid
# before the order-free decimal summation (the repo's entropy
# convention), and marginal entropies ride the same cells frame for the
# normalized variant. Scale: one hash agg to the (x, y) grid (|X|x|Y|
# cells), window sums over that tiny frame only.
@register(
    "val_mutual_information",
    oracle=f"""
WITH cells AS (
  SELECT event_type AS x, CAST(date_part('hour', ts) AS INTEGER) AS y,
         count(*) AS c
  FROM {EVENTS_SRC} WHERE ts IS NOT NULL AND event_type IS NOT NULL
  GROUP BY 1, 2
),
m AS (
  SELECT x, y, c,
         sum(c) OVER (PARTITION BY x) AS cx,
         sum(c) OVER (PARTITION BY y) AS cy,
         sum(c) OVER () AS n
  FROM cells
),
terms AS (
  SELECT x, y, c, cx, cy, n,
         floor((c * 1.0 / n) * log2((c * 1.0 * n) / (cx * 1.0 * cy))
               * 1e9 + 0.5) / 1e9 AS mi_t,
         floor(-(c * 1.0 / n) * log2(c * 1.0 / n) * 1e9 + 0.5) / 1e9 AS hxy_t
  FROM m
),
hx AS (
  SELECT sum(floor(-(cx * 1.0 / n) * log2(cx * 1.0 / n) * 1e9 + 0.5) / 1e9)
           AS h
  FROM (SELECT DISTINCT x, cx, n FROM m)
),
hy AS (
  SELECT sum(floor(-(cy * 1.0 / n) * log2(cy * 1.0 / n) * 1e9 + 0.5) / 1e9)
           AS h
  FROM (SELECT DISTINCT y, cy, n FROM m)
)
SELECT CAST(max(n) AS BIGINT) AS n,
       CAST(count(*) AS BIGINT) AS n_cells,
       floor(sum(CAST(mi_t AS DECIMAL(28,9))) * 10000 + 0.5) / 10000
         AS mi_bits,
       floor(sum(CAST(hxy_t AS DECIMAL(28,9))) * 10000 + 0.5) / 10000
         AS joint_entropy_bits,
       floor((SELECT h FROM hx) * 10000 + 0.5) / 10000 AS hx_bits,
       floor((SELECT h FROM hy) * 10000 + 0.5) / 10000 AS hy_bits,
       floor(sum(CAST(mi_t AS DECIMAL(28,9)))
             / least((SELECT h FROM hx), (SELECT h FROM hy))
             * 10000 + 0.5) / 10000 AS normalized_mi
FROM terms
""",
)
def q_val_mutual_information(spark: SparkSession, sf_dir: str):
    from pyspark.sql import Window

    ev = table(spark, "events", sf_dir).filter(
        F.col("ts").isNotNull() & F.col("event_type").isNotNull()
    )
    cells = ev.groupBy(
        F.col("event_type").alias("x"), F.hour("ts").alias("y")
    ).agg(F.count(F.lit(1)).alias("c"))
    m = (
        cells.withColumn("cx", F.sum("c").over(Window.partitionBy("x")))
        .withColumn("cy", F.sum("c").over(Window.partitionBy("y")))
        .withColumn("n", F.sum("c").over(Window.partitionBy()))
    )
    q9 = lambda col: F.floor(col * 1e9 + 0.5) / 1e9  # noqa: E731
    log2 = F.log2  # noqa: E731
    mi_t = q9(
        (F.col("c") / F.col("n"))
        * log2((F.col("c") * F.col("n")) / (F.col("cx") * F.col("cy")))
    )
    hxy_t = q9(-(F.col("c") / F.col("n")) * log2(F.col("c") / F.col("n")))
    terms = m.select("x", "y", "c", "cx", "cy", "n", mi_t.alias("mi_t"), hxy_t.alias("hxy_t"))
    hx = (
        terms.select("x", "cx", "n")
        .distinct()
        .agg(F.sum(q9(-(F.col("cx") / F.col("n")) * log2(F.col("cx") / F.col("n")))).alias("h"))
    )
    hy = (
        terms.select("y", "cy", "n")
        .distinct()
        .agg(F.sum(q9(-(F.col("cy") / F.col("n")) * log2(F.col("cy") / F.col("n")))).alias("h"))
    )
    r4 = lambda col: F.floor(col * 10000 + 0.5) / 10000  # noqa: E731
    agg = terms.agg(
        F.max("n").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("n_cells"),
        F.sum(F.col("mi_t").cast("decimal(28,9)")).alias("_mi"),
        F.sum(F.col("hxy_t").cast("decimal(28,9)")).alias("_hxy"),
    )
    return (
        agg.crossJoin(F.broadcast(hx.select(F.col("h").alias("_hx"))))
        .crossJoin(F.broadcast(hy.select(F.col("h").alias("_hy"))))
        .select(
            "n",
            "n_cells",
            r4(F.col("_mi")).alias("mi_bits"),
            r4(F.col("_hxy")).alias("joint_entropy_bits"),
            r4(F.col("_hx")).alias("hx_bits"),
            r4(F.col("_hy")).alias("hy_bits"),
            r4(F.col("_mi") / F.least(F.col("_hx"), F.col("_hy"))).alias(
                "normalized_mi"
            ),
        )
    )


# -- Simpson's-paradox screen (round 6) ---------------------------------------
# The aggregation trap every analytics pipeline should test for: the
# value~hour-of-day slope computed over ALL events can contradict the
# slope within every stratum when group mix shifts across the x range.
# One pass computes the pooled slope and each stratum's slope from the
# SQL-standard REGR_* moments (the ml_linreg_trend convention: exact
# 6-moment state, rounding at the edge) and flags sign reversals --
# slope quantized to the 1e-6 grid BEFORE the sign compare so a
# +1e-12/-1e-12 noise slope never flips the flag across engines.
@register(
    "val_simpson_slope_reversal",
    oracle=f"""
WITH ev AS (
  SELECT event_type, CAST(date_part('hour', ts) AS DOUBLE) AS x, value AS y
  FROM {EVENTS_SRC} WHERE ts IS NOT NULL AND value IS NOT NULL
),
pooled AS (
  SELECT floor(regr_slope(y, x) * 1e6 + 0.5) / 1e6 AS s FROM ev
),
per_group AS (
  SELECT event_type,
         CAST(regr_count(y, x) AS BIGINT) AS n,
         floor(regr_slope(y, x) * 1e6 + 0.5) / 1e6 AS gs
  FROM ev GROUP BY 1
)
SELECT g.event_type,
       g.n,
       g.gs AS group_slope,
       p.s AS pooled_slope,
       (sign(g.gs) <> sign(p.s) AND g.gs <> 0 AND p.s <> 0) AS reversed
FROM per_group g CROSS JOIN pooled p
ORDER BY g.event_type
""",
)
def q_val_simpson_slope_reversal(spark: SparkSession, sf_dir: str):
    ev = (
        table(spark, "events", sf_dir)
        .filter(F.col("ts").isNotNull() & F.col("value").isNotNull())
        .select(
            "event_type",
            F.hour("ts").cast("double").alias("x"),
            F.col("value").alias("y"),
        )
    )
    q6 = lambda c: F.floor(c * 1e6 + 0.5) / 1e6  # noqa: E731
    pooled = ev.agg(q6(F.regr_slope("y", "x")).alias("s"))
    per_group = ev.groupBy("event_type").agg(
        F.regr_count("y", "x").cast("bigint").alias("n"),
        q6(F.regr_slope("y", "x")).alias("gs"),
    )
    return (
        per_group.crossJoin(F.broadcast(pooled))
        .select(
            "event_type",
            "n",
            F.col("gs").alias("group_slope"),
            F.col("s").alias("pooled_slope"),
            (
                (F.signum("gs") != F.signum("s"))
                & (F.col("gs") != 0)
                & (F.col("s") != 0)
            ).alias("reversed"),
        )
        .orderBy("event_type")
    )

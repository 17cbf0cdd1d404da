"""Round-5 statistical / analytical operators: Benford first-digit audit,
Pareto skyline, Markov transition matrix, Zipf rank-frequency fit, and a
deterministic Poisson bootstrap. All exact-integer or
exact-decimal-derived math; doubles only at the final derived-ratio edge,
rounded through the repo's portable grid.
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


# -- Benford first-digit audit ----------------------------------------------
# Fraud/quality screen on a money column: observed first-significant-digit
# shares vs Benford's log10(1 + 1/d) expectation. The digit comes from
# exact integer/string ops (no log10 on data, so no float-boundary risk);
# the oracle derives it arithmetically (pow/floor) instead of textually —
# independent derivations.
@register(
    "val_benford_digits",
    oracle="""
WITH digits AS (
  SELECT CAST(floor(o_totalprice / power(10, floor(log10(o_totalprice))))
              AS BIGINT) AS digit
  FROM orders WHERE o_totalprice >= 1
)
SELECT digit, count(*) AS n_orders,
       floor(count(*) * 1.0 / sum(count(*)) OVER () * 10000 + 0.5) / 10000
         AS obs_share,
       floor(log10(1.0 + 1.0 / digit) * 10000 + 0.5) / 10000
         AS benford_share
FROM digits
GROUP BY digit
ORDER BY digit
""",
)
def q_val_benford_digits(spark: SparkSession, sf_dir: str):
    o = (
        table(spark, "orders", sf_dir)
        .filter(F.col("o_totalprice") >= 1)
        .select(
            F.substring(
                F.floor("o_totalprice").cast("long").cast("string"), 1, 1
            )
            .cast("long")
            .alias("digit")
        )
    )
    counts = o.groupBy("digit").agg(F.count(F.lit(1)).alias("n_orders"))
    total = counts.agg(F.sum("n_orders").alias("total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "digit",
            "n_orders",
            portable_round(F.col("n_orders") * 1.0 / F.col("total"), 4).alias(
                "obs_share"
            ),
            portable_round(F.log10(1.0 + 1.0 / F.col("digit")), 4).alias(
                "benford_share"
            ),
        )
        .orderBy("digit")
    )


# -- Pareto skyline ----------------------------------------------------------
# Orders not dominated on (earlier-or-equal date, strictly higher price).
# Spark: collapse to per-date maxima FIRST (one hash aggregate), run the
# cumulative max over the date-level table (a window over #dates rows,
# never the fact — a global single-partition window over raw orders would
# be the classic scale-killer), then broadcast the date→threshold map
# back onto the fact scan. Oracle: the textbook NOT EXISTS anti-join —
# independent derivations.
@register(
    "rel_skyline_pareto",
    oracle="""
SELECT o.o_orderkey, o.o_orderdate::TIMESTAMP AS o_orderdate,
       floor(o.o_totalprice * 100 + 0.5) / 100 AS o_totalprice
FROM orders o
WHERE NOT EXISTS (
  SELECT 1 FROM orders o2
  WHERE o2.o_orderdate <= o.o_orderdate
    AND o2.o_totalprice > o.o_totalprice
)
ORDER BY o.o_orderdate, o.o_orderkey
""",
)
def q_rel_skyline_pareto(spark: SparkSession, sf_dir: str):
    o = table(spark, "orders", sf_dir).select(
        "o_orderkey", "o_orderdate", "o_totalprice"
    )
    per_date = o.groupBy("o_orderdate").agg(
        F.max("o_totalprice").alias("date_max")
    )
    w = (
        Window.orderBy("o_orderdate")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    thresholds = per_date.select(
        "o_orderdate", F.max("date_max").over(w).alias("cummax_price")
    )
    return (
        o.join(F.broadcast(thresholds), "o_orderdate")
        .filter(F.col("o_totalprice") >= F.col("cummax_price"))
        .select(
            "o_orderkey",
            "o_orderdate",
            portable_round(F.col("o_totalprice"), 2).alias("o_totalprice"),
        )
        .orderBy("o_orderdate", "o_orderkey")
    )


# -- Markov transition matrix ------------------------------------------------
# Per-user event-type bigram counts and conditional probabilities. Spark:
# lead() over the per-user total order (one shuffle on user_id); oracle:
# row_number + rn+1 self-join — independent derivations of the same
# transitions. Probabilities are exact-count ratios.
@register(
    "sess_markov_transitions",
    oracle=f"""
WITH seq AS (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM {EVENTS_SRC}
  WHERE ts IS NOT NULL AND user_id IS NOT NULL
),
pairs AS (
  SELECT a.event_type AS from_type, b.event_type AS to_type
  FROM seq a JOIN seq b ON b.user_id = a.user_id AND b.rn = a.rn + 1
)
SELECT from_type, to_type, count(*) AS n_transitions,
       floor(count(*) * 1.0
             / sum(count(*)) OVER (PARTITION BY from_type)
             * 10000 + 0.5) / 10000 AS p_transition
FROM pairs
GROUP BY 1, 2
ORDER BY 1, 2
""",
)
def q_sess_markov_transitions(spark: SparkSession, sf_dir: str):
    ev = (
        table(spark, "events", sf_dir)
        .filter(F.col("ts").isNotNull() & F.col("user_id").isNotNull())
        .select("user_id", "event_type", "ts", "event_id")
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.withColumn("to_type", F.lead("event_type").over(w))
        .filter(F.col("to_type").isNotNull())
        .select(F.col("event_type").alias("from_type"), "to_type")
    )
    counts = pairs.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n_transitions")
    )
    wrow = Window.partitionBy("from_type")
    return (
        counts.withColumn(
            "p_transition",
            portable_round(
                F.col("n_transitions") * 1.0 / F.sum("n_transitions").over(wrow),
                4,
            ),
        )
        .orderBy("from_type", "to_type")
    )


# -- Zipf rank-frequency fit -------------------------------------------------
# Corpus-level token frequencies: the log-log slope of frequency vs rank
# over the top 100 terms (Zipf exponent ~ -1 for natural text; a strong
# deviation flags synthetic/templated corpora — a standard LLM-corpus
# diagnostic). Spark: built-in regr_slope/regr_intercept aggregates;
# oracle: the closed-form least-squares from power sums — independent
# derivations over identical exact (rank, count) points.
@register(
    "text_zipf_slope",
    oracle=r"""
WITH tok AS (
  SELECT unnest(list_filter(regexp_split_to_array(trim(text), '\s+'),
                            x -> x != '')) AS token
  FROM documents
),
freq AS (
  SELECT token, count(*) AS n FROM tok GROUP BY token
),
ranked AS (
  SELECT ln(CAST(row_number() OVER (ORDER BY n DESC, token) AS DOUBLE)) AS x,
         ln(CAST(n AS DOUBLE)) AS y
  FROM freq
  QUALIFY row_number() OVER (ORDER BY n DESC, token) <= 100
),
sums AS (
  SELECT count(*) AS m, sum(x) AS sx, sum(y) AS sy,
         sum(x * x) AS sxx, sum(x * y) AS sxy
  FROM ranked
)
SELECT m AS n_terms,
       floor((m * sxy - sx * sy) / (m * sxx - sx * sx) * 10000 + 0.5) / 10000
         AS zipf_slope,
       floor((sy - (m * sxy - sx * sy) / (m * sxx - sx * sx) * sx) / m
             * 10000 + 0.5) / 10000 AS zipf_intercept
FROM sums
""",
)
def q_text_zipf_slope(spark: SparkSession, sf_dir: str):
    from electricity_forecast_pipeline_airflow_k8s_spark.operators import text as TX

    docs = table(spark, "documents", sf_dir)
    freq = (
        docs.select(F.explode(TX.tokens(F.col("text"))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    top = freq.orderBy(F.desc("n"), "token").limit(100)
    w = Window.orderBy(F.desc("n"), "token")
    pts = top.select(
        F.log(F.row_number().over(w).cast("double")).alias("x"),
        F.log(F.col("n").cast("double")).alias("y"),
    )
    return pts.agg(
        F.count(F.lit(1)).alias("n_terms"),
        portable_round(F.expr("regr_slope(y, x)"), 4).alias("zipf_slope"),
        portable_round(F.expr("regr_intercept(y, x)"), 4).alias(
            "zipf_intercept"
        ),
    )


# -- Deterministic Poisson bootstrap -----------------------------------------
# Poisson(1) bootstrap over the events value column: each (row, replicate)
# draws k ~ Poisson(1) via the inverse CDF applied to the row's md5-hash
# uniform — deterministic, partition-independent, engine-portable (the
# repo's hash-sampling primitive), so resamples are reproducible on any
# cluster and the oracle recomputes them bit-identically. Weighted sums
# use exact DECIMAL arithmetic (k is an integer, values have 2 decimals).
# This is how a 100 TB pipeline gets confidence intervals in ONE pass: no
# data duplication, R extra integer columns instead of R copies.
_BOOT_REPS = 5
# cumulative Poisson(1) CDF: P(X <= k) for k = 0..5 (exact double
# literals, identical text in both engines)
_POIS_CDF = (
    "0.36787944117144233",
    "0.7357588823428847",
    "0.9196986029286058",
    "0.9810118431238462",
    "0.9963401531726563",
    "0.9994058151824183",
)


def _pois_k_sql(u: str) -> str:
    cases = " ".join(
        f"WHEN {u} < {p} THEN {k}" for k, p in enumerate(_POIS_CDF)
    )
    return f"(CASE {cases} ELSE 6 END)"


def _boot_oracle() -> str:
    reps = ", ".join(str(r) for r in range(_BOOT_REPS))
    u = (
        "(CAST(CAST('0x' || substr(md5('boot' || CAST(rep AS VARCHAR) || chr(31)"
        " || CAST(event_id AS VARCHAR)), 1, 8) AS UBIGINT) AS DOUBLE)"
        " / 4294967296.0)"
    )
    return f"""
WITH drawn AS (
  SELECT rep, {_pois_k_sql(u)} AS k, value
  FROM {EVENTS_SRC}
  CROSS JOIN (SELECT unnest([{reps}]) AS rep)
  WHERE value IS NOT NULL
)
SELECT rep,
       CAST(sum(k) AS BIGINT) AS n_drawn,
       floor(CAST(sum(k * CAST(value AS DECIMAL(18,2))) AS DOUBLE)
             / sum(k) * 10000 + 0.5) / 10000 AS boot_mean
FROM drawn
GROUP BY rep
ORDER BY rep
"""


@register("sample_poisson_bootstrap", oracle=_boot_oracle())
def q_sample_poisson_bootstrap(spark: SparkSession, sf_dir: str):
    from electricity_forecast_pipeline_airflow_k8s_spark.operators.partitioning import (
        fanout,
    )

    # F1 fanout (guide §2.5, round-12): the single-row-group events scan
    # arrives as ONE partition, so the 5-replicate md5 draw -- the lane's
    # whole cost -- ran on one core; no-op at real scale
    ev = fanout(
        table(spark, "events", sf_dir)
        .filter(F.col("value").isNotNull())
        .select("event_id", "value")
    )
    reps = spark.range(_BOOT_REPS).select(F.col("id").cast("int").alias("rep"))
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("boot"),
                        F.col("rep").cast("string"),
                        F.lit("\x1f"),
                        F.col("event_id").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("double")
        / F.lit(4294967296.0)
    )
    k = F.lit(6)
    for kk in range(len(_POIS_CDF) - 1, -1, -1):
        k = F.when(u < float(_POIS_CDF[kk]), F.lit(kk)).otherwise(k)
    drawn = ev.crossJoin(F.broadcast(reps)).select(
        "rep", k.alias("k"), F.col("value").cast("decimal(18,2)").alias("v")
    )
    return (
        drawn.groupBy("rep")
        .agg(
            F.sum("k").cast("long").alias("n_drawn"),
            (
                F.floor(
                    F.sum(F.col("k") * F.col("v")).cast("double")
                    / F.sum("k")
                    * 10000
                    + 0.5
                )
                / 10000
            ).alias("boot_mean"),
        )
        .orderBy("rep")
    )


# -- top user paths (round 5) ------------------------------------------------
# The first five event types per user, joined into a path string; top 20
# paths by user count. Spark: rank-filter to the first 5 events (one
# window shuffle on user_id), sort_array over (rn, type) structs for a
# deterministic intra-user order, then a hash aggregate on the path and a
# distributed top-k cut. Oracle: string_agg with ORDER BY over the same
# rank filter — independent assembly of the same paths.
@register(
    "sess_path_topk",
    oracle=f"""
WITH seq AS (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM {EVENTS_SRC}
  WHERE ts IS NOT NULL AND user_id IS NOT NULL
),
paths AS (
  SELECT user_id,
         string_agg(event_type, '>' ORDER BY rn) AS path
  FROM seq WHERE rn <= 5
  GROUP BY user_id
)
SELECT path, count(*) AS n_users,
       CAST(row_number() OVER (ORDER BY count(*) DESC, path) AS BIGINT) AS rank
FROM paths
GROUP BY path
QUALIFY rank <= 20
ORDER BY rank
""",
)
def q_sess_path_topk(spark: SparkSession, sf_dir: str):
    ev = (
        table(spark, "events", sf_dir)
        .filter(F.col("ts").isNotNull() & F.col("user_id").isNotNull())
        .select("user_id", "event_type", "ts", "event_id")
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    firsts = ev.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 5)
    paths = firsts.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.sort_array(
                    F.collect_list(F.struct(F.col("rn"), F.col("event_type")))
                ),
                lambda s: s.getField("event_type"),
            ),
            ">",
        ).alias("path")
    )
    counts = paths.groupBy("path").agg(F.count(F.lit(1)).alias("n_users"))
    top = counts.orderBy(F.desc("n_users"), "path").limit(20)
    ww = Window.orderBy(F.desc("n_users"), "path")
    return top.withColumn("rank", F.row_number().over(ww).cast("long")).orderBy(
        "rank"
    )


# -- class-balanced downsample (round 5) ------------------------------------
# Balance the documents corpus across languages: every class is cut to
# the minority-class size, members chosen by deterministic md5-hash order
# (partition-independent, reproducible on any cluster — df.sample is
# neither). One window shuffle on lang for the rank, one scalar broadcast
# for the minority size; the id_checksum pins the EXACT surviving sample,
# not just its size. Oracle: the same hash order ranked by row_number.
@register(
    "sample_class_balance",
    oracle="""
WITH ranked AS (
  SELECT lang, doc_id,
         row_number() OVER (
           PARTITION BY lang
           ORDER BY substr(md5('bal' || chr(31) || CAST(doc_id AS VARCHAR)), 1, 8),
                    doc_id) AS rnk
  FROM documents
),
minsize AS (SELECT min(cnt) AS m FROM (SELECT count(*) AS cnt FROM documents GROUP BY lang))
SELECT lang, count(*) AS n_kept,
       CAST(sum(doc_id) AS BIGINT) AS id_checksum
FROM ranked, minsize
WHERE rnk <= minsize.m
GROUP BY lang
ORDER BY lang
""",
)
def q_sample_class_balance(spark: SparkSession, sf_dir: str):
    from electricity_forecast_pipeline_airflow_k8s_spark.functions.hashing import (
        stable_hash,
    )

    docs = table(spark, "documents", sf_dir).select("lang", "doc_id")
    key = F.substring(stable_hash(F.lit("bal"), F.col("doc_id")), 1, 8)
    w = Window.partitionBy("lang").orderBy(key.alias("k"), "doc_id")
    ranked = docs.withColumn("rnk", F.row_number().over(w))
    minsize = (
        docs.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .agg(F.min("cnt").alias("m"))
    )
    return (
        ranked.crossJoin(F.broadcast(minsize))
        .filter(F.col("rnk") <= F.col("m"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum("doc_id").cast("long").alias("id_checksum"),
        )
        .orderBy("lang")
    )


# -- salted skew JOIN proven value-identical (round 5) -----------------------
# The events->per-type-baseline join has a 5-value join key: the classic
# hot-key shape. The query runs it through the explicit salted-join
# mitigation (plans/skew.py::salted_join — small side replicated x8,
# fact salted per-row, join on (key, salt)) and the oracle computes the
# SAME result with a plain join: the mitigation is proven to change the
# execution layout, never the values (the same contract as
# rel_salted_skew_stats for aggregations).
@register(
    "rel_salted_skew_join",
    oracle=f"""
WITH dim AS (
  SELECT event_type,
         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(value)
           AS baseline
  FROM {EVENTS_SRC} GROUP BY event_type
)
SELECT e.event_type, count(*) AS n_rows,
       CAST(sum(CASE WHEN e.value > d.baseline THEN 1 ELSE 0 END) AS BIGINT)
         AS n_above
FROM {EVENTS_SRC} e JOIN dim d ON d.event_type = e.event_type
WHERE e.value IS NOT NULL
GROUP BY 1 ORDER BY 1
""",
)
def q_rel_salted_skew_join(spark: SparkSession, sf_dir: str):
    from electricity_forecast_pipeline_airflow_k8s_spark.functions.stats import (
        exact_mean,
    )
    from electricity_forecast_pipeline_airflow_k8s_spark.plans.skew import salted_join

    ev = (
        table(spark, "events", sf_dir)
        .filter(F.col("value").isNotNull())
        .select("event_type", "event_id", "value")
    )
    dim = ev.groupBy("event_type").agg(exact_mean("value").alias("baseline"))
    joined = salted_join(ev, dim, ["event_type"], n_salts=8)
    return (
        joined.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(
                (F.col("value") > F.col("baseline")).cast("long")
            ).alias("n_above"),
        )
        .orderBy("event_type")
    )


# -- nearest-neighbor as-of join (round 5) -----------------------------------
# Bidirectional as-of: each purchase matches its CLOSEST click by the
# same user (before or after), ties to the earlier one. Spark: one
# window pass computes both the backward max and forward min click time,
# then picks the smaller absolute gap — no join at all; oracle: the
# same via min_by over an inequality self-join (brute force,
# oracle-scale only). The backward-only form is rel_asof_click_before_
# purchase; this adds the nearest-direction semantics a sensor-fusion
# pipeline needs.
@register(
    "rel_asof_nearest",
    oracle=f"""
WITH ev AS (SELECT event_id, ts::TIMESTAMP AS ts, user_id, event_type
            FROM events WHERE ts IS NOT NULL),
purchases AS (SELECT event_id, user_id, ts FROM ev WHERE event_type = 'purchase'),
clicks AS (SELECT user_id, ts FROM ev WHERE event_type = 'click')
SELECT event_id, user_id, ts, c_ts AS nearest_click_ts FROM (
  SELECT p.event_id, p.user_id, p.ts, c.ts AS c_ts,
         row_number() OVER (
           PARTITION BY p.event_id
           ORDER BY abs(date_diff('microsecond', c.ts, p.ts)), c.ts) AS rn
  FROM purchases p LEFT JOIN clicks c ON c.user_id = p.user_id
) WHERE rn = 1
ORDER BY event_id
""",
)
def q_rel_asof_nearest(spark: SparkSession, sf_dir: str):
    ev = table(spark, "events", sf_dir).filter(F.col("ts").isNotNull())
    click_ts = F.when(F.col("event_type") == "click", F.col("ts"))
    wb = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wf = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    # same-timestamp clicks (gap 0) belong in the backward candidate: the
    # frames above exclude the current row only, and a click row never IS
    # a purchase row, so include same-ts clicks backward via <= ordering
    wb_incl = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    flagged = ev.select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        F.max(click_ts).over(wb_incl).alias("back_ts"),
        F.min(click_ts).over(wf).alias("fwd_ts"),
    ).filter(F.col("event_type") == "purchase")
    # microsecond gaps (cast-to-long on timestamps is SECONDS in Spark --
    # sub-second ties would then resolve differently than the oracle's
    # microsecond argmin)
    back_gap = F.unix_micros("ts") - F.unix_micros("back_ts")
    fwd_gap = F.unix_micros("fwd_ts") - F.unix_micros("ts")
    nearest = (
        F.when(F.col("back_ts").isNull(), F.col("fwd_ts"))
        .when(F.col("fwd_ts").isNull(), F.col("back_ts"))
        # ties go to the EARLIER (backward) click
        .when(back_gap <= fwd_gap, F.col("back_ts"))
        .otherwise(F.col("fwd_ts"))
    )
    return flagged.select(
        "event_id", "user_id", "ts", nearest.alias("nearest_click_ts")
    ).orderBy("event_id")


# -- conversion latency percentiles (round 5) --------------------------------
# Funnel latency: per user, first click -> first subsequent purchase;
# latency distribution summarized with exact percentiles over integer
# microsecond gaps (bit-identical in both engines). Spark: two tiny
# per-user aggregates joined; oracle: the same via FILTER-min aggregates
# — the conditional-aggregate formulation.
@register(
    "sess_conversion_latency",
    oracle=f"""
WITH firsts AS (
  SELECT user_id,
         min(ts) FILTER (WHERE event_type = 'click') AS first_click,
         min(ts) FILTER (WHERE event_type = 'purchase') AS first_purchase
  FROM {EVENTS_SRC}
  WHERE ts IS NOT NULL AND user_id IS NOT NULL
  GROUP BY user_id
),
lat AS (
  SELECT date_diff('microsecond', first_click, first_purchase) AS gap_us
  FROM firsts
  WHERE first_click IS NOT NULL AND first_purchase IS NOT NULL
    AND first_purchase > first_click
)
SELECT count(*) AS n_converted,
       floor(quantile_cont(gap_us, 0.5) / 1000000 * 10000 + 0.5) / 10000
         AS p50_sec,
       floor(quantile_cont(gap_us, 0.9) / 1000000 * 10000 + 0.5) / 10000
         AS p90_sec,
       floor(max(gap_us) / 1000000 * 10000 + 0.5) / 10000 AS max_sec
FROM lat
""",
)
def q_sess_conversion_latency(spark: SparkSession, sf_dir: str):
    ev = (
        table(spark, "events", sf_dir)
        .filter(F.col("ts").isNotNull() & F.col("user_id").isNotNull())
        .select("user_id", "event_type", "ts")
    )
    firsts = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias(
            "first_click"
        ),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "first_purchase"
        ),
    )
    lat = firsts.filter(
        F.col("first_click").isNotNull()
        & F.col("first_purchase").isNotNull()
        & (F.col("first_purchase") > F.col("first_click"))
    ).select(
        (
            F.unix_micros("first_purchase") - F.unix_micros("first_click")
        ).alias("gap_us")
    )
    return lat.agg(
        F.count(F.lit(1)).alias("n_converted"),
        portable_round(F.expr("percentile(gap_us, 0.5)") / 1000000, 4).alias(
            "p50_sec"
        ),
        portable_round(F.expr("percentile(gap_us, 0.9)") / 1000000, 4).alias(
            "p90_sec"
        ),
        portable_round(F.max("gap_us") / 1000000, 4).alias("max_sec"),
    )


# -- Gini coefficient of order values (round 5) ------------------------------
# Revenue-concentration per order status via the rank formulation
# G = (2 * sum(i * x_i)) / (n * sum(x)) - (n + 1) / n over values sorted
# ascending (ties broken by key, so ranks are identical cross-engine).
# sum(i * x_i) is DECIMAL x integer — exact; the final expression is one
# deterministic double op chain. Spark: row_number window per status +
# one agg; oracle: the same formulation in SQL (rank assembly differs:
# window in a CTE vs inline QUALIFY-free subquery).
@register(
    "rel_order_value_gini",
    oracle="""
WITH ranked AS (
  SELECT o_orderstatus,
         CAST(o_totalprice AS DECIMAL(18,2)) AS x,
         row_number() OVER (PARTITION BY o_orderstatus
                            ORDER BY o_totalprice, o_orderkey) AS i
  FROM orders
)
SELECT o_orderstatus, count(*) AS n_orders,
       floor((2.0 * CAST(sum(i * x) AS DOUBLE)
              / (count(*) * CAST(sum(x) AS DOUBLE))
              - (count(*) + 1.0) / count(*)) * 10000 + 0.5) / 10000 AS gini
FROM ranked
GROUP BY 1 ORDER BY 1
""",
)
def q_rel_order_value_gini(spark: SparkSession, sf_dir: str):
    o = table(spark, "orders", sf_dir).select(
        "o_orderstatus", "o_orderkey", "o_totalprice"
    )
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    ranked = o.select(
        "o_orderstatus",
        F.col("o_totalprice").cast("decimal(18,2)").alias("x"),
        F.row_number().over(w).alias("i"),
    )
    n = F.count(F.lit(1))
    return (
        ranked.groupBy("o_orderstatus")
        .agg(
            n.alias("n_orders"),
            portable_round(
                2.0
                * F.sum(F.col("i") * F.col("x")).cast("double")
                / (n * F.sum("x").cast("double"))
                - (n + 1.0) / n,
                4,
            ).alias("gini"),
        )
        .orderBy("o_orderstatus")
    )


# -- exact Shapley-value channel attribution ---------------------------------
# Marketing attribution done properly: each converting user's touched
# channel set (the 4 non-purchase event types, bit-masked) defines a
# 16-subset coalition table; v(S) = converters whose touches fit inside
# S, and each channel's Shapley value is the factorial-weighted sum of
# its marginal contributions. With n=4 everything is EXACT: subset
# counts are integers, weights k!(3-k)! stay integral, and the single
# /24 division is a mirrored double edge. Scale: one events pass to a
# 16-row mask table; the subset-sum and Shapley joins are 16x16 —
# constant work after the first agg, no matter the corpus size.
# Efficiency property (sum of values = v(N) - v(empty)) is pinned in
# tests/test_graph.py-style invariants.
@register(
    "sess_shapley_attribution",
    oracle=f"""
WITH convs AS (
  SELECT user_id FROM {EVENTS_SRC}
  WHERE event_type = 'purchase' AND user_id IS NOT NULL GROUP BY 1
),
touches AS (
  SELECT e.user_id,
         sum(DISTINCT CASE e.event_type
               WHEN 'click' THEN 1 WHEN 'error' THEN 2
               WHEN 'signup' THEN 4 WHEN 'view' THEN 8 ELSE 0 END) AS mask
  FROM {EVENTS_SRC} e JOIN convs c ON c.user_id = e.user_id
  GROUP BY 1
),
cnt AS (SELECT mask, count(*) AS n FROM touches GROUP BY 1),
masks AS (SELECT i AS s FROM unnest(range(0, 16)) AS t(i)),
v AS (
  SELECT m.s, coalesce(sum(c.n), 0) AS v
  FROM masks m LEFT JOIN cnt c ON (c.mask & m.s) = c.mask
  GROUP BY 1
),
chans AS (
  SELECT * FROM (VALUES ('click', 1), ('error', 2), ('signup', 4),
                        ('view', 8)) AS t(channel, bit)
),
marginals AS (
  SELECT ch.channel,
         sum((vwith.v - vwo.v)
             * CASE bit_count(CAST(m.s AS BIGINT))
                 WHEN 0 THEN 6 WHEN 1 THEN 2 WHEN 2 THEN 2 ELSE 6 END)
           AS num
  FROM chans ch
  JOIN masks m ON (m.s & ch.bit) = 0
  JOIN v vwo ON vwo.s = m.s
  JOIN v vwith ON vwith.s = (m.s | ch.bit)
  GROUP BY 1
)
SELECT channel,
       floor(num / 24.0 * 10000 + 0.5) / 10000 AS shapley_conversions
FROM marginals
ORDER BY channel
""",
)
def q_sess_shapley_attribution(spark: SparkSession, sf_dir: str):
    ev = table(spark, "events", sf_dir).filter(F.col("user_id").isNotNull())
    convs = (
        ev.filter(F.col("event_type") == "purchase").select("user_id").distinct()
    )
    bit = (
        F.when(F.col("event_type") == "click", 1)
        .when(F.col("event_type") == "error", 2)
        .when(F.col("event_type") == "signup", 4)
        .when(F.col("event_type") == "view", 8)
        .otherwise(0)
    )
    touches = (
        ev.join(convs, "user_id", "left_semi")
        .select("user_id", bit.alias("b"))
        .distinct()
        .groupBy("user_id")
        .agg(F.sum("b").alias("mask"))
    )
    cnt = touches.groupBy("mask").agg(F.count(F.lit(1)).alias("n"))
    masks = spark.range(0, 16).select(F.col("id").cast("int").alias("s"))
    v = (
        masks.join(
            cnt, (cnt.mask.bitwiseAND(masks.s)) == cnt.mask, "left"
        )
        .groupBy("s")
        .agg(F.coalesce(F.sum("n"), F.lit(0)).alias("v"))
    )
    chans = spark.createDataFrame(
        [("click", 1), ("error", 2), ("signup", 4), ("view", 8)],
        "channel string, bit int",
    )
    weight = (
        F.when(F.bit_count(F.col("s").cast("long")) == 0, 6)
        .when(F.bit_count(F.col("s").cast("long")) == 1, 2)
        .when(F.bit_count(F.col("s").cast("long")) == 2, 2)
        .otherwise(6)
    )
    vwo = v.withColumnsRenamed({"s": "s_wo", "v": "v_wo"})
    vwith = v.withColumnsRenamed({"s": "s_with", "v": "v_with"})
    marg = (
        chans.join(masks, masks.s.bitwiseAND(chans.bit) == 0)
        .join(vwo, F.col("s") == F.col("s_wo"))
        .join(vwith, F.col("s_with") == F.col("s").bitwiseOR(F.col("bit")))
        .groupBy("channel")
        .agg(F.sum((F.col("v_with") - F.col("v_wo")) * weight).alias("num"))
    )
    return marg.select(
        "channel",
        (F.floor(F.col("num") / 24.0 * 10000 + 0.5) / 10000).alias(
            "shapley_conversions"
        ),
    ).orderBy("channel")

"""Round-5 relational breadth: cumulative count-distinct over time,
bivariate statistics (corr / covariance / regression slope), and
MERGE-style batch upsert semantics expressed as a full outer join.

Reference parity: the reference's relational surface is SQL-over-frames
(core/data_validation.py aggregates, core/feature_engineering.py joins);
these add the remaining analytic-SQL shapes a warehouse user expects —
distinct-over-window (which neither Spark nor DuckDB supports natively in
a window, so both sides derive it differently), the REGR_*/covar family,
and the upsert merge every incremental pipeline needs.
"""

from __future__ import annotations

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from electricity_forecast_pipeline_airflow_k8s_spark.functions.stats import (
    portable_round,
)
from electricity_forecast_pipeline_airflow_k8s_spark.queries import register, table


# -- cumulative distinct users per (event_type, day) ------------------------
# COUNT(DISTINCT) OVER a running window is unsupported in both engines, so
# each side derives it independently: Spark reduces each user to their
# FIRST day per type (one shuffle on (type, user), then a tiny cumulative
# window over (type, day) partials — the layout that scales: the window
# runs over ~days rows, never over raw events); the oracle brute-forces an
# inequality self-join + count(distinct) per day (O(days x events),
# oracle-scale only).
@register(
    "rel_window_count_distinct",
    oracle="""
WITH ev AS (
  SELECT event_type, CAST(date_trunc('day', ts::TIMESTAMP) AS TIMESTAMP) AS d, user_id
  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
),
days AS (SELECT DISTINCT event_type, d FROM ev)
SELECT days.event_type, days.d AS day,
       count(DISTINCT e.user_id) AS cum_distinct_users
FROM days JOIN ev e
  ON e.event_type = days.event_type AND e.d <= days.d
GROUP BY 1, 2
ORDER BY 1, 2
""",
)
def q_rel_window_count_distinct(spark: SparkSession, sf_dir: str):
    ev = (
        table(spark, "events", sf_dir)
        .filter(F.col("ts").isNotNull() & F.col("user_id").isNotNull())
        .select("event_type", F.date_trunc("day", "ts").alias("d"), "user_id")
    )
    days = ev.select("event_type", "d").distinct()
    new_users = (
        ev.groupBy("event_type", "user_id")
        .agg(F.min("d").alias("first_day"))
        .groupBy("event_type", F.col("first_day").alias("d"))
        .agg(F.count(F.lit(1)).alias("n_new"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        days.join(new_users, ["event_type", "d"], "left")
        .select(
            "event_type",
            "d",
            F.coalesce(F.col("n_new"), F.lit(0)).alias("n_new"),
        )
        .select(
            "event_type",
            F.col("d").alias("day"),
            F.sum("n_new").over(w).alias("cum_distinct_users"),
        )
        .orderBy("event_type", "day")
    )


# -- bivariate statistics per group -----------------------------------------
# Spark: the built-in corr/covar_samp/covar_pop/regr_slope aggregates
# (each engine's own streaming co-moment accumulation); oracle: the same
# statistics re-derived from exact DECIMAL power sums (prices have 2
# decimals, quantities are integral, so sum-xy/sum-x2 are order-free
# exact). Agreement through the 1e-4 grid is a genuine cross-check of
# Spark's co-moment path against exact arithmetic.
@register(
    "rel_corr_covar",
    oracle="""
WITH sums AS (
  SELECT l_returnflag,
         count(*) AS n,
         CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
         CAST(sum(CAST(l_quantity AS DECIMAL(18,2))
                  * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                  * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS syy,
         CAST(sum(CAST(l_quantity AS DECIMAL(18,2))
                  * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxy
  FROM lineitem
  GROUP BY 1
)
SELECT l_returnflag, n,
       floor((sxy - sx * sy / n) / (n - 1) * 10000 + 0.5) / 10000
         AS covar_samp,
       floor((sxy - sx * sy / n) / n * 10000 + 0.5) / 10000 AS covar_pop,
       floor((sxy - sx * sy / n)
             / sqrt((sxx - sx * sx / n) * (syy - sy * sy / n))
             * 10000 + 0.5) / 10000 AS corr_qty_price,
       floor((sxy - sx * sy / n) / (sxx - sx * sx / n) * 10000 + 0.5) / 10000
         AS slope_price_per_qty
FROM sums
ORDER BY l_returnflag
""",
)
def q_rel_corr_covar(spark: SparkSession, sf_dir: str):
    li = table(spark, "lineitem", sf_dir).select(
        "l_returnflag", "l_quantity", "l_extendedprice"
    )
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            portable_round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias(
                "covar_samp"
            ),
            portable_round(F.covar_pop("l_quantity", "l_extendedprice"), 4).alias(
                "covar_pop"
            ),
            portable_round(F.corr("l_quantity", "l_extendedprice"), 4).alias(
                "corr_qty_price"
            ),
            portable_round(
                F.expr("regr_slope(l_extendedprice, l_quantity)"), 4
            ).alias("slope_price_per_qty"),
        )
        .orderBy("l_returnflag")
    )


# -- MERGE-style batch upsert -----------------------------------------------
# A deterministic changeset derived from the orders table itself:
# urgent orders get a corrected price (matched -> UPDATE), high-priority
# orders re-arrive under a shifted key (not matched -> INSERT). Spark
# applies the merge as ONE full outer join + coalesce (the scalable
# shuffle-once layout Delta/Iceberg MERGE compiles to); the oracle
# derives the same post-merge table as anti-join UNION ALL branches —
# independent derivations of MERGE semantics.
@register(
    "rel_merge_upsert",
    oracle="""
WITH changes AS (
  SELECT o_orderkey, o_custkey,
         CAST('U' AS VARCHAR) AS o_orderstatus,
         floor(o_totalprice * 1.05 * 100 + 0.5) / 100 AS o_totalprice
  FROM orders WHERE o_orderpriority = '1-URGENT'
  UNION ALL
  SELECT o_orderkey + 100000000, o_custkey,
         CAST('N' AS VARCHAR) AS o_orderstatus,
         o_totalprice
  FROM orders WHERE o_orderpriority = '2-HIGH'
),
merged AS (
  SELECT b.o_orderstatus, b.o_totalprice
  FROM orders b
  WHERE NOT EXISTS (SELECT 1 FROM changes c WHERE c.o_orderkey = b.o_orderkey)
  UNION ALL
  SELECT c.o_orderstatus, c.o_totalprice FROM changes c
)
SELECT o_orderstatus, count(*) AS n_orders,
       floor(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             * 100 + 0.5) / 100 AS total_price
FROM merged
GROUP BY 1
ORDER BY 1
""",
)
def q_rel_merge_upsert(spark: SparkSession, sf_dir: str):
    base = table(spark, "orders", sf_dir).select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    updates = (
        table(spark, "orders", sf_dir)
        .filter(F.col("o_orderpriority") == "1-URGENT")
    ).select(
        "o_orderkey",
        "o_custkey",
        F.lit("U").alias("o_orderstatus"),
        (F.floor(F.col("o_totalprice") * 1.05 * 100 + 0.5) / 100).alias(
            "o_totalprice"
        ),
    )
    inserts = (
        table(spark, "orders", sf_dir)
        .filter(F.col("o_orderpriority") == "2-HIGH")
        .select(
            (F.col("o_orderkey") + 100000000).alias("o_orderkey"),
            "o_custkey",
            F.lit("N").alias("o_orderstatus"),
            "o_totalprice",
        )
    )
    changes = updates.unionByName(inserts)
    # one shuffle on the merge key: full outer join, change side wins
    merged = base.alias("b").join(
        changes.alias("c"), on="o_orderkey", how="full_outer"
    ).select(
        F.coalesce(F.col("c.o_orderstatus"), F.col("b.o_orderstatus")).alias(
            "o_orderstatus"
        ),
        F.coalesce(F.col("c.o_totalprice"), F.col("b.o_totalprice")).alias(
            "o_totalprice"
        ),
    )
    return (
        merged.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            (
                F.floor(
                    F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast(
                        "double"
                    )
                    * 100
                    + 0.5
                )
                / 100
            ).alias("total_price"),
        )
        .orderBy("o_orderstatus")
    )


# -- mergeable HLL distinct-count rollup (round 5) ---------------------------
# The 100 TB rollup pattern: per-source HLL sketches built in one pass,
# then MERGED (hll_union_agg) for the global figure — distinct counts
# compose across partitions/sources without rescanning, which exact
# count(DISTINCT) cannot do. Error-envelope contract like
# approx_distinct_and_quantiles: the output carries exact counts plus a
# boolean asserting every HLL estimate lands within +/-5% of exact; the
# oracle recomputes the exact counts and expects the booleans true, so a
# sketch drifting out of tolerance fails the hash match.
@register(
    "rel_hll_mergeable",
    oracle="""
WITH per_source AS (
  SELECT source, count(DISTINCT n_chars) AS exact_distinct
  FROM documents GROUP BY source
),
global_d AS (SELECT count(DISTINCT n_chars) AS g FROM documents)
SELECT source, exact_distinct,
       true AS hll_within_5pct,
       (SELECT g FROM global_d) AS global_exact,
       true AS global_hll_within_5pct
FROM per_source
ORDER BY source
""",
)
def q_rel_hll_mergeable(spark: SparkSession, sf_dir: str):
    docs = table(spark, "documents", sf_dir).select("source", "n_chars")
    sketches = docs.groupBy("source").agg(
        F.expr("hll_sketch_agg(n_chars, 12)").alias("sk"),
        F.count_distinct("n_chars").alias("exact_distinct"),
    )
    merged = sketches.agg(
        F.expr("hll_sketch_estimate(hll_union_agg(sk))").alias("global_est")
    )
    globals_exact = docs.agg(
        F.count_distinct("n_chars").alias("global_exact")
    )
    est = F.expr("hll_sketch_estimate(sk)")
    return (
        sketches.crossJoin(F.broadcast(merged))
        .crossJoin(F.broadcast(globals_exact))
        .select(
            "source",
            "exact_distinct",
            (
                F.abs(est - F.col("exact_distinct"))
                <= 0.05 * F.col("exact_distinct")
            ).alias("hll_within_5pct"),
            "global_exact",
            (
                F.abs(F.col("global_est") - F.col("global_exact"))
                <= 0.05 * F.col("global_exact")
            ).alias("global_hll_within_5pct"),
        )
        .orderBy("source")
    )


# -- tombstone (soft-delete) read (round 5) ----------------------------------
# The deletion-vector pattern every GDPR-capable lake needs: the base
# table is immutable, deletes land as a small tombstone key set, reads
# anti-join the tombstones. Deterministic tombstone set derived from the
# data (urgent 'F' orders). Spark: LEFT ANTI join (broadcast — the
# tombstone side is deletes-sized, never fact-sized); oracle: NOT IN with
# null-safe guard — independent derivations of read-after-delete.
@register(
    "rel_tombstone_read",
    oracle="""
WITH tombstones AS (
  SELECT o_orderkey FROM orders
  WHERE o_orderstatus = 'F' AND o_orderpriority = '1-URGENT'
)
SELECT o_orderstatus, count(*) AS n_visible,
       floor(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             * 100 + 0.5) / 100 AS visible_total
FROM orders
WHERE o_orderkey NOT IN (SELECT o_orderkey FROM tombstones)
GROUP BY 1
ORDER BY 1
""",
)
def q_rel_tombstone_read(spark: SparkSession, sf_dir: str):
    base = table(spark, "orders", sf_dir)
    tombstones = base.filter(
        (F.col("o_orderstatus") == "F")
        & (F.col("o_orderpriority") == "1-URGENT")
    ).select("o_orderkey")
    visible = base.join(F.broadcast(tombstones), "o_orderkey", "left_anti")
    return (
        visible.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_visible"),
            (
                F.floor(
                    F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast(
                        "double"
                    )
                    * 100
                    + 0.5
                )
                / 100
            ).alias("visible_total"),
        )
        .orderBy("o_orderstatus")
    )


# -- customer cohort LTV curves ----------------------------------------------
# The revenue companion to sess_retention_cohorts: customers cohorted by
# first-order YEAR, revenue accumulated by years-since-first-order. The
# cumulative sum runs over exact DECIMAL partials (cohorts x ages rows,
# never the fact table), so the LTV curve is order-independent; doubles
# only at the output edge. Two shuffles: first-order per customer, then
# (cohort, age) rollup.
@register(
    "rel_cohort_ltv",
    oracle="""
WITH firsts AS (
  SELECT o_custkey, min(date_part('year', o_orderdate::TIMESTAMP)) AS cohort
  FROM orders GROUP BY 1
),
facts AS (
  SELECT f.cohort,
         date_part('year', o.o_orderdate::TIMESTAMP) - f.cohort AS age,
         CAST(o.o_totalprice AS DECIMAL(18,2)) AS rev,
         o.o_custkey
  FROM orders o JOIN firsts f ON f.o_custkey = o.o_custkey
),
cells AS (
  SELECT cohort, age,
         count(DISTINCT o_custkey) AS n_active,
         sum(rev) AS rev_dec
  FROM facts GROUP BY 1, 2
)
SELECT CAST(cohort AS INT) AS cohort_year,
       CAST(age AS INT) AS age_years,
       CAST(n_active AS BIGINT) AS n_active,
       CAST(rev_dec AS DOUBLE) AS revenue,
       CAST(sum(rev_dec) OVER (PARTITION BY cohort ORDER BY age) AS DOUBLE)
         AS cum_revenue
FROM cells
ORDER BY cohort_year, age_years
""",
)
def q_rel_cohort_ltv(spark: SparkSession, sf_dir: str):
    o = table(spark, "orders", sf_dir).select(
        "o_custkey",
        F.year("o_orderdate").alias("yr"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("rev"),
    )
    firsts = o.groupBy("o_custkey").agg(F.min("yr").alias("cohort"))
    facts = o.join(firsts, "o_custkey").select(
        "cohort", (F.col("yr") - F.col("cohort")).alias("age"), "rev", "o_custkey"
    )
    cells = facts.groupBy("cohort", "age").agg(
        F.count_distinct("o_custkey").alias("n_active"),
        F.sum("rev").alias("rev_dec"),
    )
    w = Window.partitionBy("cohort").orderBy("age")
    return cells.select(
        F.col("cohort").cast("int").alias("cohort_year"),
        F.col("age").cast("int").alias("age_years"),
        F.col("n_active").cast("long").alias("n_active"),
        F.col("rev_dec").cast("double").alias("revenue"),
        F.sum("rev_dec").over(w).cast("double").alias("cum_revenue"),
    ).orderBy("cohort_year", "age_years")


# -- market-basket association rules -----------------------------------------
# Support / confidence / lift for part types co-purchased in the same
# order — the association-mining primitive (Apriori's scoring step) on
# the star schema. Baskets deduplicate to (order, type) first, so the
# pair self-join is bounded by types-per-order (~3 here), never line
# items squared; all metrics are mirrored double ratios of exact
# integer counts. At 100 TB the same layout holds: the pair space is
# (types-per-order choose 2) per order, and the rollup is
# type-pair-sized.
@register(
    "rel_basket_lift",
    oracle="""
WITH basket AS (
  SELECT DISTINCT l.l_orderkey, p.p_type
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
),
n_ord AS (SELECT count(DISTINCT l_orderkey) AS n FROM basket),
item AS (SELECT p_type, count(*) AS n_t FROM basket GROUP BY 1),
pairs AS (
  SELECT a.p_type AS type_a, b.p_type AS type_b, count(*) AS n_ab
  FROM basket a JOIN basket b
    ON b.l_orderkey = a.l_orderkey AND a.p_type < b.p_type
  GROUP BY 1, 2
)
SELECT p.type_a, p.type_b, CAST(p.n_ab AS BIGINT) AS n_both,
       floor(p.n_ab * 1.0 / t.n * 10000 + 0.5) / 10000 AS support,
       floor(p.n_ab * 1.0 / ia.n_t * 10000 + 0.5) / 10000 AS confidence_a_b,
       floor((p.n_ab * 1.0 * t.n) / (ia.n_t * 1.0 * ib.n_t) * 10000 + 0.5)
         / 10000 AS lift
FROM pairs p
JOIN item ia ON ia.p_type = p.type_a
JOIN item ib ON ib.p_type = p.type_b
CROSS JOIN n_ord t
ORDER BY lift DESC, p.type_a, p.type_b
""",
)
def q_rel_basket_lift(spark: SparkSession, sf_dir: str):
    li = table(spark, "lineitem", sf_dir).select("l_orderkey", "l_partkey")
    part = table(spark, "part", sf_dir).select("p_partkey", "p_type")
    from electricity_forecast_pipeline_airflow_k8s_spark.operators.partitioning import (
        reuse,
    )

    # round-11 F4: basket feeds the order count, the per-type counts and
    # BOTH sides of the pair self-join (4 references)
    basket = reuse(
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .select("l_orderkey", "p_type")
        .distinct()
    )
    n_ord = basket.select("l_orderkey").distinct().agg(
        F.count(F.lit(1)).alias("n")
    )
    item = basket.groupBy("p_type").agg(F.count(F.lit(1)).alias("n_t"))
    a, b = basket.alias("a"), basket.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("b.l_orderkey") == F.col("a.l_orderkey"))
            & (F.col("a.p_type") < F.col("b.p_type")),
        )
        .groupBy(F.col("a.p_type").alias("type_a"), F.col("b.p_type").alias("type_b"))
        .agg(F.count(F.lit(1)).alias("n_ab"))
    )
    ia = item.withColumnsRenamed({"p_type": "type_a", "n_t": "na"})
    ib = item.withColumnsRenamed({"p_type": "type_b", "n_t": "nb"})
    return (
        pairs.join(F.broadcast(ia), "type_a")
        .join(F.broadcast(ib), "type_b")
        .crossJoin(n_ord)
        .select(
            "type_a",
            "type_b",
            F.col("n_ab").cast("long").alias("n_both"),
            (F.floor(F.col("n_ab") * 1.0 / F.col("n") * 10000 + 0.5) / 10000).alias(
                "support"
            ),
            (
                F.floor(F.col("n_ab") * 1.0 / F.col("na") * 10000 + 0.5) / 10000
            ).alias("confidence_a_b"),
            (
                F.floor(
                    (F.col("n_ab") * 1.0 * F.col("n"))
                    / (F.col("na") * 1.0 * F.col("nb"))
                    * 10000
                    + 0.5
                )
                / 10000
            ).alias("lift"),
        )
        .orderBy(F.col("lift").desc(), "type_a", "type_b")
    )


# -- RFM customer segmentation -----------------------------------------------
# The classic marketing segmentation: per customer, Recency (days since
# last order), Frequency (order count), Monetary (exact DECIMAL spend),
# each scored into quintiles by ntile over a total tie-broken order, and
# rolled up per R-F-M segment. The ntile ranking is the per-customer
# table (not the fact table) — the same global-sort concession as the
# other equi-depth queries, swapped for sampled range boundaries at
# production scale.
@register(
    "rel_rfm_segments",
    oracle="""
WITH cust AS (
  SELECT o_custkey,
         datediff('day', max(o_orderdate::TIMESTAMP),
                  TIMESTAMP '2001-09-01') AS recency_days,
         count(*) AS frequency,
         sum(CAST(o_totalprice AS DECIMAL(18,2))) AS monetary
  FROM orders GROUP BY 1
),
scored AS (
  SELECT *,
         ntile(5) OVER (ORDER BY recency_days, o_custkey) AS r_score,
         ntile(5) OVER (ORDER BY frequency DESC, o_custkey) AS f_score,
         ntile(5) OVER (ORDER BY monetary DESC, o_custkey) AS m_score
  FROM cust
)
SELECT r_score, f_score, m_score,
       count(*) AS n_customers,
       CAST(sum(monetary) AS DOUBLE) AS segment_revenue
FROM scored
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3
""",
)
def q_rel_rfm_segments(spark: SparkSession, sf_dir: str):
    o = table(spark, "orders", sf_dir)
    cust = o.groupBy("o_custkey").agg(
        F.datediff(
            F.lit("2001-09-01").cast("timestamp"), F.max("o_orderdate")
        ).alias("recency_days"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("monetary"),
    )
    wr = Window.orderBy("recency_days", "o_custkey")
    wf = Window.orderBy(F.col("frequency").desc(), "o_custkey")
    wm = Window.orderBy(F.col("monetary").desc(), "o_custkey")
    scored = (
        cust.withColumn("r_score", F.ntile(5).over(wr))
        .withColumn("f_score", F.ntile(5).over(wf))
        .withColumn("m_score", F.ntile(5).over(wm))
    )
    return (
        scored.groupBy("r_score", "f_score", "m_score")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("monetary").cast("double").alias("segment_revenue"),
        )
        .orderBy("r_score", "f_score", "m_score")
    )


# -- RFM segmentation, scale path -------------------------------------------
# Same semantics and the SAME oracle as rel_rfm_segments, but the three
# global NTILE(5) rankings run through operators/ranking.py's distributed
# global rank (range repartition + per-partition offsets) instead of a
# single-partition window: parallelism stays at shuffle-partition count
# for every pass, so the plan survives customer cardinalities where the
# exact-window form would funnel the whole dimension through one task.
# The driver proving both queries green against one oracle IS the
# value-identity pin for the scale path.
@register(
    "rel_rfm_segments_scale",
    oracle="""
WITH cust AS (
  SELECT o_custkey,
         datediff('day', max(o_orderdate::TIMESTAMP),
                  TIMESTAMP '2001-09-01') AS recency_days,
         count(*) AS frequency,
         sum(CAST(o_totalprice AS DECIMAL(18,2))) AS monetary
  FROM orders GROUP BY 1
),
scored AS (
  SELECT *,
         ntile(5) OVER (ORDER BY recency_days, o_custkey) AS r_score,
         ntile(5) OVER (ORDER BY frequency DESC, o_custkey) AS f_score,
         ntile(5) OVER (ORDER BY monetary DESC, o_custkey) AS m_score
  FROM cust
)
SELECT r_score, f_score, m_score,
       count(*) AS n_customers,
       CAST(sum(monetary) AS DOUBLE) AS segment_revenue
FROM scored
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3
""",
)
def q_rel_rfm_segments_scale(spark: SparkSession, sf_dir: str):
    from electricity_forecast_pipeline_airflow_k8s_spark.operators.ranking import (
        ntile_global,
    )

    o = table(spark, "orders", sf_dir)
    cust = o.groupBy("o_custkey").agg(
        F.datediff(
            F.lit("2001-09-01").cast("timestamp"), F.max("o_orderdate")
        ).alias("recency_days"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("monetary"),
    )
    scored = ntile_global(
        cust, ["recency_days", "o_custkey"], k=5, tile_col="r_score"
    )
    scored = ntile_global(
        scored, [F.col("frequency").desc(), "o_custkey"], k=5, tile_col="f_score"
    )
    scored = ntile_global(
        scored, [F.col("monetary").desc(), "o_custkey"], k=5, tile_col="m_score"
    )
    return (
        scored.groupBy("r_score", "f_score", "m_score")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("monetary").cast("double").alias("segment_revenue"),
        )
        .orderBy("r_score", "f_score", "m_score")
    )


# -- supplier concentration (HHI) per nation ---------------------------------
# The Herfindahl-Hirschman index of supplier revenue within each nation:
# the market-concentration companion to rel_order_value_gini. Revenue
# shares come from exact DECIMAL sums; each squared share is quantized
# to a 1e-9 grid BEFORE the per-nation summation (decimal sum — the
# repo's association-order-free convention), so the float work is one
# mirrored square per supplier, never an order-sensitive reduction.
@register(
    "rel_supplier_hhi",
    oracle="""
WITH rev AS (
  SELECT s.s_nationkey, l.l_suppkey,
         sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
             * (CAST(1 AS DECIMAL(4,2)) - CAST(l.l_discount AS DECIMAL(4,2))))
           AS r
  FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
  GROUP BY 1, 2
),
tot AS (SELECT s_nationkey, sum(r) AS t FROM rev GROUP BY 1),
terms AS (
  SELECT rev.s_nationkey,
         CAST(floor(pow(CAST(rev.r AS DOUBLE) / CAST(tot.t AS DOUBLE), 2)
                    * 1000000000) AS DECIMAL(28,9)) / 1000000000 AS sq
  FROM rev JOIN tot ON tot.s_nationkey = rev.s_nationkey
)
SELECT n.n_name AS nation,
       count(*) AS n_suppliers,
       floor(CAST(sum(sq) AS DOUBLE) * 10000 + 0.5) / 10000 AS hhi
FROM terms t JOIN nation n ON n.n_nationkey = t.s_nationkey
GROUP BY 1
ORDER BY 1
""",
)
def q_rel_supplier_hhi(spark: SparkSession, sf_dir: str):
    li = table(spark, "lineitem", sf_dir)
    sup = table(spark, "supplier", sf_dir).select("s_suppkey", "s_nationkey")
    nat = table(spark, "nation", sf_dir).select("n_nationkey", "n_name")
    amount = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1).cast("decimal(4,2)") - F.col("l_discount").cast("decimal(4,2)")
    )
    rev = (
        li.join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .groupBy("s_nationkey", "l_suppkey")
        .agg(F.sum(amount).alias("r"))
    )
    tot = rev.groupBy("s_nationkey").agg(F.sum("r").alias("t"))
    terms = rev.join(tot, "s_nationkey").select(
        "s_nationkey",
        (
            F.floor(
                F.pow(F.col("r").cast("double") / F.col("t").cast("double"), 2)
                * 1000000000
            ).cast("decimal(28,9)")
            / 1000000000
        ).alias("sq"),
    )
    return (
        terms.join(F.broadcast(nat), terms.s_nationkey == nat.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            (
                F.floor(F.sum("sq").cast("double") * 10000 + 0.5) / 10000
            ).alias("hhi"),
        )
        .orderBy("nation")
    )


# -- exact distributed quantiles --------------------------------------------
# EXACT quantile_cont over the full lineitem price column WITHOUT the
# single-task exact-percentile quarantine (SCALING.md "no free lunch"):
# operators/ranking.py::exact_quantiles range-sorts in parallel, then
# fetches only the <= 2 ranks that bracket each target quantile via a
# JVM-side partition filter (driver knows each rank's partition from the
# offsets job). Spark's own exact `percentile` buffers every value per
# group; this plan's only cost is a distributed sort. The oracle is
# DuckDB's independently implemented quantile_cont.
@register(
    "rel_exact_quantiles_scale",
    oracle="""
SELECT CAST(q AS DOUBLE) AS q,
       floor(v * 10000 + 0.5) / 10000 AS value
FROM (
  SELECT 0.25 AS q, quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.25) AS v
  FROM lineitem
  UNION ALL
  SELECT 0.5, quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.5) FROM lineitem
  UNION ALL
  SELECT 0.75, quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.75) FROM lineitem
  UNION ALL
  SELECT 0.9, quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.9) FROM lineitem
  UNION ALL
  SELECT 0.99, quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.99) FROM lineitem
)
ORDER BY q
""",
)
def q_rel_exact_quantiles_scale(spark: SparkSession, sf_dir: str):
    from electricity_forecast_pipeline_airflow_k8s_spark.operators.ranking import (
        exact_quantiles,
    )

    li = table(spark, "lineitem", sf_dir).select("l_extendedprice")
    out = exact_quantiles(li, "l_extendedprice", [0.25, 0.5, 0.75, 0.9, 0.99])
    return out.select("q", portable_round(F.col("value"), 4).alias("value")).orderBy(
        "q"
    )


# -- interval union length (gaps-and-islands over real intervals) -----------
# Per-supplier shipping "busy days": each lineitem occupies the interval
# [shipdate, shipdate + (quantity % 14 + 1) days) and overlapping/adjacent
# intervals must count each covered day ONCE. Spark merges intervals with
# the classic islands layout — window partitioned BY SUPPLIER (parallelism
# = suppliers, never a global sort): running max of interval end, a new
# island whenever the next start clears it, then two hash aggs. The
# oracle never forms islands at all: it EXPLODES every interval into its
# days and counts distinct (correct by definition, quadratic in interval
# length — oracle-scale only). Independent derivations of interval union.
@register(
    "rel_interval_union_days",
    oracle="""
WITH iv AS (
  SELECT l_suppkey,
         CAST(l_shipdate AS DATE) AS s,
         CAST(l_shipdate AS DATE)
           + ((CAST(l_quantity AS INT) % 14) + 1) AS e
  FROM lineitem
),
days AS (
  SELECT DISTINCT l_suppkey,
         unnest(generate_series(s, e - 1, INTERVAL 1 DAY)) AS d
  FROM iv
)
SELECT l_suppkey, count(*) AS covered_days
FROM days GROUP BY 1 ORDER BY 1
""",
)
def q_rel_interval_union_days(spark: SparkSession, sf_dir: str):
    li = table(spark, "lineitem", sf_dir).select(
        "l_suppkey",
        F.to_date("l_shipdate").alias("s"),
        F.date_add(
            F.to_date("l_shipdate"),
            (F.col("l_quantity").cast("int") % 14) + 1,
        ).alias("e"),
    )
    w = Window.partitionBy("l_suppkey").orderBy("s", "e")
    prev_end = F.max("e").over(w.rowsBetween(Window.unboundedPreceding, -1))
    flagged = li.withColumn(
        "new_island",
        F.when(prev_end.isNull() | (F.col("s") > prev_end), 1).otherwise(0),
    ).withColumn(
        "island_id",
        F.sum("new_island").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    islands = flagged.groupBy("l_suppkey", "island_id").agg(
        F.min("s").alias("istart"), F.max("e").alias("iend")
    )
    return (
        islands.groupBy("l_suppkey")
        .agg(F.sum(F.datediff("iend", "istart")).alias("covered_days"))
        .orderBy("l_suppkey")
    )


# -- winsorized robust statistics -------------------------------------------
# Robust mean/std of prices clipped at the exact [p01, p99]: thresholds
# come from operators/ranking.py::exact_quantiles (distributed rank
# selection — no single-task percentile), quantized to a 1e-6 grid on
# BOTH engines, then broadcast as a 1-row scalar frame (the J2 pattern).
# Spark aggregates with the built-in streaming moments; the oracle
# re-derives mean/std from exact DECIMAL power sums — agreement through
# the 1e-4 grid cross-checks Spark's co-moment path against exact
# arithmetic (same evidence shape as rel_corr_covar).
@register(
    "val_winsorized_stats",
    oracle="""
WITH th AS (
  SELECT floor(quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.01)
               * 1000000 + 0.5) / 1000000 AS lo,
         floor(quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.99)
               * 1000000 + 0.5) / 1000000 AS hi
  FROM lineitem
),
c AS (
  SELECT CAST(CASE WHEN x < lo THEN lo WHEN x > hi THEN hi ELSE x END
              AS DECIMAL(18,6)) AS cx,
         CASE WHEN x < lo THEN 1 ELSE 0 END AS cl,
         CASE WHEN x > hi THEN 1 ELSE 0 END AS ch
  FROM (SELECT CAST(l_extendedprice AS DOUBLE) AS x FROM lineitem)
  CROSS JOIN th
),
s AS (
  SELECT count(*) AS n, CAST(sum(cl) AS BIGINT) AS ncl,
         CAST(sum(ch) AS BIGINT) AS nch,
         CAST(sum(cx) AS DOUBLE) AS sx,
         CAST(sum(CAST(cx AS DECIMAL(19,6)) * CAST(cx AS DECIMAL(19,6)))
              AS DOUBLE) AS sxx
  FROM c
)
SELECT n, ncl AS n_clipped_low, nch AS n_clipped_high,
       floor(sx / n * 10000 + 0.5) / 10000 AS mean_w,
       floor(sqrt((sxx - sx * sx / n) / (n - 1)) * 10000 + 0.5) / 10000
         AS std_w
FROM s
""",
)
def q_val_winsorized_stats(spark: SparkSession, sf_dir: str):
    from electricity_forecast_pipeline_airflow_k8s_spark.operators.ranking import (
        exact_quantiles,
    )

    li = table(spark, "lineitem", sf_dir).select(
        F.col("l_extendedprice").cast("double").alias("x")
    )
    qdf = exact_quantiles(li, "x", [0.01, 0.99])
    th = qdf.agg(
        F.min(F.when(F.col("q") == 0.01, portable_round(F.col("value"), 6))).alias(
            "lo"
        ),
        F.min(F.when(F.col("q") == 0.99, portable_round(F.col("value"), 6))).alias(
            "hi"
        ),
    )
    c = li.crossJoin(F.broadcast(th)).select(
        F.when(F.col("x") < F.col("lo"), F.col("lo"))
        .when(F.col("x") > F.col("hi"), F.col("hi"))
        .otherwise(F.col("x"))
        .cast("decimal(18,6)")
        .alias("cx"),
        F.when(F.col("x") < F.col("lo"), 1).otherwise(0).alias("cl"),
        F.when(F.col("x") > F.col("hi"), 1).otherwise(0).alias("ch"),
    )
    return c.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cl").alias("n_clipped_low"),
        F.sum("ch").alias("n_clipped_high"),
        portable_round(F.avg(F.col("cx").cast("double")), 4).alias("mean_w"),
        portable_round(F.stddev_samp(F.col("cx").cast("double")), 4).alias("std_w"),
    )


# -- exact weighted quantiles -----------------------------------------------
# Quantity-weighted price quartiles (inverted-CDF convention: smallest
# value whose cumulative weight reaches p of total): the weighted
# companion to rel_exact_quantiles_scale. All threshold arithmetic is
# int64 (rational probs, ceil-division) so the crossing row is
# bit-identical to the oracle's min(v) WHERE cum_weight * den >= num *
# total — no float ever enters a comparison on either engine. Plan
# shape: one parallel range sort, one weight-sum job, JVM-pruned pick.
@register(
    "rel_weighted_quantiles_scale",
    oracle="""
WITH t AS (
  SELECT CAST(l_extendedprice AS DOUBLE) AS v,
         CAST(l_quantity AS BIGINT) AS w
  FROM lineitem WHERE l_quantity > 0
),
tot AS (SELECT sum(w) AS tw FROM t),
c AS (SELECT v, sum(w) OVER (ORDER BY v) AS cw FROM t)
SELECT CAST(0.25 AS DOUBLE) AS q, min(v) AS value
FROM c, tot WHERE cw * 4 >= tw
UNION ALL
SELECT 0.5, min(v) FROM c, tot WHERE cw * 2 >= tw
UNION ALL
SELECT 0.75, min(v) FROM c, tot WHERE cw * 4 >= 3 * tw
ORDER BY q
""",
)
def q_rel_weighted_quantiles_scale(spark: SparkSession, sf_dir: str):
    from electricity_forecast_pipeline_airflow_k8s_spark.operators.ranking import (
        weighted_quantiles,
    )

    li = table(spark, "lineitem", sf_dir)
    return weighted_quantiles(
        li, "l_extendedprice", "l_quantity", [(1, 4), (1, 2), (3, 4)]
    ).orderBy("q")


# -- max concurrent intervals (sweep line) -----------------------------------
# Peak simultaneous open shipments per supplier over the same synthetic
# [ship, ship + qty%14 + 1) intervals as rel_interval_union_days: the
# classic sweep line — +1/-1 deltas per event day, running sum within
# supplier, argmax day. Concurrency is piecewise-constant between events,
# so the earliest day at peak is always an event day; the oracle derives
# the identical answer by the opposite construction (explode every
# interval into covered days, count per day, argmax) — independent
# derivations. The window is ALWAYS partitioned by supplier (events per
# supplier bounded), never global; deltas are pre-aggregated per day so
# the running-sum ordering is unique and deterministic.
@register(
    "rel_max_concurrent_intervals",
    oracle="""
WITH iv AS (
  SELECT l_suppkey,
         CAST(l_shipdate AS DATE) AS s,
         CAST(l_shipdate AS DATE)
           + ((CAST(l_quantity AS INT) % 14) + 1) AS e
  FROM lineitem
),
days AS (
  SELECT l_suppkey, unnest(generate_series(s, e - 1, INTERVAL 1 DAY)) AS d
  FROM iv
),
cnt AS (SELECT l_suppkey, d, count(*) AS c FROM days GROUP BY 1, 2),
mx AS (SELECT l_suppkey, max(c) AS max_concurrent FROM cnt GROUP BY 1)
SELECT mx.l_suppkey, mx.max_concurrent,
       CAST(min(cnt.d) AS TIMESTAMP) AS peak_day
FROM mx JOIN cnt
  ON cnt.l_suppkey = mx.l_suppkey AND cnt.c = mx.max_concurrent
GROUP BY 1, 2 ORDER BY 1
""",
)
def q_rel_max_concurrent_intervals(spark: SparkSession, sf_dir: str):
    li = table(spark, "lineitem", sf_dir).select(
        "l_suppkey",
        F.to_date("l_shipdate").alias("s"),
        F.date_add(
            F.to_date("l_shipdate"),
            (F.col("l_quantity").cast("int") % 14) + 1,
        ).alias("e"),
    )
    ev = li.select(
        "l_suppkey", F.col("s").alias("d"), F.lit(1).alias("delta")
    ).unionAll(
        li.select("l_suppkey", F.col("e").alias("d"), F.lit(-1).alias("delta"))
    )
    byday = ev.groupBy("l_suppkey", "d").agg(F.sum("delta").alias("delta"))
    w = (
        Window.partitionBy("l_suppkey")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    run = byday.withColumn("run", F.sum("delta").over(w))
    mx = F.max("run").over(Window.partitionBy("l_suppkey"))
    return (
        run.withColumn("mx", mx)
        .filter(F.col("run") == F.col("mx"))
        .groupBy("l_suppkey")
        .agg(
            F.max("run").alias("max_concurrent"),
            F.min("d").cast("timestamp").alias("peak_day"),
        )
        .orderBy("l_suppkey")
    )


# -- weight-of-evidence / information value binning ---------------------------
# The classic supervised feature-screening statistic (credit-scoring
# lineage): bin o_totalprice into 10 equal-width bins over the observed
# [min, max], label orders bad iff o_orderstatus = 'F', and compute each
# bin's Laplace-smoothed WOE plus its IV contribution. The bin edges are
# global scalars (one tiny agg broadcast back -- the J2 pattern, never a
# sort); bucketing, shares and ln() run on identical IEEE doubles in
# both engines, rounded at the 1e-4 edge. At 100 TB this is two scans
# (one for edges, one binned agg) with a 10-row final result.
@register(
    "rel_woe_iv",
    oracle="""
WITH edges AS (
  SELECT min(CAST(o_totalprice AS DOUBLE)) AS lo,
         max(CAST(o_totalprice AS DOUBLE)) AS hi
  FROM orders
),
binned AS (
  SELECT least(CAST(floor((CAST(o_totalprice AS DOUBLE) - lo)
                          / ((hi - lo) / 10)) AS INT), 9) AS bin,
         CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS bad
  FROM orders CROSS JOIN edges
),
per_bin AS (
  SELECT bin,
         CAST(sum(1 - bad) AS BIGINT) AS n_good,
         CAST(sum(bad) AS BIGINT) AS n_bad
  FROM binned GROUP BY 1
),
tot AS (
  SELECT CAST(sum(n_good) AS DOUBLE) AS g, CAST(sum(n_bad) AS DOUBLE) AS b
  FROM per_bin
)
SELECT bin, n_good, n_bad,
       floor(ln(((n_good + 0.5) / (g + 5.0)) / ((n_bad + 0.5) / (b + 5.0)))
             * 10000 + 0.5) / 10000 AS woe,
       floor((((n_good + 0.5) / (g + 5.0)) - ((n_bad + 0.5) / (b + 5.0)))
             * ln(((n_good + 0.5) / (g + 5.0)) / ((n_bad + 0.5) / (b + 5.0)))
             * 10000 + 0.5) / 10000 AS iv_term
FROM per_bin CROSS JOIN tot ORDER BY bin
""",
)
def q_rel_woe_iv(spark: SparkSession, sf_dir: str):
    o = table(spark, "orders", sf_dir).select(
        F.col("o_totalprice").cast("double").alias("x"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("bad"),
    )
    edges = o.agg(F.min("x").alias("lo"), F.max("x").alias("hi"))
    binned = o.crossJoin(F.broadcast(edges)).select(
        F.least(
            F.floor((F.col("x") - F.col("lo")) / ((F.col("hi") - F.col("lo")) / 10))
            .cast("int"),
            F.lit(9),
        ).alias("bin"),
        "bad",
    )
    per_bin = binned.groupBy("bin").agg(
        F.sum(1 - F.col("bad")).cast("long").alias("n_good"),
        F.sum("bad").cast("long").alias("n_bad"),
    )
    tot = per_bin.agg(
        F.sum("n_good").cast("double").alias("g"),
        F.sum("n_bad").cast("double").alias("b"),
    )
    gs = (F.col("n_good") + 0.5) / (F.col("g") + 5.0)
    bs = (F.col("n_bad") + 0.5) / (F.col("b") + 5.0)
    return (
        per_bin.crossJoin(F.broadcast(tot))
        .select(
            "bin",
            "n_good",
            "n_bad",
            (F.floor(F.log(gs / bs) * 10000 + 0.5) / 10000).alias("woe"),
            (F.floor((gs - bs) * F.log(gs / bs) * 10000 + 0.5) / 10000).alias(
                "iv_term"
            ),
        )
        .orderBy("bin")
    )


# -- ABC / Pareto classification ---------------------------------------------
# Inventory-analytics classic: rank parts by revenue, classify by
# cumulative revenue share (A <= 80%, B <= 95%, C = tail). The global
# running total — a SUM() OVER (ORDER BY ..) with no partition key, the
# textbook single-task window — runs through
# operators/ranking.py::global_prefix_sum instead: range repartition +
# per-partition sum offsets, exact int64 arithmetic on a 1e-4 revenue
# grid (the DECIMAL(18,2)x(1-disc) product has scale 4, so scaling by
# 10^4 is lossless). Class predicates are integer-rational
# (cum*5 <= total*4), float-free. The oracle uses the plain window
# cumsum — the driver hash-match proves the distributed prefix sum
# equals the sequential definition.
@register(
    "rel_abc_classification",
    oracle="""
WITH rev AS (
  SELECT l_partkey,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                  * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))))
              * 10000 AS BIGINT) AS rev_fp
  FROM lineitem GROUP BY 1
),
cum AS (
  SELECT l_partkey, rev_fp,
         sum(rev_fp) OVER (ORDER BY rev_fp DESC, l_partkey
                           ROWS UNBOUNDED PRECEDING) AS cum_fp,
         (SELECT sum(rev_fp) FROM rev) AS total_fp
  FROM rev
),
classed AS (
  SELECT CASE WHEN cum_fp * 5 <= total_fp * 4 THEN 'A'
              WHEN cum_fp * 20 <= total_fp * 19 THEN 'B'
              ELSE 'C' END AS abc_class,
         rev_fp, total_fp
  FROM cum
)
SELECT abc_class,
       count(*) AS n_parts,
       floor(CAST(sum(rev_fp) AS DOUBLE) / 10000 * 100 + 0.5) / 100
         AS class_revenue,
       floor(CAST(sum(rev_fp) AS DOUBLE) / max(total_fp) * 10000 + 0.5)
         / 10000 AS revenue_share
FROM classed GROUP BY 1 ORDER BY 1
""",
)
def q_rel_abc_classification(spark: SparkSession, sf_dir: str):
    from electricity_forecast_pipeline_airflow_k8s_spark.operators.ranking import (
        global_prefix_sum,
    )

    li = table(spark, "lineitem", sf_dir)
    rev = li.groupBy("l_partkey").agg(
        (
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * (F.lit(1).cast("decimal(4,2)") - F.col("l_discount").cast("decimal(4,2)"))
            )
            * 10000
        )
        .cast("long")
        .alias("rev_fp")
    )
    cum, total = global_prefix_sum(
        rev, [F.col("rev_fp").desc(), "l_partkey"], "rev_fp", cum_col="cum_fp"
    )
    classed = cum.select(
        F.when(F.col("cum_fp") * 5 <= total * 4, "A")
        .when(F.col("cum_fp") * 20 <= total * 19, "B")
        .otherwise("C")
        .alias("abc_class"),
        "rev_fp",
    )
    return (
        classed.groupBy("abc_class")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            (
                F.floor(F.sum("rev_fp").cast("double") / 10000 * 100 + 0.5) / 100
            ).alias("class_revenue"),
            (
                F.floor(F.sum("rev_fp").cast("double") / total * 10000 + 0.5)
                / 10000
            ).alias("revenue_share"),
        )
        .orderBy("abc_class")
    )


# -- inter-purchase gap analysis ----------------------------------------------
# Median days between consecutive orders per customer, rolled up to the
# market segment: the inter-arrival statistic behind replenishment
# forecasting and churn flags ("customer's usual cadence"). Two-level:
# lag window per customer (bounded by orders-per-customer), exact median
# of the per-customer medians per segment — medians of integer day
# counts interpolate identically on both engines. Customers with a
# single order contribute no gap.
@register(
    "rel_purchase_gap_stats",
    oracle="""
WITH gaps AS (
  SELECT o_custkey,
         datediff('day',
                  lag(o_orderdate::TIMESTAMP) OVER (
                    PARTITION BY o_custkey
                    ORDER BY o_orderdate::TIMESTAMP, o_orderkey),
                  o_orderdate::TIMESTAMP) AS gap_days
  FROM orders
),
per_cust AS (
  SELECT o_custkey, quantile_cont(gap_days, 0.5) AS med_gap,
         count(*) AS n_gaps
  FROM gaps WHERE gap_days IS NOT NULL GROUP BY 1
)
SELECT c.c_mktsegment,
       count(*) AS n_customers,
       CAST(sum(p.n_gaps) AS BIGINT) AS n_gaps,
       floor(quantile_cont(p.med_gap, 0.5) * 10000 + 0.5) / 10000
         AS median_gap_days
FROM per_cust p JOIN customer c ON c.c_custkey = p.o_custkey
GROUP BY 1 ORDER BY 1
""",
)
def q_rel_purchase_gap_stats(spark: SparkSession, sf_dir: str):
    o = table(spark, "orders", sf_dir)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = o.select(
        "o_custkey",
        F.datediff(
            F.col("o_orderdate"), F.lag("o_orderdate").over(w)
        ).alias("gap_days"),
    ).filter(F.col("gap_days").isNotNull())
    per_cust = gaps.groupBy("o_custkey").agg(
        F.median("gap_days").alias("med_gap"),
        F.count(F.lit(1)).alias("n_gaps"),
    )
    c = table(spark, "customer", sf_dir).select("c_custkey", "c_mktsegment")
    return (
        per_cust.join(c, per_cust["o_custkey"] == c["c_custkey"])
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("n_gaps").cast("long").alias("n_gaps"),
            (F.floor(F.median("med_gap") * 10000 + 0.5) / 10000).alias(
                "median_gap_days"
            ),
        )
        .orderBy("c_mktsegment")
    )

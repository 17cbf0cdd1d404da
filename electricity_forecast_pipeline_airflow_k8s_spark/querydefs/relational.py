"""Relational-breadth queries over the TPC-H-ish star schema -- the
capability-parity rows of SURVEY §2.3/2.4/2.6/2.7 (the reference performs no
explicit joins; these are the joins/aggs/sets the engine must provide).

Money arithmetic convention: sums over double money columns are computed in
DECIMAL (exact, order-independent) and cast back to double at the end, so
Spark and DuckDB agree bit-for-bit regardless of partial-agg ordering --
this is also the right call at 100 TB scale, where float sums drift by
partition count.
"""

from __future__ import annotations

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from electricity_forecast_pipeline_airflow_k8s_spark.queries import register, table
from electricity_forecast_pipeline_airflow_k8s_spark.functions.stats import (
    portable_round,
)

D182 = "decimal(18,2)"
D42 = "decimal(4,2)"


def _money(c):  # exact decimal money
    return F.col(c).cast(D182)


def _one_minus(c):  # (1 - discount) / (1 + tax) in decimal
    return F.lit(1).cast(D42) - F.col(c).cast(D42)


def _one_plus(c):
    return F.lit(1).cast(D42) + F.col(c).cast(D42)


# -- TPC-H Q1-style pricing summary (A1/A6 on the star schema) --------------
@register(
    "rel_pricing_summary",
    oracle="""
SELECT l_returnflag, l_linestatus,
       sum(l_quantity) AS sum_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
            * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
         AS sum_disc_price,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
            * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))
            * (CAST(1 AS DECIMAL(4,2)) + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE)
         AS sum_charge,
       floor((sum(l_quantity) / count(*)) * 10000 + 0.5) / 10000 AS avg_qty,
       floor((CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
              / count(*)) * 10000 + 0.5) / 10000 AS avg_price,
       CAST(sum(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS sum_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""",
)
def q_pricing_summary(spark: SparkSession, sf_dir: str):
    li = table(spark, "lineitem", sf_dir).filter(F.col("l_shipdate") <= "1998-09-02")
    disc_price = _money("l_extendedprice") * _one_minus("l_discount")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.sum(_money("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(disc_price * _one_plus("l_tax")).cast("double").alias("sum_charge"),
            (F.floor(F.sum("l_quantity") / F.count(F.lit(1)) * 10000 + 0.5) / 10000).alias("avg_qty"),
            (
                F.floor(
                    F.sum(_money("l_extendedprice")).cast("double")
                    / F.count(F.lit(1))
                    * 10000
                    + 0.5
                )
                / 10000
            ).alias("avg_price"),
            F.sum(F.col("l_discount").cast(D42)).cast("double").alias("sum_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# -- J4: star-schema equi-join chain, revenue per region --------------------
# Dims are tiny -> broadcast-hash joins all the way down; the only shuffle
# is the final tiny aggregation.
@register(
    "rel_star_revenue",
    oracle="""
SELECT r.r_name AS region,
       CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
            * (CAST(1 AS DECIMAL(4,2)) - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE)
         AS revenue,
       count(*) AS n_items
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name
ORDER BY r.r_name
""",
)
def q_star_revenue(spark: SparkSession, sf_dir: str):
    li = table(spark, "lineitem", sf_dir)
    o = table(spark, "orders", sf_dir)
    c = table(spark, "customer", sf_dir)
    n = table(spark, "nation", sf_dir)
    r = table(spark, "region", sf_dir)
    # customer is NOT force-broadcast: at sf100 it is ~15M rows and a forced
    # broadcast OOMs the driver; AQE sizes that join at runtime. Only the
    # bounded dims (nation=25, region=5 rows at every SF) are hinted.
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    return (
        joined.groupBy(F.col("r_name").alias("region"))
        .agg(
            F.sum(_money("l_extendedprice") * _one_minus("l_discount"))
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("region")
    )


# -- TPC-H Q3-style: filtered 3-way join + grouped revenue + top-K ----------
@register(
    "rel_shipping_priority",
    oracle="""
SELECT o.o_orderkey,
       CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
            * (CAST(1 AS DECIMAL(4,2)) - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE)
         AS revenue,
       o.o_orderdate, o.o_orderpriority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-03-15'
  AND l.l_shipdate > TIMESTAMP '1995-03-15'
GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, o.o_orderkey LIMIT 10
""",
)
def q_shipping_priority(spark: SparkSession, sf_dir: str):
    c = table(spark, "customer", sf_dir).filter(F.col("c_mktsegment") == "BUILDING")
    o = table(spark, "orders", sf_dir).filter(F.col("o_orderdate") < "1998-03-15")
    li = table(spark, "lineitem", sf_dir).filter(F.col("l_shipdate") > "1995-03-15")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.sum(_money("l_extendedprice") * _one_minus("l_discount"))
            .cast("double")
            .alias("revenue")
        )
        .select("o_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "o_orderkey")
        .limit(10)
    )


# -- TPC-H Q5-style: 6-table join, revenue per nation -----------------------
@register(
    "rel_nation_revenue",
    oracle="""
SELECT n.n_name AS nation,
       CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
            * (CAST(1 AS DECIMAL(4,2)) - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE)
         AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
GROUP BY n.n_name
ORDER BY revenue DESC, nation
""",
)
def q_nation_revenue(spark: SparkSession, sf_dir: str):
    c = table(spark, "customer", sf_dir)
    o = table(spark, "orders", sf_dir)
    li = table(spark, "lineitem", sf_dir)
    s = table(spark, "supplier", sf_dir)
    n = table(spark, "nation", sf_dir)
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
    )
    return (
        joined.groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.sum(_money("l_extendedprice") * _one_minus("l_discount"))
            .cast("double")
            .alias("revenue")
        )
        .orderBy(F.desc("revenue"), "nation")
    )


# -- J5: left-semi / left-anti joins (`core/airflow_dag.py:612-615` pattern)
@register(
    "rel_semi_join",
    oracle="""
SELECT c_custkey, c_name FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
ORDER BY c_custkey
""",
)
def q_semi_join(spark: SparkSession, sf_dir: str):
    c = table(spark, "customer", sf_dir)
    o = table(spark, "orders", sf_dir)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@register(
    "rel_anti_join",
    oracle="""
SELECT c_custkey, c_name FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
ORDER BY c_custkey
""",
)
def q_anti_join(spark: SparkSession, sf_dir: str):
    c = table(spark, "customer", sf_dir)
    o = table(spark, "orders", sf_dir)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


# -- O-TOPK: global top-K (TakeOrderedAndProject, no full sort) -------------
@register(
    "rel_topk_orders",
    oracle="""
SELECT o_orderkey, o_custkey, floor((o_totalprice) * 10000 + 0.5) / 10000 AS o_totalprice
FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
""",
)
def q_topk_orders(spark: SparkSession, sf_dir: str):
    o = table(spark, "orders", sf_dir)
    return (
        o.orderBy(F.desc("o_totalprice"), "o_orderkey")
        .select("o_orderkey", "o_custkey", portable_round("o_totalprice", 4).alias("o_totalprice"))
        .limit(10)
    )


# -- O-TOPK2: top-K per group via row_number (retention pattern S10) --------
@register(
    "rel_topk_per_group",
    oracle="""
SELECT o_custkey, o_orderkey, floor((o_totalprice) * 10000 + 0.5) / 10000 AS o_totalprice
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
) WHERE rn <= 3 ORDER BY o_custkey, o_orderkey
""",
)
def q_topk_per_group(spark: SparkSession, sf_dir: str):
    o = table(spark, "orders", sf_dir)
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", portable_round("o_totalprice", 4).alias("o_totalprice"))
        .orderBy("o_custkey", "o_orderkey")
    )


# -- §2.7: set operations ---------------------------------------------------
@register(
    "rel_set_ops",
    oracle="""
SELECT 'union' AS op, x FROM (
  SELECT c_nationkey AS x FROM customer UNION SELECT s_nationkey FROM supplier)
UNION ALL
SELECT 'intersect', x FROM (
  SELECT c_nationkey AS x FROM customer INTERSECT SELECT s_nationkey FROM supplier)
UNION ALL
SELECT 'except', x FROM (
  SELECT c_nationkey AS x FROM customer EXCEPT SELECT s_nationkey FROM supplier)
ORDER BY op, x
""",
)
def q_set_ops(spark: SparkSession, sf_dir: str):
    c = table(spark, "customer", sf_dir).select(F.col("c_nationkey").alias("x"))
    s = table(spark, "supplier", sf_dir).select(F.col("s_nationkey").alias("x"))
    parts = [
        c.union(s).distinct().select(F.lit("union").alias("op"), "x"),
        c.intersect(s).select(F.lit("intersect").alias("op"), "x"),
        c.subtract(s).select(F.lit("except").alias("op"), "x"),
    ]
    out = parts[0].unionByName(parts[1]).unionByName(parts[2])
    return out.orderBy("op", "x")


# -- cube / rollup / grouping sets (capability bar, SURVEY §2.4) ------------
@register(
    "rel_rollup",
    oracle="""
SELECT o_orderstatus, o_orderpriority, count(*) AS n,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
""",
)
def q_rollup(spark: SparkSession, sf_dir: str):
    o = table(spark, "orders", sf_dir)
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(_money("o_totalprice")).cast("double").alias("total"),
        )
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


@register(
    "rel_cube",
    oracle="""
SELECT o_orderstatus, o_orderpriority, count(*) AS n
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
""",
)
def q_cube(spark: SparkSession, sf_dir: str):
    o = table(spark, "orders", sf_dir)
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


# -- ranking windows: row_number / rank / dense_rank / ntile ----------------
@register(
    "rel_window_rank",
    oracle="""
SELECT c_nationkey, c_custkey, floor((c_acctbal) * 10000 + 0.5) / 10000 AS c_acctbal, rn, rk, drk, nt
FROM (
  SELECT c_nationkey, c_custkey, c_acctbal,
         row_number() OVER w AS rn,
         rank() OVER w AS rk,
         dense_rank() OVER w AS drk,
         ntile(4) OVER w AS nt
  FROM customer
  WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
) WHERE rn <= 3 ORDER BY c_nationkey, rn
""",
)
def q_window_rank(spark: SparkSession, sf_dir: str):
    c = table(spark, "customer", sf_dir)
    w = Window.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"), "c_custkey")
    return (
        c.select(
            "c_nationkey",
            "c_custkey",
            "c_acctbal",
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rk"),
            F.dense_rank().over(w).alias("drk"),
            F.ntile(4).over(w).alias("nt"),
        )
        .filter(F.col("rn") <= 3)
        .select(
            "c_nationkey",
            "c_custkey",
            portable_round("c_acctbal", 4).alias("c_acctbal"),
            "rn",
            "rk",
            "drk",
            "nt",
        )
        .orderBy("c_nationkey", "rn")
    )


# -- frame windows: running sum + lead/lag per order ------------------------
@register(
    "rel_window_running",
    oracle="""
SELECT l_orderkey, l_linenumber,
       sum(l_quantity) OVER (PARTITION BY l_orderkey ORDER BY l_linenumber
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_qty,
       lag(l_quantity) OVER (PARTITION BY l_orderkey ORDER BY l_linenumber)
         AS prev_qty,
       lead(l_quantity) OVER (PARTITION BY l_orderkey ORDER BY l_linenumber)
         AS next_qty
FROM lineitem
WHERE l_orderkey <= 100
ORDER BY l_orderkey, l_linenumber
""",
)
def q_window_running(spark: SparkSession, sf_dir: str):
    li = table(spark, "lineitem", sf_dir).filter(F.col("l_orderkey") <= 100)
    w = Window.partitionBy("l_orderkey").orderBy("l_linenumber")
    frame = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.sum("l_quantity").over(frame).alias("running_qty"),
        F.lag("l_quantity").over(w).alias("prev_qty"),
        F.lead("l_quantity").over(w).alias("next_qty"),
    ).orderBy("l_orderkey", "l_linenumber")


# -- F1/F2: date/time scalar functions --------------------------------------
@register(
    "rel_date_functions",
    oracle="""
SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS order_month,
       CAST(extract(year FROM o_orderdate) AS INT) AS order_year,
       count(*) AS n,
       CAST(min(extract(month FROM o_orderdate)) AS INT) AS min_month,
       CAST(max(extract(day FROM o_orderdate)) AS INT) AS max_day
FROM orders
GROUP BY 1, 2 ORDER BY 1
""",
)
def q_date_functions(spark: SparkSession, sf_dir: str):
    o = table(spark, "orders", sf_dir)
    return (
        o.groupBy(
            F.date_trunc("month", "o_orderdate").alias("order_month"),
            F.year("o_orderdate").alias("order_year"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min(F.month("o_orderdate")).alias("min_month"),
            F.max(F.dayofmonth("o_orderdate")).alias("max_day"),
        )
        .orderBy("order_month")
    )


# -- F5/F6: string scalar functions -----------------------------------------
@register(
    "rel_string_functions",
    oracle="""
SELECT c_custkey,
       upper(c_name) AS uname,
       length(c_name) AS name_len,
       substr(c_name, 1, 8) AS prefix,
       c_name LIKE 'Customer%' AS is_cust,
       concat_ws(':', c_mktsegment, CAST(c_nationkey AS VARCHAR)) AS seg_nation
FROM customer
WHERE c_custkey <= 50 ORDER BY c_custkey
""",
)
def q_string_functions(spark: SparkSession, sf_dir: str):
    c = table(spark, "customer", sf_dir).filter(F.col("c_custkey") <= 50)
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("uname"),
        F.length("c_name").alias("name_len"),
        F.substring("c_name", 1, 8).alias("prefix"),
        F.col("c_name").like("Customer%").alias("is_cust"),
        F.concat_ws(":", "c_mktsegment", F.col("c_nationkey").cast("string")).alias(
            "seg_nation"
        ),
    ).orderBy("c_custkey")


# -- F4: math scalar functions ----------------------------------------------
@register(
    "rel_math_functions",
    oracle="""
SELECT l_orderkey, l_linenumber,
       floor((abs(l_extendedprice - l_quantity * 1000)) * 10000 + 0.5) / 10000 AS absdiff,
       floor((sqrt(l_quantity)) * 10000 + 0.5) / 10000 AS sqrt_qty,
       floor((pow(l_discount, 2)) * 10000 + 0.5) / 10000 AS disc_sq,
       CAST(floor(l_quantity / 7) AS BIGINT) AS qty_div7,
       CAST(floor(l_quantity) AS INT) % 5 AS qty_mod5,
       CAST(sign(l_extendedprice - 30000.0) AS DOUBLE) AS price_sign
FROM lineitem WHERE l_orderkey <= 40 ORDER BY l_orderkey, l_linenumber
""",
)
def q_math_functions(spark: SparkSession, sf_dir: str):
    li = table(spark, "lineitem", sf_dir).filter(F.col("l_orderkey") <= 40)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        portable_round(F.abs(F.col("l_extendedprice") - F.col("l_quantity") * 1000), 4).alias(
            "absdiff"
        ),
        portable_round(F.sqrt("l_quantity"), 4).alias("sqrt_qty"),
        portable_round(F.pow("l_discount", F.lit(2)), 4).alias("disc_sq"),
        F.floor(F.col("l_quantity") / 7).cast("bigint").alias("qty_div7"),
        # floor, not cast: DuckDB CAST(double AS INT) rounds to nearest
        # while Spark truncates -- floor is identical in both
        (F.floor("l_quantity").cast("int") % 5).alias("qty_mod5"),
        F.signum(F.col("l_extendedprice") - 30000.0).alias("price_sign"),
    ).orderBy("l_orderkey", "l_linenumber")


# -- F7: JSON extraction from the events props column -----------------------
@register(
    "rel_json_extract",
    oracle="""
SELECT CAST(json_extract_string(props, '$.k') AS INT) AS k, count(*) AS n
FROM events GROUP BY 1 ORDER BY 1 NULLS FIRST LIMIT 20
""",
)
def q_json_extract(spark: SparkSession, sf_dir: str):
    ev = table(spark, "events", sf_dir)
    return (
        ev.groupBy(F.get_json_object("props", "$.k").cast("int").alias("k"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("k")
        .limit(20)
    )


# -- J6: as-of join -- most recent prior 'click' for each 'purchase' --------
# Expressed as a frame window (max over rows preceding), which at scale is
# one shuffle on (user_id, ts) -- no range self-join blowup.
@register(
    "rel_asof_click_before_purchase",
    oracle="""
WITH ev AS (SELECT event_id, ts::TIMESTAMP AS ts, user_id, event_type FROM events),
flagged AS (
  SELECT event_id, user_id, ts, event_type,
         max(CASE WHEN event_type = 'click' THEN ts END) OVER
           (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_click_ts
  FROM ev
)
SELECT event_id, user_id, ts, last_click_ts
FROM flagged WHERE event_type = 'purchase'
ORDER BY event_id
""",
)
def q_asof_join(spark: SparkSession, sf_dir: str):
    ev = table(spark, "events", sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        ev.withColumn(
            "last_click_ts",
            F.max(F.when(F.col("event_type") == "click", F.col("ts"))).over(w),
        )
        .filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "ts", "last_click_ts")
        .orderBy("event_id")
    )


# -- J6b: range/interval join -- events within 1 day after an order date ----
# (theta-join; kept selective via the orderkey filter so the oracle stays
# cheap; at scale this is a range-bucketed join, see operators/timeseries.)
@register(
    "rel_range_join",
    oracle="""
SELECT o.o_orderkey, count(e.event_id) AS n_events
FROM (SELECT o_orderkey, o_orderdate FROM orders WHERE o_orderkey <= 200) o
LEFT JOIN (SELECT event_id, ts::TIMESTAMP AS ts FROM events) e
  ON e.ts >= o.o_orderdate AND e.ts < o.o_orderdate + INTERVAL 1 DAY
GROUP BY o.o_orderkey ORDER BY o.o_orderkey
""",
)
def q_range_join(spark: SparkSession, sf_dir: str):
    o = (
        table(spark, "orders", sf_dir)
        .filter(F.col("o_orderkey") <= 200)
        .select("o_orderkey", "o_orderdate")
    )
    # round-11 (guide §3.1): the [o_orderdate, o_orderdate + 1 day)
    # interval is exactly one CALENDAR day, so "ts inside the interval"
    # is equivalent to to_date(ts) == o_orderdate (NULL ts matches
    # nothing on both formulations). The theta self-predicate forced a
    # BroadcastNestedLoopJoin -- every event row compared against all
    # 200 order rows on one core; the derived-column equi-join hashes
    # instead, and at 100 TB it is the difference between O(|events| x
    # |orders|) and O(|events|).
    ev = table(spark, "events", sf_dir).select(
        "event_id", F.to_date("ts").alias("ts_day")
    )
    return (
        o.join(ev, o.o_orderdate == ev.ts_day, "left")
        .groupBy("o_orderkey")
        .agg(F.count("event_id").alias("n_events"))
        .orderBy("o_orderkey")
    )

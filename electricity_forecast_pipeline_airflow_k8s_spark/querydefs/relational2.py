"""Second relational batch: SQL-API queries (temp views + spark.sql),
correlated subqueries, outer joins, pivot, grouping sets, regex, approx
variants -- rounding out the capability bar of SURVEY §2.3/2.4/2.8."""

from __future__ import annotations

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from electricity_forecast_pipeline_airflow_k8s_spark.functions.stats import (
    portable_round,
    portable_round_sql,
)
from electricity_forecast_pipeline_airflow_k8s_spark.queries import register, table


def _views(spark: SparkSession, sf_dir: str, names: tuple[str, ...]):
    for n in names:
        table(spark, n, sf_dir).createOrReplaceTempView(n)


# -- TPC-H Q4-style: correlated EXISTS subquery via the SQL surface ---------
@register(
    "rel_sql_exists_priority",
    oracle="""
SELECT o_orderpriority, count(*) AS n_orders
FROM orders o
WHERE o_orderdate < TIMESTAMP '1997-01-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
GROUP BY o_orderpriority ORDER BY o_orderpriority
""",
)
def q_sql_exists(spark: SparkSession, sf_dir: str):
    _views(spark, sf_dir, ("orders", "lineitem"))
    return spark.sql(
        """
        SELECT o_orderpriority, count(*) AS n_orders
        FROM orders o
        WHERE o_orderdate < TIMESTAMP '1997-01-01'
          AND EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey
                        AND l.l_shipdate > o.o_orderdate)
        GROUP BY o_orderpriority ORDER BY o_orderpriority
        """
    )


# -- scalar correlated subquery: customers above their nation's avg balance
@register(
    "rel_sql_above_nation_avg",
    oracle="""
SELECT c_custkey, floor((c_acctbal) * 10000 + 0.5) / 10000 AS c_acctbal
FROM customer c
WHERE c_acctbal > (SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                          / count(c_acctbal)
                   FROM customer c2
                   WHERE c2.c_nationkey = c.c_nationkey)
ORDER BY c_custkey
""",
)
def q_sql_above_avg(spark: SparkSession, sf_dir: str):
    # threshold via exact decimal sum / count: a raw double avg() is
    # summation-order dependent and can flip strict-> membership between
    # engines for balances at the boundary
    _views(spark, sf_dir, ("customer",))
    return spark.sql(
        """
        SELECT c_custkey, floor((c_acctbal) * 10000 + 0.5) / 10000 AS c_acctbal
        FROM customer c
        WHERE c_acctbal > (SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2)))
                                       AS DOUBLE) / count(c_acctbal)
                           FROM customer c2
                           WHERE c2.c_nationkey = c.c_nationkey)
        ORDER BY c_custkey
        """
    )


# -- outer joins with null semantics ----------------------------------------
@register(
    "rel_outer_join_counts",
    oracle="""
SELECT n.n_name AS nation,
       count(c.c_custkey) AS n_customers,
       count(s.s_suppkey) AS n_suppliers
FROM nation n
LEFT JOIN customer c ON c.c_nationkey = n.n_nationkey
LEFT JOIN supplier s ON s.s_nationkey = n.n_nationkey
GROUP BY n.n_name ORDER BY n.n_name
""",
)
def q_outer_join(spark: SparkSession, sf_dir: str):
    n = table(spark, "nation", sf_dir)
    c = table(spark, "customer", sf_dir)
    s = table(spark, "supplier", sf_dir)
    return (
        n.join(c, c.c_nationkey == n.n_nationkey, "left")
        .join(s, s.s_nationkey == n.n_nationkey, "left")
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count("c_custkey").alias("n_customers"),
            F.count("s_suppkey").alias("n_suppliers"),
        )
        .orderBy("nation")
    )


# -- pivot (CASE-based oracle; fixed value list keeps columns deterministic)
@register(
    "rel_pivot_status_priority",
    oracle="""
SELECT o_orderpriority,
       count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS F,
       count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS O,
       count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS P
FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
""",
)
def q_pivot(spark: SparkSession, sf_dir: str):
    o = table(spark, "orders", sf_dir)
    pivoted = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
    )
    # pivot leaves NULL for empty cells; the SQL count(CASE..) oracle
    # yields 0 -- align (latent mismatch on any sf missing a combo)
    return pivoted.select(
        "o_orderpriority",
        *[F.coalesce(c, F.lit(0)).alias(c) for c in ("F", "O", "P")],
    ).orderBy("o_orderpriority")


# -- grouping sets with grouping() marker -----------------------------------
@register(
    "rel_grouping_sets",
    oracle="""
SELECT o_orderstatus, o_orderpriority,
       grouping(o_orderstatus) AS g_status,
       grouping(o_orderpriority) AS g_priority,
       count(*) AS n
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
ORDER BY g_status, g_priority, o_orderstatus NULLS FIRST,
         o_orderpriority NULLS FIRST
""",
)
def q_grouping_sets(spark: SparkSession, sf_dir: str):
    _views(spark, sf_dir, ("orders",))
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               CAST(grouping(o_orderstatus) AS INT) AS g_status,
               CAST(grouping(o_orderpriority) AS INT) AS g_priority,
               count(*) AS n
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY g_status, g_priority, o_orderstatus NULLS FIRST,
                 o_orderpriority NULLS FIRST
        """
    )


# -- regex extraction / matching --------------------------------------------
@register(
    "rel_regex_extract",
    oracle="""
SELECT c_custkey,
       regexp_extract(c_name, '[0-9]+', 0) AS cust_num,
       regexp_matches(c_name, '^Customer') AS is_customer
FROM customer WHERE c_custkey <= 30 ORDER BY c_custkey
""",
)
def q_regex(spark: SparkSession, sf_dir: str):
    c = table(spark, "customer", sf_dir).filter(F.col("c_custkey") <= 30)
    return c.select(
        "c_custkey",
        F.regexp_extract("c_name", "[0-9]+", 0).alias("cust_num"),
        F.col("c_name").rlike("^Customer").alias("is_customer"),
    ).orderBy("c_custkey")


# -- union-all page concatenation (§2.7: the reference's page accumulation,
# -- `core/data_extraction.py:97`, as a distributed unionByName)
@register(
    "rel_union_pages",
    oracle="""
SELECT count(*) AS n, count(DISTINCT event_id) AS n_distinct
FROM (
  SELECT event_id FROM events WHERE event_id % 2 = 0
  UNION ALL
  SELECT event_id FROM events WHERE event_id % 2 = 1
)
""",
)
def q_union_pages(spark: SparkSession, sf_dir: str):
    ev = table(spark, "events", sf_dir)
    a = ev.filter(F.col("event_id") % 2 == 0).select("event_id")
    b = ev.filter(F.col("event_id") % 2 == 1).select("event_id")
    return a.unionByName(b).agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct("event_id").alias("n_distinct"),
    )


# -- approx variants (scale path). Spark's HLL++/KLL sketch values cannot
# -- be reproduced by another engine, so the oracle-checkable CONTRACT is
# -- the error bound itself: Spark emits the exact anchors (matched
# -- value-for-value against DuckDB) plus booleans asserting the approx
# -- result lies within its documented error envelope; the oracle emits
# -- TRUE literals. A sketch drifting out of tolerance hash-mismatches.
@register(
    "approx_distinct_and_quantiles",
    oracle=f"""
SELECT event_type,
       count(DISTINCT user_id) AS n_users_exact,
       {portable_round_sql("quantile_cont(value, 0.5)", 6)} AS p50_exact,
       TRUE AS approx_users_ok,
       TRUE AS approx_p50_ok,
       TRUE AS approx_p99_ok
FROM events GROUP BY event_type ORDER BY event_type
""",
)
def q_approx(spark: SparkSession, sf_dir: str):
    # flat scalar output only: array columns are not sortable/hashable by
    # the driver's pandas canonicalizer
    from electricity_forecast_pipeline_airflow_k8s_spark.operators.partitioning import (
        fanout,
    )

    # round-11 (guide §2.5): the single-row-group scan ran ALL the partial
    # aggregation (exact-percentile value buffers, HLL, KLL sketches) on
    # one core. Fan the narrow projection out so partials build in
    # parallel; exact counts/percentiles are partition-invariant, HLL
    # merges are register-wise max (order-free), and the approx sketches
    # only feed the envelope booleans. No-op at real scale.
    ev = fanout(
        table(spark, "events", sf_dir).select("event_type", "user_id", "value")
    )
    aqs = F.percentile_approx("value", F.array(F.lit(0.5), F.lit(0.99)))
    eqs = F.percentile("value", F.array(*[F.lit(x) for x in (0.4, 0.5, 0.6, 0.97)]))
    agg = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("n_users_exact"),
        F.approx_count_distinct("user_id").alias("_approx_users"),
        aqs.alias("_aqs"),
        eqs.alias("_eqs"),
        F.max("value").alias("_vmax"),
    )
    rel_err = (
        F.abs(F.col("_approx_users") - F.col("n_users_exact"))
        / F.col("n_users_exact")
    )
    return agg.select(
        "event_type",
        "n_users_exact",
        portable_round(F.element_at("_eqs", 2), 6).alias("p50_exact"),
        # HLL++ default rsd = 0.05; 3x headroom for the probabilistic tail
        (rel_err <= 0.15).alias("approx_users_ok"),
        F.element_at("_aqs", 1)
        .between(F.element_at("_eqs", 1), F.element_at("_eqs", 3))
        .alias("approx_p50_ok"),
        F.element_at("_aqs", 2)
        .between(F.element_at("_eqs", 4), F.col("_vmax"))
        .alias("approx_p99_ok"),
    ).orderBy("event_type")


# -- unpivot / melt (round 3): wide measures -> long (measure, value) -------
# The inverse of rel_pivot_status_priority. Spark's DataFrame.unpivot is
# the native melt (one pass, no join); the oracle uses the portable
# UNION ALL expansion so both engines derive the long frame independently.
@register(
    "rel_unpivot_measures",
    oracle=f"""
WITH long AS (
  SELECT 'l_quantity' AS measure, l_quantity AS val FROM lineitem
  UNION ALL SELECT 'l_extendedprice', l_extendedprice FROM lineitem
  UNION ALL SELECT 'l_discount', l_discount FROM lineitem
  UNION ALL SELECT 'l_tax', l_tax FROM lineitem
)
SELECT measure,
       count(*) AS n,
       {portable_round_sql("CAST(sum(CAST(val AS DECIMAL(18,2))) AS DOUBLE) / count(val)", 4)}
         AS mean_val,
       {portable_round_sql("min(val)", 4)} AS min_val,
       {portable_round_sql("max(val)", 4)} AS max_val
FROM long GROUP BY measure ORDER BY measure
""",
)
def q_unpivot_measures(spark: SparkSession, sf_dir: str):
    li = table(spark, "lineitem", sf_dir)
    long = li.unpivot(
        ids=[],
        values=["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        variableColumnName="measure",
        valueColumnName="val",
    )
    return (
        long.groupBy("measure")
        .agg(
            F.count(F.lit(1)).alias("n"),
            portable_round(
                F.sum(F.col("val").cast("decimal(18,2)")).cast("double")
                / F.count("val"),
                4,
            ).alias("mean_val"),
            portable_round(F.min("val"), 4).alias("min_val"),
            portable_round(F.max("val"), 4).alias("max_val"),
        )
        .orderBy("measure")
    )


# -- salted two-level aggregation vs its unsalted oracle (round 3) ----------
# The skew-mitigation machinery (plans/skew.py) registered as a query: the
# salted result must be value-identical to a plain single-level group
# aggregate, which is exactly what the DuckDB oracle computes. DECIMAL
# sums make the two-level merge bit-equal (double re-association would
# drift the mean in the last ulp).
@register(
    "rel_salted_skew_stats",
    oracle=f"""
SELECT event_type,
       count(*) AS n,
       {portable_round_sql("CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(value)", 4)}
         AS mean_value,
       {portable_round_sql("min(value)", 4)} AS min_value,
       {portable_round_sql("max(value)", 4)} AS max_value
FROM events GROUP BY event_type ORDER BY event_type
""",
)
def q_salted_skew_stats(spark: SparkSession, sf_dir: str):
    from electricity_forecast_pipeline_airflow_k8s_spark.plans.skew import salted_stats

    ev = table(spark, "events", sf_dir)
    out = salted_stats(ev, key_cols=["event_type"], value_col="value", n_salts=16)
    return out.select(
        "event_type",
        "n",
        portable_round(F.col("mean_value"), 4).alias("mean_value"),
        portable_round(F.col("min_value"), 4).alias("min_value"),
        portable_round(F.col("max_value"), 4).alias("max_value"),
    ).orderBy("event_type")


# -- NTILE decile report (round 4) ------------------------------------------
# Equal-frequency binning via ntile(10): per market segment, decile bands
# of customer balance with per-band stats. The (c_acctbal, c_custkey)
# total order makes tie placement engine-exact. One shuffle on the
# segment + the window sort -- rank family, same cost shape as rel_window_rank.
@register(
    "rel_ntile_deciles",
    oracle="""
WITH t AS (
  SELECT c_mktsegment, c_acctbal,
         ntile(10) OVER (PARTITION BY c_mktsegment
                         ORDER BY c_acctbal, c_custkey) AS decile
  FROM customer
)
SELECT c_mktsegment, decile,
       CAST(count(*) AS BIGINT) AS n,
       floor(min(c_acctbal) * 10000 + 0.5) / 10000 AS lo,
       floor(max(c_acctbal) * 10000 + 0.5) / 10000 AS hi,
       floor((CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(*))
             * 10000 + 0.5) / 10000 AS avg_bal
FROM t GROUP BY c_mktsegment, decile
ORDER BY c_mktsegment, decile
""",
)
def q_rel_ntile_deciles(spark: SparkSession, sf_dir: str):
    c = table(spark, "customer", sf_dir)
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    t = c.select(
        "c_mktsegment", "c_acctbal", F.ntile(10).over(w).alias("decile")
    )
    return (
        t.groupBy("c_mktsegment", "decile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.floor(F.min("c_acctbal") * 10000 + 0.5) / 10000).alias("lo"),
            (F.floor(F.max("c_acctbal") * 10000 + 0.5) / 10000).alias("hi"),
            (
                F.floor(
                    (
                        F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast(
                            "double"
                        )
                        / F.count(F.lit(1))
                    )
                    * 10000
                    + 0.5
                )
                / 10000
            ).alias("avg_bal"),
        )
        .orderBy("c_mktsegment", "decile")
    )


# -- VARIANT ingestion of semi-structured props (round 4) -------------------
# Spark 4's VARIANT type: parse once into the binary variant encoding,
# extract with variant_get -- the scale path for JSON columns (parse cost
# paid once per row, shredded access after; vs get_json_object re-parsing
# per extraction). Oracle: DuckDB JSON path functions. Integer-exact.
@register(
    "rel_variant_props",
    oracle="""
SELECT event_type,
       count(*) AS n,
       min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
       max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
         AS sum_k
FROM events
WHERE props IS NOT NULL AND event_type IS NOT NULL
GROUP BY event_type ORDER BY event_type
""",
)
def q_rel_variant_props(spark: SparkSession, sf_dir: str):
    ev = table(spark, "events", sf_dir).filter(
        F.col("props").isNotNull() & F.col("event_type").isNotNull()
    )
    k = F.try_variant_get(F.parse_json("props"), "$.k", "long")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.sum("k").alias("sum_k"),
        )
        .orderBy("event_type")
    )


# -- LATERAL VIEW / table-valued explode in SQL (round 4) -------------------
# The SQL-surface form of array explosion (HiveQL LATERAL VIEW, kept in
# Spark SQL): per order, explode the words of its priority label and
# count. Trivial data, real surface: the parser/planner path differs from
# the DataFrame explode() API. Oracle: unnest over string_split.
@register(
    "rel_lateral_explode",
    oracle="""
SELECT word, count(*) AS n
FROM (
  SELECT unnest(string_split(o_orderpriority, '-')) AS word
  FROM orders
)
GROUP BY word ORDER BY word
""",
)
def q_rel_lateral_explode(spark: SparkSession, sf_dir: str):
    table(spark, "orders", sf_dir).createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT word, count(*) AS n
        FROM orders
        LATERAL VIEW explode(split(o_orderpriority, '-')) t AS word
        GROUP BY word ORDER BY word
        """
    )


# -- null-safe equality join (round 4) --------------------------------------
# <=> (IS NOT DISTINCT FROM): NULL keys MATCH each other instead of
# dropping -- the semantics dimension joins need when the key is
# optional. Exercised on events.value IS NULL buckets joined to a tiny
# derived dim keyed by nullable value-sign.
@register(
    "rel_null_safe_join",
    oracle="""
WITH ev AS (
  SELECT event_id,
         CASE WHEN value IS NULL THEN NULL
              WHEN value >= 0 THEN 'pos' ELSE 'neg' END AS sign
  FROM events
),
dim AS (
  SELECT * FROM (VALUES ('pos', 1), ('neg', -1), (NULL, 0)) AS t(sign, factor)
)
SELECT d.factor, count(e.event_id) AS n
FROM ev e JOIN dim d ON e.sign IS NOT DISTINCT FROM d.sign
GROUP BY d.factor ORDER BY d.factor
""",
)
def q_rel_null_safe_join(spark: SparkSession, sf_dir: str):
    ev = table(spark, "events", sf_dir).select(
        "event_id",
        F.when(F.col("value").isNull(), F.lit(None).cast("string"))
        .when(F.col("value") >= 0, "pos")
        .otherwise("neg")
        .alias("sign"),
    )
    dim = table(spark, "events", sf_dir).sparkSession.createDataFrame(
        [("pos", 1), ("neg", -1), (None, 0)], "sign string, factor int"
    )
    return (
        ev.join(F.broadcast(dim), ev["sign"].eqNullSafe(dim["sign"]))
        .groupBy("factor")
        .agg(F.count("event_id").alias("n"))
        .orderBy("factor")
    )

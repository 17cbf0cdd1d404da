"""Data-layout diagnostics (round 5): z-order clustering quality and
equi-depth histograms.

Z-ordering is THE write-time lever for 100 TB scan pruning: range-bin
each clustering column by rank (equi-depth, exactly how Delta's OPTIMIZE
ZORDER derives range_partition_id), interleave the bin bits into a
Morton code, and pack rows into files by code prefix. The diagnostic
below builds that layout for orders over (o_custkey, o_orderdate) and
measures what a reader would feel: how many files a single customer's
orders span (point-lookup pruning) and each file's date span (range-scan
pruning), against a md5-hash-bucketed baseline of the same file count.

Determinism: bin assignment uses exact ntile semantics over a total
tie-broken order, bit interleaving is pure integer arithmetic, and the
hash baseline derives from md5 hex — all bit-identical across engines.
Both ntiles are computed with the broadcast edge-binning operator
(``operators/ranking.py ntile_by_edges``: one narrow range sort derives
the 63 boundary tuples, then the fact is binned by a shuffle-free
broadcast comparison), so no single-partition WindowExec ever touches
the fact — the same boundary-derivation move Delta's OPTIMIZE ZORDER
uses (range_partition_id from sampled bounds), but exact.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from electricity_forecast_pipeline_airflow_k8s_spark.queries import register, table

_BITS = 6  # 64 range bins per dimension -> 12-bit Morton code
_FILE_SHIFT = 4  # file id = code >> 4 -> 256 "files"


def _interleave(x: str, y: str) -> str:
    """SQL fragment interleaving the low _BITS bits of x (even positions)
    and y (odd positions) — identical syntax in Spark SQL and DuckDB."""
    terms = []
    for i in range(_BITS):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


_ZORDER_ORACLE = f"""
WITH o AS (
  SELECT o_orderkey, o_custkey, o_orderdate,
         ntile(64) OVER (ORDER BY o_custkey, o_orderkey) - 1 AS xb,
         ntile(64) OVER (ORDER BY o_orderdate, o_orderkey) - 1 AS yb,
         datediff('day', DATE '1992-01-01', o_orderdate::TIMESTAMP) AS dd
  FROM orders
),
coded AS (
  SELECT o_orderkey, o_custkey, dd,
         ({_interleave('xb', 'yb')}) >> {_FILE_SHIFT} AS zfile,
         CAST((strpos('0123456789abcdef',
                      substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 1)) - 1) * 16
              + (strpos('0123456789abcdef',
                        substr(md5(CAST(o_orderkey AS VARCHAR)), 2, 1)) - 1)
              AS BIGINT) AS hfile
  FROM o
),
layouts AS (
  SELECT 'zorder' AS layout, zfile AS file_id, o_custkey, dd FROM coded
  UNION ALL
  SELECT 'hash' AS layout, hfile AS file_id, o_custkey, dd FROM coded
),
per_file AS (
  SELECT layout, file_id, count(*) AS n_rows,
         max(dd) - min(dd) AS span_days
  FROM layouts GROUP BY 1, 2
),
cust_files AS (
  SELECT layout, o_custkey, count(DISTINCT file_id) AS nf
  FROM layouts GROUP BY 1, 2
)
SELECT p.layout,
       count(*) AS n_files,
       max(p.n_rows) AS max_file_rows,
       floor(avg(p.span_days) * 10000 + 0.5) / 10000 AS avg_file_span_days,
       (SELECT floor(avg(nf) * 10000 + 0.5) / 10000
        FROM cust_files c WHERE c.layout = p.layout) AS avg_files_per_cust
FROM per_file p
GROUP BY 1
ORDER BY 1
"""


@register("layout_zorder_locality", oracle=_ZORDER_ORACLE)
def q_layout_zorder_locality(spark: SparkSession, sf_dir: str):
    from electricity_forecast_pipeline_airflow_k8s_spark.operators.ranking import (
        ntile_by_edges,
    )

    o = table(spark, "orders", sf_dir)
    base = o.select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        F.datediff(F.col("o_orderdate"), F.lit("1992-01-01").cast("date")).alias(
            "dd"
        ),
    )
    # two narrow boundary-derivation sorts (key columns only) + broadcast
    # edge binning on the fact -- no Window, no full-frame rank pass
    binned = ntile_by_edges(base, ["o_custkey", "o_orderkey"], k=64, tile_col="xb1")
    binned = ntile_by_edges(
        binned, ["o_orderdate", "o_orderkey"], k=64, tile_col="yb1"
    )
    coded = binned.select(
        "o_orderkey",
        "o_custkey",
        "dd",
        (F.col("xb1") - 1).alias("xb"),
        (F.col("yb1") - 1).alias("yb"),
    ).select(
        "o_orderkey",
        "o_custkey",
        "dd",
        F.expr(f"({_interleave('xb', 'yb')}) >> {_FILE_SHIFT}").alias("zfile"),
        F.conv(F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 2), 16, 10)
        .cast("long")
        .alias("hfile"),
    )
    layouts = coded.select(
        F.lit("zorder").alias("layout"),
        F.col("zfile").alias("file_id"),
        "o_custkey",
        "dd",
    ).unionAll(
        coded.select(
            F.lit("hash").alias("layout"),
            F.col("hfile").alias("file_id"),
            "o_custkey",
            "dd",
        )
    )
    per_file = layouts.groupBy("layout", "file_id").agg(
        F.count(F.lit(1)).alias("n_rows"),
        (F.max("dd") - F.min("dd")).alias("span_days"),
    )
    file_stats = per_file.groupBy("layout").agg(
        F.count(F.lit(1)).alias("n_files"),
        F.max("n_rows").alias("max_file_rows"),
        (F.floor(F.avg("span_days") * 10000 + 0.5) / 10000).alias(
            "avg_file_span_days"
        ),
    )
    cust_stats = (
        layouts.groupBy("layout", "o_custkey")
        .agg(F.count_distinct("file_id").alias("nf"))
        .groupBy("layout")
        .agg(
            (F.floor(F.avg("nf") * 10000 + 0.5) / 10000).alias(
                "avg_files_per_cust"
            )
        )
    )
    return file_stats.join(cust_stats, "layout").orderBy("layout")


# -- equi-depth (decile) histogram -------------------------------------------
# The other histogram family: ts_value_histogram is equi-WIDTH; this is
# equi-DEPTH via ntile over a total tie-broken order — the shape optimizers
# use for selectivity estimation and the sanity check for skewed money
# columns (equal counts, widening bounds). Exact same ntile semantics in
# both engines given the deterministic (price, key) order; computed via
# broadcast edge binning so the fact never funnels through one task.
@register(
    "rel_equidepth_histogram",
    oracle="""
WITH d AS (
  SELECT o_totalprice,
         ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS decile
  FROM orders
)
SELECT decile,
       count(*) AS n_rows,
       floor(min(o_totalprice) * 100 + 0.5) / 100 AS lo_price,
       floor(max(o_totalprice) * 100 + 0.5) / 100 AS hi_price
FROM d GROUP BY 1 ORDER BY 1
""",
)
def q_rel_equidepth_histogram(spark: SparkSession, sf_dir: str):
    from electricity_forecast_pipeline_airflow_k8s_spark.operators.ranking import (
        ntile_by_edges,
    )

    o = table(spark, "orders", sf_dir)
    binned = ntile_by_edges(
        o.select("o_totalprice", "o_orderkey"),
        ["o_totalprice", "o_orderkey"],
        k=10,
        tile_col="decile",
    )
    return (
        binned.groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            (F.floor(F.min("o_totalprice") * 100 + 0.5) / 100).alias("lo_price"),
            (F.floor(F.max("o_totalprice") * 100 + 0.5) / 100).alias("hi_price"),
        )
        .orderBy("decile")
    )

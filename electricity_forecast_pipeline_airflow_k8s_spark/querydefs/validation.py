"""Validation / profiling queries over the `events` table (the driver's
stand-in for the electricity series: ts~period, event_type~respondent,
value~value). Each maps one or more SURVEY §2 inventory rows."""

from __future__ import annotations

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from electricity_forecast_pipeline_airflow_k8s_spark.functions.stats import (
    exact_mean,
    portable_round,
)
from electricity_forecast_pipeline_airflow_k8s_spark.operators.profile import (
    profile_grid_oracle_sql,
    profile_oracle_sql,
    quality_profile,
    quality_profile_scale,
)
from electricity_forecast_pipeline_airflow_k8s_spark.queries import register, table

# events.ts is TIMESTAMP_NS in the parquet; truncate to microseconds in the
# oracle exactly as the Spark loader does (sources/tables.py).
EVENTS_SRC = "(SELECT event_id, ts::TIMESTAMP AS ts, user_id, event_type, value, props FROM events)"


# -- flagship: the whole quality pass in one statement (SURVEY §7.1) --------
@register("quality_profile", oracle=profile_oracle_sql(table=EVENTS_SRC))
def q_quality_profile(spark: SparkSession, sf_dir: str):
    ev = table(spark, "events", sf_dir)
    return quality_profile(ev, group_col="event_type", ts_col="ts", value_col="value")


# -- flagship, scale mode (quality_profile_scale): mergeable groupBy
# stats + broadcast bounds + bucketed gap windows, so parallelism
# follows data volume instead of being capped at the group count by
# whole-partition windows (SCALING.md). This is the mode a 100 TB run
# uses. Round 6: quantiles switched from percentile_approx sketches to
# exact-on-grid histogram quantiles (deterministic, mergeable, bounded
# state per group) -- which makes the WHOLE output DuckDB-replayable, so
# this entry now carries full hash-level driver evidence instead of
# rows-only. The sketch mode stays available via
# quality_profile_scale(quantile_mode="sketch") and keeps its structural
# driver evidence through quality_profile_scale_contract below.
@register(
    "quality_profile_approx",
    oracle=profile_grid_oracle_sql(table=EVENTS_SRC),
)
def q_quality_profile_approx(spark: SparkSession, sf_dir: str):
    ev = table(spark, "events", sf_dir)
    return quality_profile_scale(
        ev, group_col="event_type", ts_col="ts", value_col="value",
        quantile_mode="grid",
    )


# -- oracle-checkable contract for the scale mode: every non-quantile
# column of the two-pass layout (counts, mean/std, dup/gap/seam logic) is
# hash-matched against DuckDB value-for-value; the sketch-derived quantile
# columns -- which no other engine can reproduce -- are asserted to satisfy
# their structural invariants (ordered, consistent bounds), with the oracle
# emitting TRUE literals. A violated invariant or a drifted exact column
# hash-mismatches, so the 100 TB path gets full driver evidence.
@register(
    "quality_profile_scale_contract",
    oracle=f"""
SELECT event_type, n_rows, n_nulls, null_pct, min_ts, max_ts,
       mean_value, std_value, n_dups, n_gaps, max_gap_seconds,
       TRUE AS quantiles_ordered,
       TRUE AS bounds_consistent,
       TRUE AS outliers_bounded
FROM ({profile_oracle_sql(table=EVENTS_SRC)}) ORDER BY event_type
""",
)
def q_quality_profile_scale_contract(spark: SparkSession, sf_dir: str):
    ev = table(spark, "events", sf_dir)
    p = quality_profile_scale(
        ev, group_col="event_type", ts_col="ts", value_col="value"
    )
    t = F.lit(True)
    return p.select(
        "event_type",
        "n_rows",
        "n_nulls",
        "null_pct",
        "min_ts",
        "max_ts",
        "mean_value",
        "std_value",
        "n_dups",
        "n_gaps",
        "max_gap_seconds",
        # coalesce: an all-null-value group has NULL quantiles -> invariants
        # hold vacuously on both sides
        F.coalesce(
            (F.col("q1") <= F.col("median_value"))
            & (F.col("median_value") <= F.col("q3")),
            t,
        ).alias("quantiles_ordered"),
        F.coalesce(
            (F.col("lower_bound") <= F.col("q1"))
            & (F.col("upper_bound") >= F.col("q3")),
            t,
        ).alias("bounds_consistent"),
        (
            (F.col("n_outliers") >= 0) & (F.col("n_outliers") <= F.col("n_rows"))
        ).alias("outliers_bounded"),
    ).orderBy("event_type")


# -- A1/A2/P6: null counts + rate in one agg pass ---------------------------
@register(
    "val_null_counts",
    oracle=f"""
SELECT count(*) AS n_rows,
       CAST(sum(CASE WHEN ts IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_ts,
       CAST(sum(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_group,
       CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_value,
       floor((sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) * 100.0 / count(*)) * 10000 + 0.5) / 10000
         AS null_value_pct
FROM {EVENTS_SRC}
""",
)
def q_val_null_counts(spark: SparkSession, sf_dir: str):
    ev = table(spark, "events", sf_dir)
    return ev.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("ts").isNull(), 1).otherwise(0)).alias("null_ts"),
        F.sum(F.when(F.col("event_type").isNull(), 1).otherwise(0)).alias("null_group"),
        F.sum(F.when(F.col("value").isNull(), 1).otherwise(0)).alias("null_value"),
        portable_round(
            F.sum(F.when(F.col("value").isNull(), 1).otherwise(0)) * 100.0
            / F.count(F.lit(1)),
            4,
        ).alias("null_value_pct"),
    )


# -- P5/P7: domain + non-negativity predicates (`core/data_validation.py:50,57`)
@register(
    "val_domain_violations",
    oracle="""
SELECT CAST(sum(CASE WHEN event_type NOT IN ('click','view','purchase','signup','error')
                THEN 1 ELSE 0 END) AS BIGINT) AS bad_domain,
       CAST(sum(CASE WHEN value < 0 THEN 1 ELSE 0 END) AS BIGINT) AS negative_values
FROM events
""",
)
def q_val_domain(spark: SparkSession, sf_dir: str):
    ev = table(spark, "events", sf_dir)
    domain = ("click", "view", "purchase", "signup", "error")
    return ev.agg(
        F.sum(F.when(~F.col("event_type").isin(*domain), 1).otherwise(0)).alias(
            "bad_domain"
        ),
        F.sum(F.when(F.col("value") < 0, 1).otherwise(0)).alias("negative_values"),
    )


# -- P8/J2: dynamic q99*3 extreme gate (`core/data_validation.py:61-62`) ----
# Two-pass plan: exact q99 as a 1-row aggregate, broadcast back as a scalar.
@register(
    "val_extreme_gate",
    oracle="""
WITH thr AS (SELECT quantile_cont(value, 0.99) AS q99 FROM events)
SELECT floor(max(thr.q99) * 10000 + 0.5) / 10000 AS q99,
       CAST(sum(CASE WHEN e.value >= 3.0 * thr.q99 THEN 1 ELSE 0 END) AS BIGINT)
         AS extreme_values
FROM events e CROSS JOIN thr
""",
)
def q_val_extreme(spark: SparkSession, sf_dir: str):
    ev = table(spark, "events", sf_dir)
    thr = ev.agg(F.percentile("value", F.lit(0.99)).alias("q99"))
    return ev.crossJoin(F.broadcast(thr)).agg(
        portable_round(F.max("q99"), 4).alias("q99"),
        F.sum(F.when(F.col("value") >= 3.0 * F.col("q99"), 1).otherwise(0)).alias(
            "extreme_values"
        ),
    )


# -- A13: duplicate (group, ts) count (`core/data_validation.py:149-154`) ---
@register(
    "val_dup_count",
    oracle=f"""
SELECT count(*) - count(DISTINCT (event_type, ts)) AS duplicate_timestamps
FROM {EVENTS_SRC}
""",
)
def q_val_dup_count(spark: SparkSession, sf_dir: str):
    ev = table(spark, "events", sf_dir)
    return ev.agg(
        (
            F.count(F.lit(1)) - F.count_distinct(F.struct("event_type", "ts"))
        ).alias("duplicate_timestamps")
    )


# -- A6/A7: global moment stats + exact median ------------------------------
@register(
    "val_value_stats",
    oracle="""
SELECT floor((CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(value)) * 10000 + 0.5) / 10000
         AS mean_value,
       floor(stddev_samp(value) * 10000 + 0.5) / 10000 AS std_value,
       floor(min(value) * 10000 + 0.5) / 10000 AS min_value,
       floor(max(value) * 10000 + 0.5) / 10000 AS max_value,
       floor(quantile_cont(value, 0.5) * 10000 + 0.5) / 10000 AS median_value
FROM events
""",
)
def q_val_value_stats(spark: SparkSession, sf_dir: str):
    ev = table(spark, "events", sf_dir)
    from electricity_forecast_pipeline_airflow_k8s_spark.functions.stats import exact_mean

    return ev.agg(
        portable_round(exact_mean("value"), 4).alias("mean_value"),
        portable_round(F.stddev_samp("value"), 4).alias("std_value"),
        portable_round(F.min("value"), 4).alias("min_value"),
        portable_round(F.max("value"), 4).alias("max_value"),
        portable_round(F.percentile("value", F.lit(0.5)), 4).alias("median_value"),
    )


# -- A15: describe/summary (count/mean/std/min/quartiles/max) ---------------
@register(
    "val_summary",
    oracle="""
SELECT count(value) AS n,
       floor((CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(value)) * 10000 + 0.5) / 10000
         AS mean,
       floor(stddev_samp(value) * 10000 + 0.5) / 10000 AS std,
       floor(min(value) * 10000 + 0.5) / 10000 AS min,
       floor(quantile_cont(value, 0.25) * 10000 + 0.5) / 10000 AS q1,
       floor(quantile_cont(value, 0.5) * 10000 + 0.5) / 10000 AS median,
       floor(quantile_cont(value, 0.75) * 10000 + 0.5) / 10000 AS q3,
       floor(max(value) * 10000 + 0.5) / 10000 AS max
FROM events
""",
)
def q_val_summary(spark: SparkSession, sf_dir: str):
    ev = table(spark, "events", sf_dir)
    from electricity_forecast_pipeline_airflow_k8s_spark.functions.stats import exact_mean

    v = F.col("value")
    return ev.agg(
        F.count(v).alias("n"),
        portable_round(exact_mean(v), 4).alias("mean"),
        portable_round(F.stddev_samp(v), 4).alias("std"),
        portable_round(F.min(v), 4).alias("min"),
        portable_round(F.percentile(v, F.lit(0.25)), 4).alias("q1"),
        portable_round(F.percentile(v, F.lit(0.5)), 4).alias("median"),
        portable_round(F.percentile(v, F.lit(0.75)), 4).alias("q3"),
        portable_round(F.max(v), 4).alias("max"),
    )


# -- A9: per-group stats -- one hash-agg, no per-region loops ---------------
@register(
    "val_grouped_stats",
    oracle="""
SELECT event_type,
       count(*) AS records,
       floor((CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(value)) * 10000 + 0.5) / 10000
         AS mean,
       floor(min(value) * 10000 + 0.5) / 10000 AS min,
       floor(max(value) * 10000 + 0.5) / 10000 AS max
FROM events GROUP BY event_type ORDER BY event_type
""",
)
def q_val_grouped_stats(spark: SparkSession, sf_dir: str):
    from electricity_forecast_pipeline_airflow_k8s_spark.functions.stats import exact_mean

    ev = table(spark, "events", sf_dir)
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("records"),
            portable_round(exact_mean("value"), 4).alias("mean"),
            portable_round(F.min("value"), 4).alias("min"),
            portable_round(F.max("value"), 4).alias("max"),
        )
        .orderBy("event_type")
    )


# -- A12/O-TOPK1: argmax group by count (`core/kubeflow_pipeline.py:97-99`) -
@register(
    "val_top_group",
    oracle="""
SELECT event_type, count(*) AS n
FROM events GROUP BY event_type
ORDER BY n DESC, event_type LIMIT 1
""",
)
def q_val_top_group(spark: SparkSession, sf_dir: str):
    ev = table(spark, "events", sf_dir)
    return (
        ev.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "event_type")
        .limit(1)
    )


# -- A3/A4: distinct groups, sorted (`core/data_validation.py:160-161`) -----
@register(
    "val_distinct_groups",
    oracle="SELECT DISTINCT event_type FROM events ORDER BY event_type",
)
def q_val_distinct_groups(spark: SparkSession, sf_dir: str):
    ev = table(spark, "events", sf_dir)
    return ev.select("event_type").distinct().orderBy("event_type")


# -- W1: per-group gap stats via lag window ---------------------------------
@register(
    "val_gap_stats",
    oracle=f"""
SELECT event_type,
       CAST(sum(CASE WHEN gap_us > 5400000000 THEN 1 ELSE 0 END) AS BIGINT) AS n_gaps,
       floor((max(gap_us) / 1000000.0) * 10000 + 0.5) / 10000 AS max_gap_seconds,
       floor((avg(gap_us) / 1000000.0) * 10000 + 0.5) / 10000 AS avg_gap_seconds
FROM (
  SELECT event_type,
         epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY event_type ORDER BY ts))
           AS gap_us
  FROM {EVENTS_SRC}
)
GROUP BY event_type ORDER BY event_type
""",
)
def q_val_gap_stats(spark: SparkSession, sf_dir: str):
    ev = table(spark, "events", sf_dir)
    w = Window.partitionBy("event_type").orderBy("ts")
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    return (
        ev.select("event_type", gap_us.alias("gap_us"))
        .groupBy("event_type")
        .agg(
            F.sum(F.when(F.col("gap_us") > 5_400_000_000, 1).otherwise(0)).alias("n_gaps"),
            portable_round(F.max("gap_us") / 1_000_000.0, 4).alias("max_gap_seconds"),
            portable_round(F.avg("gap_us") / 1_000_000.0, 4).alias("avg_gap_seconds"),
        )
        .orderBy("event_type")
    )


# -- P4/J1/A10: flagged outlier rows (bounds broadcast-joined back) ---------
@register(
    "val_outlier_rows",
    oracle="""
WITH bounds AS (
  SELECT event_type,
         quantile_cont(value, 0.25) - 3.0 * (quantile_cont(value, 0.75)
           - quantile_cont(value, 0.25)) AS lower,
         quantile_cont(value, 0.75) + 3.0 * (quantile_cont(value, 0.75)
           - quantile_cont(value, 0.25)) AS upper
  FROM events GROUP BY event_type
)
SELECT e.event_id, e.event_type, floor(e.value * 10000 + 0.5) / 10000 AS value
FROM events e JOIN bounds b ON e.event_type IS NOT DISTINCT FROM b.event_type
WHERE e.value < b.lower OR e.value > b.upper
ORDER BY e.event_id
""",
)
def q_val_outlier_rows(spark: SparkSession, sf_dir: str):
    # single-scan form: per-group quantiles as a whole-partition window,
    # outlier predicate evaluated inline (no bounds join-back)
    ev = table(spark, "events", sf_dir)
    v = F.col("value")
    wp = Window.partitionBy("event_type")
    qs = F.percentile(v, F.array(F.lit(0.25), F.lit(0.75))).over(wp)
    enriched = ev.select("event_id", "event_type", v.alias("value"), qs.alias("_qs"))
    q1, q3 = F.element_at("_qs", 1), F.element_at("_qs", 2)
    lower, upper = q1 - 3.0 * (q3 - q1), q3 + 3.0 * (q3 - q1)
    return (
        enriched.filter((v < lower) | (v > upper))
        .select("event_id", "event_type", portable_round(v, 4).alias("value"))
        .orderBy("event_id")
    )


# -- W2: duplicate-flag rows via window count -------------------------------
@register(
    "val_dup_rows",
    oracle=f"""
SELECT event_id, event_type, ts
FROM (
  SELECT event_id, event_type, ts,
         count(*) OVER (PARTITION BY event_type, ts) AS c
  FROM {EVENTS_SRC}
) WHERE c > 1 ORDER BY event_id
""",
)
def q_val_dup_rows(spark: SparkSession, sf_dir: str):
    ev = table(spark, "events", sf_dir)
    w = Window.partitionBy("event_type", "ts")
    return (
        ev.withColumn("c", F.count(F.lit(1)).over(w))
        .filter(F.col("c") > 1)
        .select("event_id", "event_type", "ts")
        .orderBy("event_id")
    )


# -- MAD robust outliers (round 4) ------------------------------------------
# Median-absolute-deviation outlier gate: robust where the IQR/moment
# gates (quality_profile, val_extreme_gate) are themselves skewed by the
# outliers they hunt. anomaly iff |v - median| > 3 * 1.4826 * MAD (the
# normal-consistency constant). Exact interpolated medians both engines;
# the oracle derives MAD from first principles (median of absolute
# deviations via CTEs) rather than a built-in, so the two derivations are
# independent.
#
# Scale: two grouped exact-percentile passes with a broadcast join of the
# tiny per-group medians between them -- the same quarantine as the exact
# quality_profile (oracle-parity surface; the sketch path is
# quality_profile_scale/approx).
@register(
    "val_mad_outliers",
    oracle=f"""
WITH ev AS (SELECT event_type, value FROM {EVENTS_SRC} WHERE value IS NOT NULL),
med AS (
  SELECT event_type, quantile_cont(value, 0.5) AS med
  FROM ev GROUP BY event_type
),
dev AS (
  SELECT e.event_type, e.value, m.med, abs(e.value - m.med) AS ad
  FROM ev e JOIN med m USING (event_type)
),
mads AS (
  SELECT event_type, quantile_cont(ad, 0.5) AS mad FROM dev GROUP BY event_type
)
SELECT d.event_type,
       CAST(count(*) AS BIGINT) AS n,
       floor(max(d.med) * 10000 + 0.5) / 10000 AS median_value,
       floor(max(s.mad) * 10000 + 0.5) / 10000 AS mad,
       CAST(sum(CASE WHEN d.ad > 3 * 1.4826 * s.mad THEN 1 ELSE 0 END) AS BIGINT)
         AS n_anomalies
FROM dev d JOIN mads s USING (event_type)
GROUP BY d.event_type ORDER BY d.event_type
""",
)
def q_val_mad_outliers(spark: SparkSession, sf_dir: str):
    ev = (
        table(spark, "events", sf_dir)
        .filter(F.col("value").isNotNull())
        .select("event_type", "value")
    )
    med = ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.5)).alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type").withColumn(
        "ad", F.abs(F.col("value") - F.col("med"))
    )
    mads = dev.groupBy("event_type").agg(
        F.percentile("ad", F.lit(0.5)).alias("mad")
    )
    return (
        dev.join(F.broadcast(mads), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.floor(F.max("med") * 10000 + 0.5) / 10000).alias("median_value"),
            (F.floor(F.max("mad") * 10000 + 0.5) / 10000).alias("mad"),
            F.sum(
                F.when(F.col("ad") > 3 * 1.4826 * F.col("mad"), 1).otherwise(0)
            ).alias("n_anomalies"),
        )
        .orderBy("event_type")
    )


# -- incremental aggregate maintenance (round 4) ----------------------------
# Three disjoint ingest batches -> per-batch mergeable partials -> one
# state merge -> finalize. The oracle recomputes from scratch over ALL
# rows: merge(state, batch) == full recompute, proved on values. At scale
# only the newest batch is scanned; the merge is state-sized.
@register(
    "inc_agg_merge",
    oracle=f"""
SELECT event_type,
       count(*) AS n_rows,
       count(value) AS n_vals,
       floor(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(value)
             * 10000 + 0.5) / 10000 AS mean_v,
       min(value) AS min_v,
       max(value) AS max_v
FROM {EVENTS_SRC}
GROUP BY event_type ORDER BY event_type
""",
)
def q_inc_agg_merge(spark: SparkSession, sf_dir: str):
    from electricity_forecast_pipeline_airflow_k8s_spark.operators.incremental import (
        finalize_stats,
        merge_partial_stats,
        partial_stats,
    )

    ev = table(spark, "events", sf_dir)
    cuts = ("2024-01-10", "2024-01-20")
    b1 = ev.filter(F.col("ts") < cuts[0])
    b2 = ev.filter((F.col("ts") >= cuts[0]) & (F.col("ts") < cuts[1]))
    # null-ts rows must land in exactly one batch or the union drops them
    b3 = ev.filter((F.col("ts") >= cuts[1]) | F.col("ts").isNull())
    state = merge_partial_stats(
        partial_stats(b1, "event_type", "value"),
        partial_stats(b2, "event_type", "value"),
        partial_stats(b3, "event_type", "value"),
    )
    return finalize_stats(state).orderBy("event_type")


# -- order-independent checksum reconciliation (round 4) --------------------
# "Did the 100 TB copy lose rows?" -- per-group row count + content
# checksum that any engine can recompute: md5 of the key columns folded
# to a 60-bit integer, decimal-summed (order/partitioning independent,
# duplicate-sensitive -- unlike XOR folding, which cancels row pairs),
# reduced mod 1e18 to fit BIGINT. String/integer columns only: float
# formatting differs across engines.
@register(
    "val_checksum_reconciliation",
    oracle=f"""
SELECT event_type,
       count(*) AS n_rows,
       CAST(sum(CAST(CAST('0x' || substr(
              md5(concat_ws('|', CAST(event_id AS VARCHAR),
                                 CAST(user_id AS VARCHAR))), 1, 15)
            AS UBIGINT) AS DECIMAL(38,0))) % 1000000000000000000 AS BIGINT)
         AS checksum
FROM {EVENTS_SRC}
WHERE event_type IS NOT NULL
GROUP BY event_type ORDER BY event_type
""",
)
def q_val_checksum_reconciliation(spark: SparkSession, sf_dir: str):
    ev = table(spark, "events", sf_dir).filter(F.col("event_type").isNotNull())
    h60 = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    "|",
                    F.col("event_id").cast("string"),
                    F.col("user_id").cast("string"),
                )
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("decimal(38,0)")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.pmod(F.sum(h60), F.lit(10**18).cast("decimal(38,0)"))
            .cast("long")
            .alias("checksum"),
        )
        .orderBy("event_type")
    )


# -- referential integrity report (round 5) ----------------------------------
# One row per FK edge of the star schema with parent/child row counts and
# orphan-child counts — the cross-table contract check the reference
# applies per-frame (core/data_validation.py) lifted to the whole schema.
# Spark: a LEFT ANTI join per edge, unioned (each anti-join broadcasts
# the parent keys when small, AQE decides); oracle: NOT IN per edge.
_FK_EDGES = (
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"),
)


def _ref_integrity_oracle() -> str:
    parts = []
    for child, ck, parent, pk in _FK_EDGES:
        parts.append(f"""
  SELECT '{child}.{ck}->{parent}.{pk}' AS fk_edge,
         (SELECT count(*) FROM {child}) AS n_child_rows,
         (SELECT count(*) FROM {parent}) AS n_parent_rows,
         (SELECT count(*) FROM {child}
          WHERE {ck} NOT IN (SELECT {pk} FROM {parent})) AS n_orphans""")
    return "SELECT * FROM (" + "\n  UNION ALL\n".join(parts) + ") ORDER BY fk_edge"


@register("val_referential_integrity", oracle=_ref_integrity_oracle())
def q_val_referential_integrity(spark: SparkSession, sf_dir: str):
    from functools import reduce

    reports = []
    for child, ck, parent, pk in _FK_EDGES:
        c = table(spark, child, sf_dir)
        p = table(spark, parent, sf_dir)
        orphans = c.join(
            p.select(F.col(pk).alias(ck)), ck, "left_anti"
        ).agg(F.count(F.lit(1)).alias("n_orphans"))
        counts = (
            c.agg(F.count(F.lit(1)).alias("n_child_rows"))
            .crossJoin(p.agg(F.count(F.lit(1)).alias("n_parent_rows")))
            .crossJoin(orphans)
            .select(
                F.lit(f"{child}.{ck}->{parent}.{pk}").alias("fk_edge"),
                "n_child_rows",
                "n_parent_rows",
                "n_orphans",
            )
        )
        reports.append(counts)
    return reduce(lambda a, b: a.unionByName(b), reports).orderBy("fk_edge")


# -- primary-key uniqueness report (round 5) ---------------------------------
# One row per table: row count vs distinct-PK count and the uniqueness
# verdict. Spark: per-table aggregates unioned; oracle: the same report
# derived per table with count(DISTINCT).
_PK_COLS = (
    ("region", "r_regionkey"),
    ("nation", "n_nationkey"),
    ("customer", "c_custkey"),
    ("supplier", "s_suppkey"),
    ("part", "p_partkey"),
    ("orders", "o_orderkey"),
    ("events", "event_id"),
    ("documents", "doc_id"),
    ("embeddings", "vec_id"),
)


def _pk_unique_oracle() -> str:
    parts = [
        f"""
  SELECT '{t}' AS table_name, count(*) AS n_rows,
         count(DISTINCT {pk}) AS n_distinct_pk,
         count(*) = count(DISTINCT {pk}) AS pk_unique
  FROM {t}"""
        for t, pk in _PK_COLS
    ]
    return "SELECT * FROM (" + "\n  UNION ALL\n".join(parts) + ") ORDER BY table_name"


@register("val_pk_uniqueness", oracle=_pk_unique_oracle())
def q_val_pk_uniqueness(spark: SparkSession, sf_dir: str):
    from functools import reduce

    reports = []
    for t, pk in _PK_COLS:
        df = table(spark, t, sf_dir)
        reports.append(
            df.agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.count_distinct(F.col(pk)).alias("n_distinct_pk"),
            ).select(
                F.lit(t).alias("table_name"),
                "n_rows",
                "n_distinct_pk",
                (F.col("n_rows") == F.col("n_distinct_pk")).alias("pk_unique"),
            )
        )
    return reduce(lambda a, b: a.unionByName(b), reports).orderBy("table_name")


# -- multi-detector outlier consensus (round 5) ------------------------------
# Three detectors over the same grouped pass — IQR fences (exact
# quantiles), z-score vs group moments, MAD-median distance — and the
# consensus verdict (flagged by >= 2 of 3). Single-detector counts ship
# alongside so threshold drift in any one detector is visible. One scan,
# one shuffle on the group key (all thresholds ride a shared window);
# exact percentile/median keep both engines bit-identical, z uses
# decimal-derived moments.
@register(
    "val_outlier_consensus",
    oracle=f"""
WITH base AS (
  SELECT event_type, value FROM {EVENTS_SRC} WHERE value IS NOT NULL
),
thresholds AS (
  SELECT event_type,
         quantile_cont(value, 0.25) AS q1,
         quantile_cont(value, 0.75) AS q3,
         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS m,
         CAST(sum(CAST(value AS DECIMAL(18,2))
                  * CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS ssq,
         count(*) AS n,
         median(value) AS med
  FROM base GROUP BY 1
),
mads AS (
  SELECT b.event_type, median(abs(b.value - t.med)) AS mad
  FROM base b JOIN thresholds t USING (event_type)
  GROUP BY 1
),
flagged AS (
  SELECT b.event_type,
         CASE WHEN b.value < t.q1 - 1.5 * (t.q3 - t.q1)
                OR b.value > t.q3 + 1.5 * (t.q3 - t.q1) THEN 1 ELSE 0 END
           AS f_iqr,
         CASE WHEN sqrt(greatest((t.ssq - t.n * t.m * t.m) / (t.n - 1), 0.0)) > 0
               AND abs(b.value - t.m)
                   / sqrt(greatest((t.ssq - t.n * t.m * t.m) / (t.n - 1), 0.0)) > 3
              THEN 1 ELSE 0 END AS f_z,
         CASE WHEN m2.mad > 0
               AND abs(b.value - t.med) / (1.4826 * m2.mad) > 3.5
              THEN 1 ELSE 0 END AS f_mad
  FROM base b
  JOIN thresholds t USING (event_type)
  JOIN mads m2 USING (event_type)
)
SELECT event_type,
       CAST(sum(f_iqr) AS BIGINT) AS n_iqr,
       CAST(sum(f_z) AS BIGINT) AS n_z,
       CAST(sum(f_mad) AS BIGINT) AS n_mad,
       CAST(sum(CASE WHEN f_iqr + f_z + f_mad >= 2 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_consensus
FROM flagged
GROUP BY 1 ORDER BY 1
""",
)
def q_val_outlier_consensus(spark: SparkSession, sf_dir: str):
    from pyspark.sql import Window

    ev = (
        table(spark, "events", sf_dir)
        .filter(F.col("value").isNotNull())
        .select("event_type", "value")
    )
    w = Window.partitionBy("event_type")
    dec = F.col("value").cast("decimal(18,2)")
    enriched = ev.select(
        "event_type",
        "value",
        F.expr("percentile(value, 0.25)").over(w).alias("q1"),
        F.expr("percentile(value, 0.75)").over(w).alias("q3"),
        (F.sum(dec).over(w).cast("double") / F.count(F.lit(1)).over(w)).alias(
            "m"
        ),
        F.sum(dec * dec).over(w).cast("double").alias("ssq"),
        F.count(F.lit(1)).over(w).alias("n"),
        F.expr("percentile(value, 0.5)").over(w).alias("med"),
    )
    mad = (
        enriched.select(
            "event_type",
            F.abs(F.col("value") - F.col("med")).alias("adev"),
        )
        .groupBy("event_type")
        .agg(F.expr("percentile(adev, 0.5)").alias("mad"))
    )
    j = enriched.join(F.broadcast(mad), "event_type")
    iqr = F.col("q3") - F.col("q1")
    sd = F.sqrt(
        F.greatest(
            (F.col("ssq") - F.col("n") * F.col("m") * F.col("m"))
            / (F.col("n") - 1),
            F.lit(0.0),
        )
    )
    f_iqr = (
        (F.col("value") < F.col("q1") - 1.5 * iqr)
        | (F.col("value") > F.col("q3") + 1.5 * iqr)
    ).cast("int")
    f_z = ((sd > 0) & (F.abs(F.col("value") - F.col("m")) / sd > 3)).cast("int")
    f_mad = (
        (F.col("mad") > 0)
        & (F.abs(F.col("value") - F.col("med")) / (1.4826 * F.col("mad")) > 3.5)
    ).cast("int")
    return (
        j.select(
            "event_type",
            f_iqr.alias("f_iqr"),
            f_z.alias("f_z"),
            f_mad.alias("f_mad"),
        )
        .groupBy("event_type")
        .agg(
            F.sum("f_iqr").cast("long").alias("n_iqr"),
            F.sum("f_z").cast("long").alias("n_z"),
            F.sum("f_mad").cast("long").alias("n_mad"),
            F.sum(
                (
                    (F.col("f_iqr") + F.col("f_z") + F.col("f_mad")) >= 2
                ).cast("int")
            )
            .cast("long")
            .alias("n_consensus"),
        )
        .orderBy("event_type")
    )


# -- categorical drift: chi-squared homogeneity test -------------------------
# The third standard drift test alongside ts_psi_drift (binned numeric)
# and ts_ks_drift (continuous): do event-type FREQUENCIES differ between
# the first and second half of the month-long window? Exact integer cell counts;
# expected counts and per-type chi2 contributions are the same mirrored
# double expressions on both engines ((rowtot * 1.0 * coltot) / N), so
# values hash-match without any tolerance. One scan, one hash agg.
@register(
    "val_drift_chi2",
    oracle=f"""
WITH cells AS (
  SELECT event_type,
         sum(CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END) AS n1,
         sum(CASE WHEN ts >= TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END) AS n2
  FROM {EVENTS_SRC} WHERE ts IS NOT NULL
  GROUP BY 1
),
tot AS (SELECT sum(n1) AS t1, sum(n2) AS t2, sum(n1) + sum(n2) AS n FROM cells)
SELECT c.event_type,
       CAST(c.n1 AS BIGINT) AS n_first_half,
       CAST(c.n2 AS BIGINT) AS n_second_half,
       floor((
         pow(c.n1 - ((c.n1 + c.n2) * 1.0 * t.t1) / t.n, 2)
           / (((c.n1 + c.n2) * 1.0 * t.t1) / t.n)
         + pow(c.n2 - ((c.n1 + c.n2) * 1.0 * t.t2) / t.n, 2)
           / (((c.n1 + c.n2) * 1.0 * t.t2) / t.n)
       ) * 10000 + 0.5) / 10000 AS chi2_contribution
FROM cells c CROSS JOIN tot t
ORDER BY c.event_type
""",
)
def q_val_drift_chi2(spark: SparkSession, sf_dir: str):
    split = F.lit("2024-01-16").cast("timestamp")
    ev = table(spark, "events", sf_dir).filter(F.col("ts").isNotNull())
    cells = ev.groupBy("event_type").agg(
        F.sum(F.when(F.col("ts") < split, 1).otherwise(0)).alias("n1"),
        F.sum(F.when(F.col("ts") >= split, 1).otherwise(0)).alias("n2"),
    )
    tot = cells.agg(
        F.sum("n1").alias("t1"),
        F.sum("n2").alias("t2"),
        (F.sum("n1") + F.sum("n2")).alias("n"),
    )
    e1 = ((F.col("n1") + F.col("n2")) * 1.0 * F.col("t1")) / F.col("n")
    e2 = ((F.col("n1") + F.col("n2")) * 1.0 * F.col("t2")) / F.col("n")
    contrib = F.pow(F.col("n1") - e1, 2) / e1 + F.pow(F.col("n2") - e2, 2) / e2
    return (
        cells.crossJoin(tot)
        .select(
            "event_type",
            F.col("n1").cast("long").alias("n_first_half"),
            F.col("n2").cast("long").alias("n_second_half"),
            (F.floor(contrib * 10000 + 0.5) / 10000).alias("chi2_contribution"),
        )
        .orderBy("event_type")
    )


# -- monotonicity constraint check -------------------------------------------
# The ordering-rule family member the suite lacked: within each user's
# time-ordered event stream, event ids should be non-decreasing (they
# are assigned globally by arrival). Reports per-user-aggregated
# violation counts rolled up per event_type — the "sequence sanity"
# check a CDC/ingest pipeline runs to catch reordered or replayed
# batches. One window pass (lag over the per-user order), one agg.
@register(
    "val_monotonic_event_ids",
    oracle=f"""
WITH seq AS (
  SELECT user_id, event_type, event_id,
         lag(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_id
  FROM {EVENTS_SRC}
  WHERE ts IS NOT NULL AND user_id IS NOT NULL
)
SELECT event_type,
       count(*) AS n_pairs,
       CAST(sum(CASE WHEN prev_id > event_id THEN 1 ELSE 0 END) AS BIGINT)
         AS n_violations,
       floor(sum(CASE WHEN prev_id > event_id THEN 1 ELSE 0 END) * 1.0
             / count(*) * 10000 + 0.5) / 10000 AS violation_rate
FROM seq WHERE prev_id IS NOT NULL
GROUP BY 1 ORDER BY 1
""",
)
def q_val_monotonic_event_ids(spark: SparkSession, sf_dir: str):
    ev = (
        table(spark, "events", sf_dir)
        .filter(F.col("ts").isNotNull() & F.col("user_id").isNotNull())
        .select("user_id", "event_type", "event_id", "ts")
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.withColumn("prev_id", F.lag("event_id").over(w)).filter(
        F.col("prev_id").isNotNull()
    )
    viol = F.sum(
        F.when(F.col("prev_id") > F.col("event_id"), 1).otherwise(0)
    )
    return (
        seq.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            viol.alias("n_violations"),
            (
                F.floor(viol * 1.0 / F.count(F.lit(1)) * 10000 + 0.5) / 10000
            ).alias("violation_rate"),
        )
        .orderBy("event_type")
    )


# -- volume anomaly report (MAD on daily counts) ------------------------------
# val_mad_outliers flags anomalous VALUES; this reports anomalous
# VOLUMES: per event_type the robust center/scale of the daily event
# count (median + MAD) and how many days breach the 3 x 1.4826 x MAD
# fence — the ingest-health check that catches dropped or duplicated
# feeds a mean-based rule misses. Per-type summary grain so the result
# pins the robust statistics even when no day breaches (the synthetic
# feed is healthy: n_anomalies 0 is the CORRECT answer, and the
# median/MAD columns keep the comparison non-trivial). Counts are exact
# integers; integer medians interpolate identically on both engines.
@register(
    "val_volume_anomaly_days",
    oracle=f"""
WITH daily AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS d,
         count(*) AS c
  FROM {{EVENTS_SRC}} AS events WHERE ts IS NOT NULL
  GROUP BY 1, 2
),
med AS (
  SELECT event_type, quantile_cont(c, 0.5) AS med_c FROM daily GROUP BY 1
),
mad AS (
  SELECT d.event_type, m.med_c,
         quantile_cont(abs(d.c - m.med_c), 0.5) AS mad_c
  FROM daily d JOIN med m USING (event_type)
  GROUP BY 1, 2
)
SELECT d.event_type,
       count(*) AS n_days,
       min(d.c) AS min_daily,
       max(d.c) AS max_daily,
       floor(m.med_c * 10000 + 0.5) / 10000 AS median_daily,
       floor(m.mad_c * 10000 + 0.5) / 10000 AS mad_daily,
       CAST(sum(CASE WHEN abs(d.c - m.med_c) > 3 * 1.4826 * m.mad_c
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies
FROM daily d JOIN mad m ON m.event_type = d.event_type
GROUP BY 1, m.med_c, m.mad_c
ORDER BY 1
""".format(EVENTS_SRC=EVENTS_SRC),
)
def q_val_volume_anomaly_days(spark: SparkSession, sf_dir: str):
    daily = (
        table(spark, "events", sf_dir)
        .filter(F.col("ts").isNotNull())
        .groupBy(
            "event_type", F.date_trunc("day", "ts").cast("date").alias("d")
        )
        .agg(F.count(F.lit(1)).alias("c"))
    )
    med = daily.groupBy("event_type").agg(F.median("c").alias("med_c"))
    mad = (
        daily.join(med, "event_type")
        .groupBy("event_type", "med_c")
        .agg(F.median(F.abs(F.col("c") - F.col("med_c"))).alias("mad_c"))
    )
    breach = F.abs(F.col("c") - F.col("med_c")) > 3 * 1.4826 * F.col("mad_c")
    return (
        daily.join(mad, "event_type")
        .groupBy("event_type", "med_c", "mad_c")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.min("c").alias("min_daily"),
            F.max("c").alias("max_daily"),
            F.sum(breach.cast("int")).cast("long").alias("n_anomalies"),
        )
        .select(
            "event_type",
            "n_days",
            "min_daily",
            "max_daily",
            (F.floor(F.col("med_c") * 10000 + 0.5) / 10000).alias("median_daily"),
            (F.floor(F.col("mad_c") * 10000 + 0.5) / 10000).alias("mad_daily"),
            "n_anomalies",
        )
        .orderBy("event_type")
    )


# -- snapshot diff (CDC-style version reconciliation) --------------------------
# The lakehouse audit the tombstone/merge family was missing: given two
# versions of a table, classify every key as added / removed / changed /
# unchanged -- the change-data-feed a replication pipeline validates
# against. Versions derive deterministically from the one fixture on
# BOTH engines (A drops event_id % 13 = 3 "later inserts"; B drops
# event_id % 17 = 5 "deletes" and perturbs value where event_id % 7 = 2
# "updates"), so the classification is fully oracle-replayable. Shape:
# ONE full-outer equi-join on the key (AQE-skew-splittable) feeding a
# group-count-sized aggregate; change detection is null-safe so
# null-valued rows compare as unchanged.
_DIFF_ORACLE = f"""
WITH base AS (
  SELECT event_id, event_type, CAST(value AS DOUBLE) AS value
  FROM {EVENTS_SRC}
),
a AS (SELECT * FROM base WHERE event_id % 13 != 3),
b AS (
  SELECT event_id, event_type,
         CASE WHEN event_id % 7 = 2 THEN value * 1.1 ELSE value END AS value
  FROM base WHERE event_id % 17 != 5
),
d AS (
  SELECT coalesce(a.event_type, b.event_type) AS event_type,
         CASE WHEN a.event_id IS NULL THEN 'added'
              WHEN b.event_id IS NULL THEN 'removed'
              WHEN a.value IS NOT DISTINCT FROM b.value THEN 'unchanged'
              ELSE 'changed' END AS kind
  FROM a FULL OUTER JOIN b ON b.event_id = a.event_id
)
SELECT event_type,
       CAST(sum(CASE WHEN kind = 'added' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_added,
       CAST(sum(CASE WHEN kind = 'removed' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_removed,
       CAST(sum(CASE WHEN kind = 'changed' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_changed,
       CAST(sum(CASE WHEN kind = 'unchanged' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_unchanged
FROM d GROUP BY 1 ORDER BY 1
"""


@register("val_snapshot_diff", oracle=_DIFF_ORACLE)
def q_val_snapshot_diff(spark: SparkSession, sf_dir: str):
    base = table(spark, "events", sf_dir).select(
        "event_id", "event_type", F.col("value").cast("double").alias("value")
    )
    a = base.filter(F.col("event_id") % 13 != 3).select(
        F.col("event_id").alias("a_id"),
        F.col("event_type").alias("a_type"),
        F.col("value").alias("a_value"),
    )
    b = base.filter(F.col("event_id") % 17 != 5).select(
        F.col("event_id").alias("b_id"),
        F.col("event_type").alias("b_type"),
        F.when(F.col("event_id") % 7 == 2, F.col("value") * 1.1)
        .otherwise(F.col("value"))
        .alias("b_value"),
    )
    d = a.join(b, a.a_id == b.b_id, "full_outer").select(
        F.coalesce("a_type", "b_type").alias("event_type"),
        F.when(F.col("a_id").isNull(), F.lit("added"))
        .when(F.col("b_id").isNull(), F.lit("removed"))
        .when(F.col("a_value").eqNullSafe(F.col("b_value")), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
        .alias("kind"),
    )
    cnt = lambda k: F.sum(F.when(F.col("kind") == k, 1).otherwise(0)).cast(  # noqa: E731
        "bigint"
    )
    return (
        d.groupBy("event_type")
        .agg(
            cnt("added").alias("n_added"),
            cnt("removed").alias("n_removed"),
            cnt("changed").alias("n_changed"),
            cnt("unchanged").alias("n_unchanged"),
        )
        .orderBy("event_type")
    )

"""Round-10 lanes: incremental maintenance of the sampled triangle count.

The round-10 scale ledger established the DOULION sampled-triangle
estimator (`graph_triangle_estimate`) as the only tractable triangle
surface past sf0.1. A production graph is maintained batch-over-batch,
so the estimator needs the same inc_* contract the rest of the engine
carries: yesterday's sampled edge set + its triangle count are the
persisted state; today's batch folds in WITHOUT re-enumerating old
triangles; incremental == scratch is hash-proven by the oracle.

Delta derivation (the part worth reading): with edges stored (ua < ub)
and each triangle a < b < c decomposed into fixed roles e1=(a,b),
e2=(b,c), e3=(a,c), every triangle has exactly ONE role assignment, so
partitioning the >= 1-new-edge triangles by their FIRST new role

    d1 = new e1  x union e2 x union e3
    d2 = old e1  x new e2   x union e3
    d3 = old e1  x old e2   x new e3

is a disjoint exact cover: t_delta = d1 + d2 + d3. Every term anchors a
join side on the batch-sized new-edge table, so the merge cost follows
O(batch x sampled-adjacency), never the state graph. The DuckDB oracle
derives the delta INDEPENDENTLY -- scratch 3-join over the union minus
scratch 3-join over the state -- so a hash match proves the role
decomposition equals the scratch difference.

Split correctness: the old/new cut (`_QCUT`, shared with the inc_*
family) lands on an hour boundary and co-occurrence edges live entirely
inside one hour, so edges(all events) = edges(old) UNION edges(new) --
no cross-boundary edge can exist -- and capping per hour commutes with
the split (hours are disjoint across the cut). Batch edges already in
the state are removed by anti-join (a pair can co-occur in both
periods); sampling is the estimator's deterministic md5 rule, so state
and batch agree on membership without coordination.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from electricity_forecast_pipeline_airflow_k8s_spark.queries import register, table
from electricity_forecast_pipeline_airflow_k8s_spark.querydefs.graph import (
    _SSSP_HOUR_CAP,
    _cap_hours,
)
from electricity_forecast_pipeline_airflow_k8s_spark.querydefs.round8 import _QCUT

_ITE_SCALE = 512  # 1/p^3 for the estimator's p = 2/16 md5 edge sampling


def _ite_sampled(edges: DataFrame) -> DataFrame:
    keep = (
        F.substring(
            F.md5(
                F.concat_ws(
                    "|", F.col("ua").cast("string"), F.col("ub").cast("string")
                )
            ),
            1,
            1,
        )
        <= "1"
    )
    return edges.filter(keep)


def _ite_edges(ev: DataFrame) -> DataFrame:
    a, c = ev.alias("a"), ev.alias("c")
    return (
        a.join(
            c,
            (F.col("a.h") == F.col("c.h"))
            & (F.col("a.user_id") < F.col("c.user_id")),
        )
        .select(F.col("a.user_id").alias("ua"), F.col("c.user_id").alias("ub"))
        .distinct()
    )


def _ite_triangles(edges: DataFrame):
    """Exact id-ordered 3-join triangle count over one edge set."""
    e1, e2, e3 = edges.alias("e1"), edges.alias("e2"), edges.alias("e3")
    return (
        e1.join(e2, F.col("e2.ua") == F.col("e1.ub"))
        .join(
            e3,
            (F.col("e3.ua") == F.col("e1.ua"))
            & (F.col("e3.ub") == F.col("e2.ub")),
        )
        .agg(F.count(F.lit(1)).alias("t"))
    )


_ITE_EDGE_SQL = """
  SELECT DISTINCT a.user_id AS ua, c.user_id AS ub
  FROM {src} a JOIN {src} c ON a.h = c.h AND a.user_id < c.user_id
"""

_ITE_ORACLE = f"""
WITH b0 AS (
  SELECT DISTINCT date_trunc('hour', ts::TIMESTAMP) AS h, user_id
  FROM events
  WHERE event_type = 'error' AND ts IS NOT NULL AND user_id IS NOT NULL
),
b AS (
  SELECT h, user_id FROM b0
  QUALIFY row_number() OVER (PARTITION BY h ORDER BY user_id) <= {_SSSP_HOUR_CAP}
),
old_b AS (SELECT * FROM b WHERE h < TIMESTAMP '{_QCUT}'),
new_b AS (SELECT * FROM b WHERE h >= TIMESTAMP '{_QCUT}'),
e_old AS ({_ITE_EDGE_SQL.format(src="old_b")}),
e_new_raw AS ({_ITE_EDGE_SQL.format(src="new_b")}),
samp_old AS (
  SELECT ua, ub FROM e_old
  WHERE substr(md5(CAST(ua AS VARCHAR) || '|' || CAST(ub AS VARCHAR)), 1, 1)
        <= '1'
),
samp_new AS (
  SELECT ua, ub FROM e_new_raw
  WHERE substr(md5(CAST(ua AS VARCHAR) || '|' || CAST(ub AS VARCHAR)), 1, 1)
        <= '1'
    AND NOT EXISTS (SELECT 1 FROM samp_old o
                    WHERE o.ua = e_new_raw.ua AND o.ub = e_new_raw.ub)
),
un AS (SELECT * FROM samp_old UNION ALL SELECT * FROM samp_new),
t_old AS (
  SELECT count(*) AS t
  FROM samp_old e1
  JOIN samp_old e2 ON e2.ua = e1.ub
  JOIN samp_old e3 ON e3.ua = e1.ua AND e3.ub = e2.ub
),
t_all AS (
  SELECT count(*) AS t
  FROM un e1
  JOIN un e2 ON e2.ua = e1.ub
  JOIN un e3 ON e3.ua = e1.ua AND e3.ub = e2.ub
)
SELECT (SELECT count(*) FROM samp_old) AS n_state_edges,
       (SELECT count(*) FROM samp_new) AS n_batch_edges,
       (SELECT t FROM t_old) AS t_state,
       CAST((SELECT t FROM t_all) - (SELECT t FROM t_old) AS BIGINT)
         AS t_delta,
       (SELECT t FROM t_all) AS t_total,
       CAST((SELECT t FROM t_all) * {_ITE_SCALE} AS BIGINT) AS t_estimate
"""


@register("inc_triangle_estimate_merge", oracle=_ITE_ORACLE)
def q_inc_triangle_estimate_merge(spark: SparkSession, sf_dir: str):
    import os

    scoped = os.environ.get("SPARK_GRAFT_SCOPED_CACHE", "1") != "0"
    ev = (
        table(spark, "events", sf_dir)
        .filter(
            (F.col("event_type") == "error")
            & F.col("ts").isNotNull()
            & F.col("user_id").isNotNull()
        )
        .select(F.date_trunc("hour", "ts").alias("h"), "user_id")
        .distinct()
    )
    ev = _cap_hours(ev)
    cut = F.lit(_QCUT).cast("timestamp")
    state = _ite_sampled(_ite_edges(ev.filter(F.col("h") < cut)))
    batch = _ite_sampled(_ite_edges(ev.filter(F.col("h") >= cut))).join(
        state, ["ua", "ub"], "left_anti"
    )
    if scoped:
        state = state.persist()
        batch = batch.persist()
    union = state.unionByName(batch)

    # first-new-role decomposition: each term's anchor side is the batch
    def roles(r1: DataFrame, r2: DataFrame, r3: DataFrame):
        e1, e2, e3 = r1.alias("e1"), r2.alias("e2"), r3.alias("e3")
        return (
            e1.join(e2, F.col("e2.ua") == F.col("e1.ub"))
            .join(
                e3,
                (F.col("e3.ua") == F.col("e1.ua"))
                & (F.col("e3.ub") == F.col("e2.ub")),
            )
            .agg(F.count(F.lit(1)).alias("t"))
        )

    d1 = roles(batch, union, union).withColumnRenamed("t", "d1")
    d2 = roles(state, batch, union).withColumnRenamed("t", "d2")
    d3 = roles(state, state, batch).withColumnRenamed("t", "d3")
    t_state = _ite_triangles(state).withColumnRenamed("t", "t_state")

    out = (
        state.agg(F.count(F.lit(1)).alias("n_state_edges"))
        .crossJoin(batch.agg(F.count(F.lit(1)).alias("n_batch_edges")))
        .crossJoin(t_state)
        .crossJoin(d1)
        .crossJoin(d2)
        .crossJoin(d3)
        .select(
            "n_state_edges",
            "n_batch_edges",
            "t_state",
            (F.col("d1") + F.col("d2") + F.col("d3"))
            .cast("bigint")
            .alias("t_delta"),
            (F.col("t_state") + F.col("d1") + F.col("d2") + F.col("d3"))
            .cast("bigint")
            .alias("t_total"),
            (
                (F.col("t_state") + F.col("d1") + F.col("d2") + F.col("d3"))
                * F.lit(_ITE_SCALE)
            )
            .cast("bigint")
            .alias("t_estimate"),
        )
    )
    if scoped:
        out = out.localCheckpoint(eager=True)
        state.unpersist()
        batch.unpersist()
    return out


# -- streaming incremental view maintenance of the triangle count -------------
# The inc_* lane above proves the merge ALGEBRA; this lane runs it
# through real Structured Streaming as incremental view maintenance: the
# sampled edge list streams in micro-batches (maxFilesPerTrigger=1, the
# engine picks the order), and each batch folds through the shared
# replay-idempotent state scaffold. The state frame carries the edge set
# plus the running count as a union-typed table (edge rows have cnt NULL,
# one count row has ua/ub NULL); each fold anti-joins the batch against
# the state edges, applies the same first-new-role decomposition, and
# adds the delta to the carried count.
#
# Order-invariance argument (why ANY batch order folds to the batch
# answer): a triangle is counted by the fold that delivers its LAST
# edge -- the >= 1-new decomposition only sees triangles whose three
# edges are all present and at least one is new -- so every triangle is
# counted exactly once no matter how the engine partitions or orders the
# stream, and replays re-fold from the pre-batch state (scaffold
# contract), so at-least-once delivery cannot double-count. The oracle
# is the scratch count over ALL sampled edges: a hash match proves
# stream-IVM == batch for whatever order this run used.
@register(
    "stream_triangle_ivm_merge",
    oracle=f"""
WITH b0 AS (
  SELECT DISTINCT date_trunc('hour', ts::TIMESTAMP) AS h, user_id
  FROM events
  WHERE event_type = 'error' AND ts IS NOT NULL AND user_id IS NOT NULL
),
b AS (
  SELECT h, user_id FROM b0
  QUALIFY row_number() OVER (PARTITION BY h ORDER BY user_id) <= {_SSSP_HOUR_CAP}
),
e AS (
  SELECT DISTINCT a.user_id AS ua, c.user_id AS ub
  FROM b a JOIN b c ON a.h = c.h AND a.user_id < c.user_id
),
es AS (
  SELECT ua, ub FROM e
  WHERE substr(md5(CAST(ua AS VARCHAR) || '|' || CAST(ub AS VARCHAR)), 1, 1)
        <= '1'
),
tri AS (
  SELECT count(*) AS t
  FROM es e1
  JOIN es e2 ON e2.ua = e1.ub
  JOIN es e3 ON e3.ua = e1.ua AND e3.ub = e2.ub
)
SELECT (SELECT count(*) FROM es) AS n_edges,
       (SELECT t FROM tri) AS t_sampled,
       CAST((SELECT t FROM tri) * {_ITE_SCALE} AS BIGINT) AS t_estimate
""",
)
def q_stream_triangle_ivm_merge(spark: SparkSession, sf_dir: str):
    from electricity_forecast_pipeline_airflow_k8s_spark.streaming.foldstate import (
        fold_stream_state,
    )

    ev = (
        table(spark, "events", sf_dir)
        .filter(
            (F.col("event_type") == "error")
            & F.col("ts").isNotNull()
            & F.col("user_id").isNotNull()
        )
        .select(F.date_trunc("hour", "ts").alias("h"), "user_id")
        .distinct()
    )
    edges = _ite_sampled(_ite_edges(_cap_hours(ev)))

    def _count_row(cnt_col):
        return F.struct(
            F.lit(None).cast("long").alias("ua"),
            F.lit(None).cast("long").alias("ub"),
            cnt_col.cast("long").alias("cnt"),
        )

    def fold(prev, batch):
        new = batch.select("ua", "ub").distinct()
        if prev is None:
            prev_edges = new.limit(0)
            prev_cnt = batch.sparkSession.range(1).select(
                F.lit(0).cast("long").alias("c")
            )
        else:
            prev_edges = prev.filter(F.col("cnt").isNull()).select("ua", "ub")
            prev_cnt = prev.filter(F.col("cnt").isNotNull()).select(
                F.col("cnt").alias("c")
            )
        new = new.join(prev_edges, ["ua", "ub"], "left_anti")
        union = prev_edges.unionByName(new)

        def roles(r1, r2, r3):
            e1, e2, e3 = r1.alias("e1"), r2.alias("e2"), r3.alias("e3")
            return (
                e1.join(e2, F.col("e2.ua") == F.col("e1.ub"))
                .join(
                    e3,
                    (F.col("e3.ua") == F.col("e1.ua"))
                    & (F.col("e3.ub") == F.col("e2.ub")),
                )
                .agg(F.count(F.lit(1)).alias("t"))
            )

        delta = (
            roles(new, union, union).withColumnRenamed("t", "d1")
            .crossJoin(roles(prev_edges, new, union).withColumnRenamed("t", "d2"))
            .crossJoin(
                roles(prev_edges, prev_edges, new).withColumnRenamed("t", "d3")
            )
            .select((F.col("d1") + F.col("d2") + F.col("d3")).alias("d"))
        )
        cnt = prev_cnt.crossJoin(delta).select(
            (F.col("c") + F.col("d")).alias("c")
        )
        edge_rows = union.select(
            "ua", "ub", F.lit(None).cast("long").alias("cnt")
        )
        cnt_rows = cnt.select(_count_row(F.col("c")).alias("s")).select(
            "s.ua", "s.ub", "s.cnt"
        )
        return edge_rows.unionByName(cnt_rows)

    def finalize(state):
        n_edges = state.filter(F.col("cnt").isNull()).agg(
            F.count(F.lit(1)).alias("n_edges")
        )
        t = state.filter(F.col("cnt").isNotNull()).agg(
            F.coalesce(F.sum("cnt"), F.lit(0)).cast("bigint").alias("t_sampled")
        )
        return n_edges.crossJoin(t).select(
            "n_edges",
            "t_sampled",
            (F.col("t_sampled") * F.lit(_ITE_SCALE)).cast("bigint").alias(
                "t_estimate"
            ),
        )

    return fold_stream_state(spark, edges, fold, finalize, n_batches=4)

"""Mergeable state folds through REAL Structured Streaming.

Each lane here is the streaming twin of a batch/incremental lane: the
same mergeable summary (top-k heap, grid histogram, KMV bottom-k sketch,
exact-dedup key set, sampled triangle count) folded micro-batch by
micro-batch through the replay-idempotent state scaffold
(streaming/foldstate.py: maxFilesPerTrigger=1, dir-versioned state,
previous state = newest version strictly below the batch id). The DuckDB
oracle computes the scratch answer over ALL the data, so a hash match
proves stream-fold == batch for whatever batch order the engine picked
-- the mergeability contract, proven on the engine rather than assumed.

Lanes: stream_topk_merge, stream_quantile_merge, stream_kmv_merge,
stream_corpus_dedup_merge, stream_triangle_ivm_merge. (The windowed /
watermark / join streaming-parity lanes live in sessions.py; the
batch-side mergeable algebra in incremental.py.)
"""

from __future__ import annotations

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from electricity_forecast_pipeline_airflow_k8s_spark.queries import register, table
from electricity_forecast_pipeline_airflow_k8s_spark.querydefs.corpus import (
    _E2E_GATE_FLAGS,
    _gate_ids,
)
from electricity_forecast_pipeline_airflow_k8s_spark.querydefs.graph import (
    _SSSP_HOUR_CAP,
    _cap_hours,
)
from electricity_forecast_pipeline_airflow_k8s_spark.querydefs.incremental import (
    _ITE_SCALE,
    _KMV_H_SQL,
    _KMV_K,
    _TOPK_K,
    _TOPK_ORACLE,
    _ite_edges,
    _ite_sampled,
)
from electricity_forecast_pipeline_airflow_k8s_spark.querydefs.textops2 import gopher_flags_sql
from electricity_forecast_pipeline_airflow_k8s_spark.querydefs.validation import (
    EVENTS_SRC,
)

# -- streaming top-k maintenance (the mergeable contract, on the engine) -----
# inc_topk_merge proves top-k state-merge == full recompute in batch;
# this drives the SAME contract through Structured Streaming: documents
# arrive as 4 micro-batches (one file per trigger), and foreachBatch
# folds each batch's own top-k into a landed k-rows-per-group state
# table -- the state read back after the stream drains must equal
# scratch top-k over everything (the identical oracle). Because top-k
# merge is order-invariant, the result is deterministic whatever order
# the engine picks the files in -- which is exactly WHY this state shape
# is safe to maintain under streaming retries at 100 TB. State lands per
# batch_id (idempotent-overwrite, the stream_upsert_replay_state
# convention) so an at-least-once replay of a batch cannot corrupt it.
@register("stream_topk_merge", oracle=_TOPK_ORACLE)
def q_stream_topk_merge(spark: SparkSession, sf_dir: str):
    from electricity_forecast_pipeline_airflow_k8s_spark.streaming.foldstate import (
        fold_stream_state,
    )

    d = (
        table(spark, "documents", sf_dir)
        .filter(F.col("n_chars").isNotNull() & F.col("source").isNotNull())
        .select("doc_id", "source", "n_chars")
    )
    w = Window.partitionBy("source").orderBy(F.desc("n_chars"), "doc_id")

    def _topk(df):
        return (
            df.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= _TOPK_K)
            .drop("rnk")
        )

    def fold(prev, batch):
        m = _topk(batch)
        return _topk(prev.unionByName(m)) if prev is not None else m

    def finalize(state):
        return (
            _topk(state)
            .withColumn("rnk", F.row_number().over(w).cast("int"))
            .select("source", "rnk", "doc_id", "n_chars")
            .orderBy("source", "rnk")
        )

    return fold_stream_state(spark, d, fold, finalize)


# -- streaming grid-quantile maintenance ---------------------------------------
# stream_topk_merge folds the mergeable TOP-K contract through Structured
# Streaming; this folds the mergeable QUANTILE contract (the
# inc_quantile_merge histogram algebra). Events arrive as 4 micro-batches
# in WHATEVER order the engine picks -- safe, because cell-wise histogram
# addition is order-invariant AND replay-idempotent (state lands per
# batch_id, the stream_upsert_replay_state convention). The drained state
# is (group, bin) counts -- value-range-bounded, never row-count-bounded
# -- and the discrete quantiles read off its cumulative exactly as the
# scratch oracle computes them over the full table.
_SQM_ORACLE = f"""
WITH ev AS (
  SELECT event_type, floor(CAST(value AS DOUBLE) * 100 + 0.5) / 100 AS bin
  FROM {EVENTS_SRC} WHERE value IS NOT NULL AND ts IS NOT NULL
),
bins AS (SELECT event_type, bin, count(*) AS c FROM ev GROUP BY 1, 2),
cum AS (
  SELECT event_type, bin, c,
         sum(c) OVER (PARTITION BY event_type ORDER BY bin) AS cm,
         sum(c) OVER (PARTITION BY event_type) AS n
  FROM bins
)
SELECT event_type,
       CAST(max(n) AS BIGINT) AS n_rows,
       min(CASE WHEN cm >= ceil(n * 0.25) THEN bin END) AS q25,
       min(CASE WHEN cm >= ceil(n * 0.5) THEN bin END) AS median,
       min(CASE WHEN cm >= ceil(n * 0.9) THEN bin END) AS q90,
       min(CASE WHEN cm >= ceil(n * 0.99) THEN bin END) AS q99
FROM cum GROUP BY 1 ORDER BY 1
"""


@register("stream_quantile_merge", oracle=_SQM_ORACLE)
def q_stream_quantile_merge(spark: SparkSession, sf_dir: str):
    from electricity_forecast_pipeline_airflow_k8s_spark.streaming.foldstate import (
        fold_stream_state,
    )

    d = (
        table(spark, "events", sf_dir)
        .filter(F.col("value").isNotNull() & F.col("ts").isNotNull())
        .select(
            "event_type",
            (F.floor(F.col("value").cast("double") * 100 + 0.5) / 100).alias(
                "bin"
            ),
        )
    )

    def fold(prev, batch):
        hist = batch.groupBy("event_type", "bin").agg(
            F.count(F.lit(1)).alias("c")
        )
        if prev is None:
            return hist
        return (
            prev.unionByName(hist)
            .groupBy("event_type", "bin")
            .agg(F.sum("c").alias("c"))
        )

    def finalize(bins):
        w_cum = (
            Window.partitionBy("event_type")
            .orderBy("bin")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        w_all = Window.partitionBy("event_type")
        cum = bins.select(
            "event_type",
            "bin",
            F.sum("c").over(w_cum).alias("cm"),
            F.sum("c").over(w_all).alias("n"),
        )

        def _q(p):
            return F.min(
                F.when(F.col("cm") >= F.ceil(F.col("n") * p), F.col("bin"))
            )

        return (
            cum.groupBy("event_type")
            .agg(
                F.max("n").cast("bigint").alias("n_rows"),
                _q(0.25).alias("q25"),
                _q(0.5).alias("median"),
                _q(0.9).alias("q90"),
                _q(0.99).alias("q99"),
            )
            .orderBy("event_type")
        )

    return fold_stream_state(spark, d, fold, finalize)


# -- streaming KMV fold (the third mergeable state shape on the engine) --------
# stream_topk_merge (order statistics) and stream_quantile_merge
# (distributions) proved their batch merge contracts through Structured
# Streaming; this completes the trilogy with DISTINCT COUNTS: the KMV
# bottom-k sketch folds per micro-batch (batch's own bottom-k -> dedup
# union with landed state -> re-rank, k rows/group state, idempotent
# per-batch_id overwrite). Bottom-k of a set union is order-invariant
# and replay-idempotent -- the drained sketch equals the global scratch
# bottom-k whatever file order the engine picked. The oracle is the
# GLOBAL scratch derivation (not a split replay), so the hash match
# proves fold == scratch independently of how the stream was cut.
_SKMV_ORACLE = f"""
WITH ev AS (
  SELECT DISTINCT event_type, user_id FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL
),
h AS (
  SELECT event_type, user_id, {_KMV_H_SQL} AS h FROM ev
),
state AS (
  SELECT event_type, user_id, h FROM (
    SELECT *, row_number() OVER (PARTITION BY event_type
                                 ORDER BY h, user_id) AS rn
    FROM h
  ) WHERE rn <= {_KMV_K}
),
est AS (
  SELECT event_type, count(*) AS n_state, max(h) AS hmax
  FROM state GROUP BY 1
),
exact AS (
  SELECT event_type, count(*) AS n_exact FROM ev GROUP BY 1
)
SELECT x.event_type,
       CAST(x.n_exact AS BIGINT) AS n_exact,
       CAST(e.n_state AS BIGINT) AS n_state,
       floor((CASE WHEN e.n_state >= {_KMV_K}
                   THEN ({_KMV_K} - 1) / e.hmax
                   ELSE e.n_state * 1.0 END) * 10000 + 0.5) / 10000
         AS kmv_estimate
FROM est e JOIN exact x USING (event_type) ORDER BY 1
"""


@register("stream_kmv_merge", oracle=_SKMV_ORACLE)
def q_stream_kmv_merge(spark: SparkSession, sf_dir: str):
    from electricity_forecast_pipeline_airflow_k8s_spark.functions.hashing import (
        stable_hash,
    )
    from electricity_forecast_pipeline_airflow_k8s_spark.streaming.foldstate import (
        fold_stream_state,
    )

    d = (
        table(spark, "events", sf_dir)
        .filter(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
        .select("event_type", "user_id")
    )
    h = (
        F.conv(
            F.substring(stable_hash(F.lit("kmv"), F.col("user_id")), 1, 8),
            16,
            10,
        ).cast("double")
        + 0.5
    ) / float(16**8)
    w = Window.partitionBy("event_type").orderBy("h", "user_id")

    def bottomk(df):
        return (
            df.select("event_type", "user_id")
            .distinct()
            .withColumn("h", h)
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= _KMV_K)
            .drop("rn")
        )

    def fold(prev, batch):
        m = bottomk(batch)
        if prev is None:
            return m
        return bottomk(
            prev.select("event_type", "user_id").unionByName(
                m.select("event_type", "user_id")
            )
        )

    def finalize(state):
        est = state.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n_state"), F.max("h").alias("hmax")
        )
        exact = d.distinct().groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n_exact")
        )
        est_raw = F.when(
            F.col("n_state") >= _KMV_K, (_KMV_K - 1) / F.col("hmax")
        ).otherwise(F.col("n_state") * 1.0)
        return (
            est.join(exact, "event_type")
            .select(
                "event_type",
                F.col("n_exact").cast("bigint").alias("n_exact"),
                F.col("n_state").cast("bigint").alias("n_state"),
                (F.floor(est_raw * 10000 + 0.5) / 10000).alias("kmv_estimate"),
            )
            .orderBy("event_type")
        )

    return fold_stream_state(spark, d, fold, finalize)


# -- streaming corpus ingestion: gate + exact dedup as a mergeable fold --------
# The corpus-prep front door run through REAL Structured Streaming:
# documents arrive as micro-batches (one file per trigger); each batch is
# Gopher-gated (doc-local, the same six rules as corpus_prep_e2e) and
# folded into a fingerprint-keyed state table keeping the min-id doc per
# normalized-text fingerprint -- the exact-dedup state a streaming
# ingestion pipeline maintains. The fold is order-invariant (min of a
# struct) and replay-idempotent via the shared foldstate scaffold, so
# at-least-once delivery cannot double-admit a duplicate. The oracle is
# the BATCH gate+dedup over everything -- a hash match proves
# stream-fold == batch for whatever file order the engine picked (the
# stream_*_merge trilogy contract, now on the corpus front door).
@register(
    "stream_corpus_dedup_merge",
    oracle=f"""
WITH {gopher_flags_sql("documents")},
s1 AS (
  SELECT d.doc_id, d.source, d.text
  FROM documents d JOIN gopher_flags g ON g.doc_id = d.doc_id
  WHERE {" + ".join("g." + c for c in _E2E_GATE_FLAGS)} = 0
),
keyed AS (
  SELECT *, coalesce(md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))),
                     '__null_text__') AS fp
  FROM s1
),
kept AS (
  SELECT k.doc_id, k.source
  FROM keyed k
  JOIN (SELECT fp, min(doc_id) AS doc_id FROM keyed GROUP BY 1) m
    ON m.fp = k.fp AND m.doc_id = k.doc_id
)
SELECT source, count(*) AS n_kept, CAST(min(doc_id) AS BIGINT) AS min_kept_id
FROM kept GROUP BY source ORDER BY source
""",
)
def q_stream_corpus_dedup_merge(spark: SparkSession, sf_dir: str):
    from electricity_forecast_pipeline_airflow_k8s_spark.operators.text import (
        fingerprint_expr,
    )
    from electricity_forecast_pipeline_airflow_k8s_spark.streaming.foldstate import (
        fold_stream_state,
    )

    docs = table(spark, "documents", sf_dir).select("doc_id", "source", "text")

    def fold(prev, batch):
        gated = batch.join(
            _gate_ids(batch).select("doc_id"), "doc_id", "left_semi"
        )
        hist = (
            gated.select(
                F.coalesce(
                    fingerprint_expr("text"), F.lit("__null_text__")
                ).alias("fp"),
                F.struct(
                    F.col("doc_id").alias("doc_id"),
                    F.col("source").alias("source"),
                ).alias("kept"),
            )
            .groupBy("fp")
            .agg(F.min("kept").alias("kept"))
        )
        if prev is None:
            return hist
        return (
            prev.unionByName(hist).groupBy("fp").agg(F.min("kept").alias("kept"))
        )

    def finalize(state):
        return (
            state.select("kept.source", "kept.doc_id")
            .groupBy("source")
            .agg(
                F.count(F.lit(1)).alias("n_kept"),
                F.min("doc_id").cast("bigint").alias("min_kept_id"),
            )
            .orderBy("source")
        )

    return fold_stream_state(spark, docs, fold, finalize, n_batches=4)


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

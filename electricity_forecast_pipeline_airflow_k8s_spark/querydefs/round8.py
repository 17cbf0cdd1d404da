"""Round-8 additions: incremental connected components -- the hardest
incremental-maintenance operator, and the one that keeps dedup_clusters
maintainable at 100 TB where a per-batch full recompute is impossible.

Contract (same as inc_minhash_new_batch / inc_sessionize_rollforward):
the Spark side computes the INCREMENTAL answer -- yesterday's component
labels + today's edge batch, merged through a contracted label graph
that is AFFECTED-COMPONENT-sized, never corpus-sized -- while the DuckDB
oracle recomputes connected components from scratch over the full edge
set. A hash match proves incremental == full recompute.
"""

from __future__ import annotations

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from electricity_forecast_pipeline_airflow_k8s_spark.operators import dedup as DD
from electricity_forecast_pipeline_airflow_k8s_spark.queries import register, table
from electricity_forecast_pipeline_airflow_k8s_spark.querydefs.round7 import (
    _BATCH_MOD,
    _BATCH_REM,
)
from electricity_forecast_pipeline_airflow_k8s_spark.querydefs.textops import (
    MINHASH_BANDS,
    MINHASH_K,
    _clusters_oracle,
)
from electricity_forecast_pipeline_airflow_k8s_spark.querydefs.validation import (
    EVENTS_SRC,
)


# -- incremental connected components over near-dup edges ---------------------
# "Yesterday" = near-dup pairs between two OLD docs (doc_id % 10 != 9 on
# both sides) -- at scale, the persisted (node, component) state table;
# here derived from the old half exactly as inc_sessionize derives its
# old-session state. "Today" = the batch-touching pairs (the shape
# inc_minhash_new_batch emits). Merge algebra:
#   1. map each new edge endpoint to its OLD component label (its own id
#      if previously unlabeled) -- two label-sized broadcast-ish joins;
#   2. contract: the new edges projected onto labels form a graph whose
#      node count is bounded by (affected old components + batch docs),
#      NEVER the corpus;
#   3. run min-label CC on the contracted graph only;
#   4. resolve: old labels (and new nodes' self-labels) map through the
#      contracted result; untouched components pass through unchanged.
# Because every old label is the MIN node id of its component, the min
# over merged labels is the min over the merged component's nodes -- so
# the resolved labeling is exactly what scratch CC over the full edge
# set produces, which is what the oracle computes (the same recursive
# reach CC as dedup_clusters). Output: (node, component) for every node
# incident to any near-dup edge, identical to dedup_clusters' shape.
@register("inc_cc_new_edges", oracle=_clusters_oracle(0.5))
def q_inc_cc_new_edges(spark: SparkSession, sf_dir: str):
    import os

    scoped = os.environ.get("SPARK_GRAFT_SCOPED_CACHE", "1") != "0"
    docs = table(spark, "documents", sf_dir)
    # persist: three consumers (old-half CC, the contracted merge, and the
    # new-node scan) would otherwise each recompute the minhash subtree in
    # the lazy (bench) path; under scoped-cache the inner pipeline already
    # returns an eager checkpoint, so the persist is a no-cost alias there
    pairs = (
        DD.minhash_lsh_dedup_pairs(
            docs, k=MINHASH_K, bands=MINHASH_BANDS, threshold=0.5
        )
        .select("doc_a", "doc_b")
        .persist()
    )
    in_batch = lambda c: F.col(c) % _BATCH_MOD == _BATCH_REM  # noqa: E731
    old_pairs = pairs.filter(~in_batch("doc_a") & ~in_batch("doc_b"))
    new_pairs = pairs.filter(in_batch("doc_a") | in_batch("doc_b"))

    # yesterday's state (persisted table at scale)
    old_labels = DD.connected_components(old_pairs)

    # endpoints -> old labels (own id when previously unlabeled)
    la = old_labels.select(
        F.col("node").alias("doc_a"), F.col("component").alias("_la")
    )
    lb = old_labels.select(
        F.col("node").alias("doc_b"), F.col("component").alias("_lb")
    )
    mapped = (
        new_pairs.join(la, "doc_a", "left")
        .join(lb, "doc_b", "left")
        .select(
            F.coalesce(F.col("_la"), F.col("doc_a")).alias("la"),
            F.coalesce(F.col("_lb"), F.col("doc_b")).alias("lb"),
        )
    )
    # contracted label graph: self-loops (edge inside one old component)
    # are no-ops and drop out
    contracted = mapped.filter(F.col("la") != F.col("lb")).distinct()
    resolve = DD.connected_components(
        contracted, a_col="la", b_col="lb"
    ).select(F.col("node").alias("_label"), F.col("component").alias("_merged"))

    # resolve old labels through the contracted merge (untouched
    # components miss the join and pass through)
    final_old = old_labels.join(
        resolve, old_labels.component == F.col("_label"), "left"
    ).select(
        "node", F.coalesce(F.col("_merged"), F.col("component")).alias("component")
    )
    # new-edge endpoints with no old label: self-label resolved the same way
    new_nodes = (
        new_pairs.select(F.col("doc_a").alias("node"))
        .union(new_pairs.select(F.col("doc_b").alias("node")))
        .distinct()
        .join(old_labels.select("node"), "node", "left_anti")
    )
    final_new = new_nodes.join(
        resolve, new_nodes.node == F.col("_label"), "left"
    ).select("node", F.coalesce(F.col("_merged"), F.col("node")).alias("component"))

    out = final_old.unionByName(final_new).orderBy("node")
    if scoped:
        out = out.localCheckpoint(eager=True)
        pairs.unpersist()
    return out


# -- incremental grid-histogram quantile maintenance --------------------------
# Quantiles are not mergeable as scalars, but a (group, grid-bin) count
# HISTOGRAM is: yesterday's per-bin counts + the batch's per-bin counts
# sum cell-wise, and the discrete quantile reads off the merged
# cumulative -- the same exact-on-grid machinery as
# quality_profile_scale(quantile_mode="grid"), now maintained
# incrementally. The merge is STATE-sized (distinct bins per group,
# bounded by value-range x 100 regardless of row count); the cumulative
# window runs over the tiny merged bins frame, never the fact. The
# oracle recomputes the same grid quantiles from scratch over the full
# table -- a hash match proves histogram-merge == full recompute.
_QCUT = "2024-01-20 00:00:00"


@register(
    "inc_quantile_merge",
    oracle=f"""
WITH ev AS (
  SELECT event_type, ts::TIMESTAMP AS t, CAST(value AS DOUBLE) AS v
  FROM {EVENTS_SRC} WHERE value IS NOT NULL AND ts IS NOT NULL
),
bins AS (
  SELECT event_type, floor(v * 100 + 0.5) / 100 AS bin,
         count(*) AS c,
         sum(CASE WHEN t < TIMESTAMP '{_QCUT}' THEN 1 ELSE 0 END) AS c_old
  FROM ev GROUP BY 1, 2
),
cum AS (
  SELECT event_type, bin, c, c_old,
         sum(c) OVER (PARTITION BY event_type ORDER BY bin) AS cm,
         sum(c) OVER (PARTITION BY event_type) AS n
  FROM bins
)
SELECT event_type,
       CAST(sum(c_old) AS BIGINT) AS n_old,
       CAST(max(n) - sum(c_old) AS BIGINT) AS n_new,
       CAST(max(n) AS BIGINT) AS n_rows,
       min(CASE WHEN cm >= ceil(n * 0.25) THEN bin END) AS q25,
       min(CASE WHEN cm >= ceil(n * 0.5) THEN bin END) AS median,
       min(CASE WHEN cm >= ceil(n * 0.9) THEN bin END) AS q90,
       min(CASE WHEN cm >= ceil(n * 0.99) THEN bin END) AS q99
FROM cum GROUP BY 1 ORDER BY 1
""",
)
def q_inc_quantile_merge(spark: SparkSession, sf_dir: str):
    ev = (
        table(spark, "events", sf_dir)
        .filter(F.col("value").isNotNull() & F.col("ts").isNotNull())
        .select(
            "event_type",
            F.col("ts"),
            (F.floor(F.col("value").cast("double") * 100 + 0.5) / 100).alias(
                "bin"
            ),
        )
    )
    cut = F.lit(_QCUT).cast("timestamp")

    def _hist(half):
        return half.groupBy("event_type", "bin").agg(
            F.count(F.lit(1)).alias("c")
        )

    # yesterday's state + today's batch partial, merged cell-wise --
    # a union + re-aggregate of two STATE-sized frames, never the fact
    old_h = _hist(ev.filter(F.col("ts") < cut))
    new_h = _hist(ev.filter(F.col("ts") >= cut))
    merged = (
        old_h.withColumn("is_old", F.lit(1))
        .unionByName(new_h.withColumn("is_old", F.lit(0)))
        .groupBy("event_type", "bin")
        .agg(
            F.sum("c").alias("c"),
            F.sum(F.when(F.col("is_old") == 1, F.col("c")).otherwise(0)).alias(
                "c_old"
            ),
        )
    )
    w_cum = (
        Window.partitionBy("event_type")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_all = Window.partitionBy("event_type")
    cum = merged.select(
        "event_type",
        "bin",
        "c_old",
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
            F.sum("c_old").cast("bigint").alias("n_old"),
            (F.max("n") - F.sum("c_old")).cast("bigint").alias("n_new"),
            F.max("n").cast("bigint").alias("n_rows"),
            _q(0.25).alias("q25"),
            _q(0.5).alias("median"),
            _q(0.9).alias("q90"),
            _q(0.99).alias("q99"),
        )
        .orderBy("event_type")
    )


# -- incremental top-k maintenance --------------------------------------------
# Top-k is mergeable because any global top-k element is in its own
# batch's top-k: the maintained state is k rows per group, a new batch
# contributes its own k rows, and the merge re-ranks 2k rows per group
# -- never the corpus. The oracle computes scratch top-k over the full
# table with the identical deterministic (n_chars DESC, doc_id ASC)
# order; a hash match proves state-merge == full recompute. Batch
# convention: doc_id % 10 == 9 (the inc_minhash ingest batch).
_TOPK_K = 3

_TOPK_ORACLE = f"""
WITH d AS (
  SELECT doc_id, source, n_chars FROM documents
  WHERE n_chars IS NOT NULL AND source IS NOT NULL
),
ranked AS (
  SELECT source, doc_id, n_chars,
         row_number() OVER (PARTITION BY source
                            ORDER BY n_chars DESC, doc_id) AS rnk
  FROM d
)
SELECT source, CAST(rnk AS INTEGER) AS rnk, doc_id, n_chars
FROM ranked WHERE rnk <= {_TOPK_K} ORDER BY source, rnk
"""


@register("inc_topk_merge", oracle=_TOPK_ORACLE)
def q_inc_topk_merge(spark: SparkSession, sf_dir: str):
    d = (
        table(spark, "documents", sf_dir)
        .filter(F.col("n_chars").isNotNull() & F.col("source").isNotNull())
        .select("doc_id", "source", "n_chars")
    )
    w = Window.partitionBy("source").orderBy(F.desc("n_chars"), "doc_id")

    def _topk(half):
        return (
            half.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= _TOPK_K)
            .drop("rnk")
        )

    # yesterday's state (k rows/group) + the batch's own top-k
    old_top = _topk(d.filter(F.col("doc_id") % _BATCH_MOD != _BATCH_REM))
    new_top = _topk(d.filter(F.col("doc_id") % _BATCH_MOD == _BATCH_REM))
    # merge: re-rank 2k rows per group
    merged = old_top.unionByName(new_top)
    return (
        merged.withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= _TOPK_K)
        .select("source", "rnk", "doc_id", "n_chars")
        .orderBy("source", "rnk")
    )


# -- PQ codebook training curve ------------------------------------------------
# The training-quality diagnostic for the round-8 trained codebook: total
# assignment distortion and the number of (vector, subspace) code changes
# at every k-means iteration (0 = the untrained init). Distortion must
# fall as the codebook trains -- the number a practitioner reads before
# trusting an ANN recall figure. Scale shape: ONE corpus pass computes
# the 1e-9-grid integer distances against all three iteration codebooks
# as codegen hash-aggregates (the measured-fastest PQ distance form), the
# argmins and change flags are taken inline, and only a 3-row aggregate
# leaves; the training itself is the same broadcast-iterate loop the
# serving queries use. The oracle replays the iterations as unrolled CTEs
# and reads the same per-iteration argmin sums.
def _pq_curve_oracle() -> str:
    from electricity_forecast_pipeline_airflow_k8s_spark.querydefs.round7 import (
        _PQ_K,
        _PQ_M,
        _pq_trained_cdims_sql,
    )

    return f"""
WITH e AS (
  SELECT vec_id, embedding, len(embedding) AS d FROM embeddings
  WHERE embedding IS NOT NULL AND len(embedding) >= {_PQ_M}
),
dims AS (
  SELECT vec_id, CAST(i AS INTEGER) AS i,
         ((CAST(i AS INTEGER) - 1) * {_PQ_M}) // d AS sub,
         CAST(embedding[CAST(i AS INTEGER)] AS DOUBLE) AS x
  FROM e, unnest(range(1, d + 1)) r(i)
),
cdims0 AS (
  SELECT vec_id AS cid, i, sub, x AS c FROM dims WHERE vec_id < {_PQ_K}
),
{_pq_trained_cdims_sql()},
dist_f AS (
  SELECT v.vec_id, v.sub, c.cid,
         sum(CAST(floor((v.x - c.c) * (v.x - c.c) * 1e9 + 0.5) AS BIGINT))
           AS d2
  FROM dims v JOIN cdims c ON c.i = v.i AND c.sub = v.sub
  GROUP BY 1, 2, 3
),
best0 AS (
  SELECT vec_id, sub, cid, d2 FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id, sub
                                 ORDER BY d2, cid) AS rk FROM dist_t1
  ) WHERE rk = 1
),
best1 AS (
  SELECT vec_id, sub, cid, d2 FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id, sub
                                 ORDER BY d2, cid) AS rk FROM dist_t2
  ) WHERE rk = 1
),
bestf AS (
  SELECT vec_id, sub, cid, d2 FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id, sub
                                 ORDER BY d2, cid) AS rk FROM dist_f
  ) WHERE rk = 1
)
SELECT 0 AS iteration,
       floor(CAST(sum(d2) AS DOUBLE) / 1e9 * 10000 + 0.5) / 10000
         AS total_distortion,
       CAST(NULL AS BIGINT) AS n_changed
FROM best0
UNION ALL
SELECT 1,
       floor(CAST(sum(b.d2) AS DOUBLE) / 1e9 * 10000 + 0.5) / 10000,
       CAST(sum(CASE WHEN b.cid != p.cid THEN 1 ELSE 0 END) AS BIGINT)
FROM best1 b JOIN best0 p ON p.vec_id = b.vec_id AND p.sub = b.sub
UNION ALL
SELECT 2,
       floor(CAST(sum(b.d2) AS DOUBLE) / 1e9 * 10000 + 0.5) / 10000,
       CAST(sum(CASE WHEN b.cid != p.cid THEN 1 ELSE 0 END) AS BIGINT)
FROM bestf b JOIN best1 p ON p.vec_id = b.vec_id AND p.sub = b.sub
ORDER BY 1
"""


@register("emb_pq_train_curve", oracle=_pq_curve_oracle())
def q_emb_pq_train_curve(spark: SparkSession, sf_dir: str):
    from electricity_forecast_pipeline_airflow_k8s_spark.querydefs.round7 import (
        _PQ_M,
        _PQ_Q9I,
        _pq_train_books,
    )

    emb = table(spark, "embeddings", sf_dir).filter(
        F.col("embedding").isNotNull() & (F.size("embedding") >= _PQ_M)
    )
    # the same memoized training trajectory the serving lanes use (the
    # codebook is a persisted artifact at scale -- trained once per
    # corpus version, diagnosed and served from the same trajectory)
    books, _, cids = _pq_train_books(emb, corpus_key=sf_dir)

    # one corpus pass: distances against all three codebooks as codegen
    # sums, argmin + change flags inline, 3-row aggregate out
    rows = emb.select(
        "vec_id",
        F.size("embedding").alias("d"),
        F.posexplode("embedding").alias("i", "x"),
    )
    sub = F.floor(F.col("i") * _PQ_M / F.col("d")).cast("int")
    aggs = []
    for t, cents in enumerate(books):
        for cid in cids:
            clit = F.array(*[F.lit(v) for v in cents[cid]])
            diff = F.col("x").cast("double") - F.get(clit, F.col("i"))
            aggs.append(F.sum(_PQ_Q9I(diff * diff)).alias(f"d2_{t}_{cid}"))
    per = rows.groupBy("vec_id", sub.alias("sub")).agg(*aggs)
    bests = [
        F.array_min(
            F.array(
                *[
                    F.struct(
                        F.col(f"d2_{t}_{cid}").alias("d2"),
                        F.lit(cid).alias("cid"),
                    )
                    for cid in cids
                ]
            )
        )
        for t in range(len(books))
    ]
    picked = per.select(
        *[bests[t].getField("d2").alias(f"bd_{t}") for t in range(len(books))],
        *[bests[t].getField("cid").alias(f"bc_{t}") for t in range(len(books))],
    )
    contrib = picked.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(t).alias("iteration"),
                        F.col(f"bd_{t}").alias("d2"),
                        (
                            F.lit(None).cast("int")
                            if t == 0
                            else F.when(
                                F.col(f"bc_{t}") != F.col(f"bc_{t - 1}"), 1
                            ).otherwise(0)
                        ).alias("chg"),
                    )
                    for t in range(len(books))
                ]
            )
        ).alias("z")
    ).select("z.iteration", "z.d2", "z.chg")
    return (
        contrib.groupBy("iteration")
        .agg(
            (
                F.floor(F.sum("d2").cast("double") / 1e9 * 10000 + 0.5) / 10000
            ).alias("total_distortion"),
            F.sum("chg").cast("bigint").alias("n_changed"),
        )
        .orderBy("iteration")
    )


# -- containment near-dup pairs (subset/quote-inclusion dedup) -----------------
# Jaccard misses the asymmetric duplicate a real corpus is full of: a
# short doc quoted whole inside a longer one (jaccard |A∩B|/|A∪B| dives
# as |B| grows, containment |A∩B|/|A| stays 1). Directed output:
# (inner_doc, outer_doc, containment = shared/|inner|) at >= 0.8 with a
# >= 5-shingle floor. Scale shape: inverted-index posting join -- only
# pairs sharing a shingle are ever materialized -- with a STOP-SHINGLE
# document-frequency cap first (shingles in > _CONT_DF_CAP docs are
# boilerplate; they blow the posting lists quadratically and carry no
# signal), the standard production guard. Both the n_inner floor and the
# containment threshold are computed over the capped shingle space on
# BOTH engines, and the threshold filters the RAW ratio (rounding only
# the output), so the operator stays exactly oracle-replayable.
_CONT_THRESHOLD, _CONT_MIN_SHINGLES, _CONT_DF_CAP = 0.8, 5, 500


def _containment_oracle() -> str:
    from electricity_forecast_pipeline_airflow_k8s_spark.querydefs.textops import (
        _SHINGLES,
        _TOKS,
    )

    return f"""
WITH docs AS (SELECT doc_id, {_TOKS} AS t FROM documents),
sh AS (SELECT doc_id, {_SHINGLES} AS s FROM docs WHERE len(t) >= 3),
ex0 AS (SELECT doc_id, unnest(s) AS sg FROM sh),
keep AS (
  SELECT sg FROM ex0 GROUP BY sg HAVING count(*) <= {_CONT_DF_CAP}
),
ex AS (SELECT e.doc_id, e.sg FROM ex0 e JOIN keep k ON k.sg = e.sg),
sizes AS (SELECT doc_id, count(*) AS n FROM ex GROUP BY 1),
common AS (
  SELECT a.doc_id AS inner_doc, b.doc_id AS outer_doc, count(*) AS c
  FROM ex a JOIN ex b ON a.sg = b.sg AND a.doc_id != b.doc_id
  GROUP BY 1, 2
)
SELECT c.inner_doc, c.outer_doc,
       floor(c.c * 1.0 / s.n * 10000 + 0.5) / 10000 AS containment
FROM common c JOIN sizes s ON s.doc_id = c.inner_doc
WHERE c.c * 1.0 / s.n >= {_CONT_THRESHOLD} AND s.n >= {_CONT_MIN_SHINGLES}
ORDER BY 1, 2
"""


@register("dedup_containment_pairs", oracle=_containment_oracle())
def q_dedup_containment_pairs(spark: SparkSession, sf_dir: str):
    return containment_pairs(table(spark, "documents", sf_dir))


def containment_pairs(docs):
    """Directed subset-inclusion near-dup pairs over any (doc_id, text)
    frame -- the inverted-index posting join with the _CONT_DF_CAP
    stop-shingle guard (the lane body, parametrized so the 10x stress can
    drive it on a boilerplate-injected corpus)."""
    sh = docs.select("doc_id", DD.shingles("text").alias("s")).filter(
        F.size("s") > 0
    )
    ex0 = sh.select("doc_id", F.explode("s").alias("sg"))
    # stop-shingle cap: document frequency over the distinct-per-doc
    # shingle stream (shingles() emits distinct shingles per doc)
    keep = ex0.groupBy("sg").agg(F.count(F.lit(1)).alias("df")).filter(
        F.col("df") <= _CONT_DF_CAP
    )
    ex = ex0.join(keep.select("sg"), "sg")
    sizes = ex.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    # shared-shingle counts computed UNDIRECTED (a < b) -- half the join
    # output -- then both orientations emitted from the tiny pair frame
    # (containment is asymmetric only through the inner size, not c)
    a = ex.alias("a")
    b = ex.alias("b")
    common = (
        a.join(
            b,
            (F.col("a.sg") == F.col("b.sg"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("da"),
            F.col("b.doc_id").alias("db"),
        )
        .agg(F.count(F.lit(1)).alias("c"))
    )
    directed = common.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("da").alias("inner_doc"), F.col("db").alias("outer_doc")
                ),
                F.struct(
                    F.col("db").alias("inner_doc"), F.col("da").alias("outer_doc")
                ),
            )
        ).alias("p"),
        "c",
    ).select("p.inner_doc", "p.outer_doc", "c")
    out = (
        directed.join(
            sizes.withColumnsRenamed({"doc_id": "inner_doc"}), "inner_doc"
        )
        .withColumn("cont_raw", F.col("c") / F.col("n"))
        .filter(
            (F.col("cont_raw") >= _CONT_THRESHOLD)
            & (F.col("n") >= _CONT_MIN_SHINGLES)
        )
        .select(
            "inner_doc",
            "outer_doc",
            (F.floor(F.col("cont_raw") * 10000 + 0.5) / 10000).alias(
                "containment"
            ),
        )
        .orderBy("inner_doc", "outer_doc")
    )
    return out


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


# -- SCD type-2 interval build (lakehouse dimension history) -------------------
# The standard lakehouse dimension op the merge/tombstone family was
# missing: collapse a change stream into type-2 validity intervals --
# one row per consecutive run of an attribute value, with
# [valid_from, valid_to) spans, a per-key version number, and an
# is_current flag. Gaps-and-islands: a user-partitioned lag marks value
# changes, a running sum numbers the islands, one hash-agg collapses
# each island to its span, and a lead() over the tiny per-version frame
# closes the intervals. Scale: ONE shuffle on the entity key; the
# windows never span users; version frames are change-count-sized.
# user_id < 100 keeps the driver-compare payload bounded (the
# doc_id < 500 convention).
# shared with rel_scd2_merge (round8b): the scratch full-history rebuild
# is the incremental merge's oracle, so both register the same SQL --
# and both engines' island semantics live in ONE pair of helpers
# (_scd2_change_flag / _scd2_islands) so the merge's hash-proven
# equivalence can't silently drift from the scratch build's definition.


def _scd2_change_flag(w: Window) -> "F.Column":
    """1 on the first row of each per-key run of equal event_type values
    (lag NULL or lag != current) under window spec ``w``."""
    return F.when(
        F.lag("event_type").over(w).isNull()
        | (F.lag("event_type").over(w) != F.col("event_type")),
        1,
    ).otherwise(0)


def _scd2_islands(e):
    """Collapse an event frame (user_id, event_type, ts, event_id) into
    SCD2 islands: (user_id, version, attr_value, valid_from, n_events)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        e.withColumn(
            "version",
            F.sum(_scd2_change_flag(w))
            .over(w.rowsBetween(Window.unboundedPreceding, 0))
            .cast("int"),
        )
        .groupBy("user_id", "version")
        .agg(
            F.min("event_type").alias("attr_value"),
            F.min("ts").alias("valid_from"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


_SCD2_ORACLE = f"""
WITH ev AS (
  SELECT user_id, event_type, ts::TIMESTAMP AS ts, event_id
  FROM {EVENTS_SRC}
  WHERE ts IS NOT NULL AND user_id IS NOT NULL AND user_id < 100
),
marked AS (
  SELECT user_id, event_type, ts, event_id,
         CASE WHEN lag(event_type) OVER w IS NULL
                OR lag(event_type) OVER w != event_type
              THEN 1 ELSE 0 END AS chg
  FROM ev
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
versioned AS (
  SELECT user_id, event_type, ts,
         sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS version
  FROM marked
),
islands AS (
  SELECT user_id, CAST(version AS INTEGER) AS version,
         min(event_type) AS attr_value,
         min(ts) AS valid_from, count(*) AS n_events
  FROM versioned GROUP BY user_id, version
)
SELECT user_id, version, attr_value, valid_from,
       lead(valid_from) OVER (PARTITION BY user_id ORDER BY version)
         AS valid_to,
       CAST(n_events AS BIGINT) AS n_events,
       lead(valid_from) OVER (PARTITION BY user_id ORDER BY version)
         IS NULL AS is_current
FROM islands ORDER BY user_id, version
"""


@register("rel_scd2_intervals", oracle=_SCD2_ORACLE)
def q_rel_scd2_intervals(spark: SparkSession, sf_dir: str):
    ev = (
        table(spark, "events", sf_dir)
        .filter(
            F.col("ts").isNotNull()
            & F.col("user_id").isNotNull()
            & (F.col("user_id") < 100)
        )
        .select("user_id", "event_type", "ts", "event_id")
    )
    islands = _scd2_islands(ev)
    wv = Window.partitionBy("user_id").orderBy("version")
    return islands.select(
        "user_id",
        "version",
        "attr_value",
        "valid_from",
        F.lead("valid_from").over(wv).alias("valid_to"),
        F.col("n_events").cast("bigint").alias("n_events"),
        F.lead("valid_from").over(wv).isNull().alias("is_current"),
    ).orderBy("user_id", "version")

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

from pyspark.sql import SparkSession
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

"""Round-10 lanes: the LSH-bucketed semantic-dedup scale twin and the
hour-capped co-occurrence graph builders.

Both changes came out of the round-10 scale ledger (BENCH_LEDGER/
scale10x.json): the label-blocked exact cluster lane and the uncapped
graph builders measured 15-17x on 10x data (block/bucket occupancy grew
linearly, pair spaces quadratically). The fixes must be inert at test
SFs -- these pins prove that, plus the structural containment the LSH
twin claims.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from electricity_forecast_pipeline_airflow_k8s_spark.queries import registry


def test_semantic_scale_components_are_planted_pairs(spark, sf_dir):
    """dedup_semantic_clusters_scale plants one near-dup twin per vector
    (id + 1e9, dim-1 jitter, cosine ~0.999) and hunts them with adaptive
    sign-LSH + exact verify at 0.95. No two DISTINCT fixture vectors reach
    0.95 (same-label cosines cluster at 0 +/- 0.15), so every component
    the lane emits must be exactly {x, x + 1e9} with component id x --
    anything else means the verify threshold or the planting leaked."""
    rows = (
        registry()["dedup_semantic_clusters_scale"].build(spark, sf_dir).collect()
    )
    by_comp: dict = {}
    for r in rows:
        by_comp.setdefault(r["component"], []).append(r["node"])
    assert by_comp, "lane found no planted pairs at all"
    for comp, nodes in by_comp.items():
        assert sorted(nodes) == [comp, comp + 1_000_000_000], (comp, nodes)


def test_semantic_scale_recall_floor(spark, sf_dir):
    """Planted-twin recall: sign bits agree ~0.99/plane at cosine ~0.999,
    so a 6-bit adaptive prefix finds ~0.9 of planted pairs. The exact
    value is deterministic (md5 planes); this floor just keeps the lane
    honest if someone widens the prefix without re-checking recall."""
    from electricity_forecast_pipeline_airflow_k8s_spark.sources.tables import (
        load_table,
    )

    n_base = load_table(spark, "embeddings", sf_dir).count()
    found = (
        registry()["dedup_semantic_clusters_scale"].build(spark, sf_dir).count()
    )
    recall = (found / 2) / n_base
    assert recall >= 0.8, (found, n_base, recall)


@pytest.mark.parametrize(
    "lane",
    [
        "graph_kcore",
        "graph_triangle_count",
        "graph_link_prediction",
        "graph_bfs_reachability",
        "graph_assortativity",
    ],
)
def test_hour_cap_is_inert_at_test_scale(spark, sf_dir, lane):
    """The round-10 per-hour cap (256 smallest user_ids, shared with
    SSSP/LPA since r7) must not change any result at test SFs. Proven
    DIRECTLY (ADVICE r10): the capped node frame `_cap_hours(ev)` is
    compared row-for-row against the uncapped frame -- `_cap_hours` only
    filters, so equal counts means the cap removed nothing and every
    lane built on the shared builder is cap-inert here. The per-lane
    build keeps each registered lane exercised end-to-end."""
    from electricity_forecast_pipeline_airflow_k8s_spark.querydefs.graph import (
        _cap_hours,
    )
    from electricity_forecast_pipeline_airflow_k8s_spark.sources.tables import (
        load_table,
    )

    ev = (
        load_table(spark, "events", sf_dir)
        .filter(
            (F.col("event_type") == "error")
            & F.col("ts").isNotNull()
            & F.col("user_id").isNotNull()
        )
        .select(F.date_trunc("hour", "ts").alias("h"), "user_id")
        .distinct()
    )
    n_uncapped = ev.count()
    n_capped = _cap_hours(ev).count()
    assert n_capped == n_uncapped, (
        f"cap dropped {n_uncapped - n_capped} node-hours at test scale;"
        " the capped lanes' recorded results are no longer cap-inert --"
        " re-prove them"
    )
    # and the lane itself still builds + returns rows
    assert registry()[lane].build(spark, sf_dir).count() >= 0


def test_hour_cap_saturates_edge_growth(spark):
    """The 10x ledger shows the capped graph lanes at ~17x on the sf0.1 ->
    10x step: that step is exactly where users/hour crosses the 256 cap
    (45 -> ~450), so pair counts grow (256/45)^2-bounded and then
    SATURATE. Pin the saturation: once a bucket exceeds the cap, doubling
    its users leaves the capped pair count bit-identical -- growth beyond
    this step is bounded by #hours, not users^2."""
    from electricity_forecast_pipeline_airflow_k8s_spark.querydefs.graph import (
        _cap_hours,
    )

    def edges_count(n_users: int) -> int:
        rows = [("2024-01-01 00:00:00", u) for u in range(n_users)]
        ev = spark.createDataFrame(rows, "h string, user_id long").select(
            F.col("h").cast("timestamp").alias("h"), "user_id"
        )
        ev = _cap_hours(ev)
        a, c = ev.alias("a"), ev.alias("c")
        return (
            a.join(
                c,
                (F.col("a.h") == F.col("c.h"))
                & (F.col("a.user_id") < F.col("c.user_id")),
            )
            .count()
        )

    full = 256 * 255 // 2
    assert edges_count(300) == full
    assert edges_count(600) == full  # doubled users, identical pair count
    assert edges_count(100) == 100 * 99 // 2  # below cap: untouched


def test_inc_triangle_total_equals_scratch_estimator(spark, sf_dir):
    """Cross-lane identity: the incremental lane's maintained total over
    (state + batch) must equal graph_triangle_estimate's scratch count
    over ALL events EXACTLY -- same capped graph (hour-bounded edges make
    edges(all) = edges(old) UNION edges(new)), same deterministic md5
    sample, so any divergence means the role decomposition double- or
    under-counted."""
    reg = registry()
    inc = reg["inc_triangle_estimate_merge"].build(spark, sf_dir).collect()[0]
    est = reg["graph_triangle_estimate"].build(spark, sf_dir).collect()[0]
    assert inc["t_state"] + inc["t_delta"] == inc["t_total"]
    assert inc["t_total"] == est["t_sampled"], (inc, est)
    assert inc["t_estimate"] == est["t_estimate"]
    assert inc["n_state_edges"] + inc["n_batch_edges"] == est["n_edges_sampled"]

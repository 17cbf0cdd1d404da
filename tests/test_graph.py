"""Structural invariants for the graph operators (querydefs/graph.py) —
properties the DuckDB oracle can't see because they hold by construction
on BOTH engines: probability-mass conservation, recall bounds, and the
wedge/triangle counting inequalities."""

import os

import pytest

from electricity_forecast_pipeline_airflow_k8s_spark.queries import registry


def test_pagerank_mass_conserved(spark, sf_dir):
    """Fixed-point PageRank loses at most a few grid units per node per
    iteration to integer floor-division; total mass must stay within that
    envelope of exactly 1.0 (1e9 on the rank grid). A wrong dangling-mass
    or damping term would drift by orders of magnitude more."""
    rows = registry()["graph_pagerank"].build(spark, sf_dir).collect()
    n = len(rows)
    assert n >= 2
    total_fp = sum(r["pagerank_fp"] for r in rows)
    # floor-only arithmetic can LOSE mass but never create it ...
    assert total_fp <= 10**9, (total_fp, n)
    # ... and the loss is bounded: each of the <= n^2 edge weights
    # truncates up to R_SCALE/P_SCALE = 1e3 rank units per iteration
    # (p_fp = (c*1e6)//tot), plus one unit per edge product and a few
    # per-node divisions. A wrong dangling-mass or damping term would
    # overshoot this envelope by orders of magnitude.
    tolerance = 3 * (n * n * (10**3 + 1) + 3 * n)
    assert 10**9 - total_fp <= tolerance, (total_fp, n)
    assert all(r["pagerank_fp"] > 0 for r in rows)


def test_lsh_recall_bounds(spark, sf_dir):
    """verified pairs are exact-Jaccard-filtered candidates, so
    verified <= candidates AND verified <= truth (every verified pair IS
    a truth pair); recall and precision live in [0, 1]."""
    row = registry()["dedup_lsh_recall_eval"].build(spark, sf_dir).collect()[0]
    assert row["n_verified_pairs"] <= row["n_candidate_pairs"]
    assert row["n_verified_pairs"] <= row["n_truth_pairs"]
    if row["n_truth_pairs"]:
        assert 0.0 <= row["recall"] <= 1.0
    if row["n_candidate_pairs"]:
        assert 0.0 <= row["candidate_precision"] <= 1.0


def test_triangle_wedge_inequality(spark, sf_dir):
    """Every triangle closes exactly 3 wedges, so 3*triangles <= wedges
    (the clustering coefficient is a true ratio in [0, 1]); the handshake
    bound ties wedges to edges."""
    row = registry()["graph_triangle_count"].build(spark, sf_dir).collect()[0]
    assert 3 * row["n_triangles"] <= row["n_wedges"]
    if row["n_wedges"]:
        assert 0.0 <= row["clustering_coeff"] <= 1.0
    # handshake: sum of degrees = 2 * edges, so wedges > 0 iff some node
    # has degree >= 2; with edges present wedges can only vanish on a
    # perfect matching
    if row["n_edges"] >= row["n_nodes"]:
        assert row["n_wedges"] > 0


@pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_SLOW_TESTS") != "1",
    reason="opt-in slow test, ~13 s of the suite (set SPARK_GRAFT_SLOW_TESTS=1)",
)
def test_fixed_point_ops_invariant_to_file_layout(spark, sf_dir, tmp_path):
    """The determinism claim behind the fixed-point operators: identical
    results regardless of how the input parquet is laid out (1 file vs
    many, different row orders), because every reduction is integer/
    decimal (associative) and every float op is a mirrored scalar edge.
    A hidden float sum would break bit-equality here."""
    import os

    from pyspark.sql import functions as F

    src = spark.read.parquet(f"{sf_dir}/events.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    a_dir = str(tmp_path / "layout_a")
    b_dir = str(tmp_path / "layout_b")
    os.makedirs(a_dir)
    os.makedirs(b_dir)
    src.coalesce(1).write.parquet(f"{a_dir}/events.parquet")
    emb.coalesce(1).write.parquet(f"{a_dir}/embeddings.parquet")
    # different file count AND different intra-file order
    src.orderBy(F.rand(7)).repartition(7).write.parquet(f"{b_dir}/events.parquet")
    emb.orderBy(F.rand(7)).repartition(5).write.parquet(f"{b_dir}/embeddings.parquet")

    from electricity_forecast_pipeline_airflow_k8s_spark.queries import registry

    for name in ("graph_pagerank", "emb_top_pc_power_iteration", "emb_kcenter_seeds"):
        ra = [tuple(r) for r in registry()[name].build(spark, a_dir).collect()]
        rb = [tuple(r) for r in registry()[name].build(spark, b_dir).collect()]
        assert ra == rb, f"{name} differs across file layouts"


def test_shapley_efficiency_property(spark, sf_dir):
    """Shapley's efficiency axiom: channel values sum to
    v(all channels) - v(no channels) = converters touching >= 1 channel.
    Exact up to the single 1e-4 output rounding per channel."""
    from pyspark.sql import functions as F

    from electricity_forecast_pipeline_airflow_k8s_spark.queries import registry

    rows = registry()["sess_shapley_attribution"].build(spark, sf_dir).collect()
    total = sum(r["shapley_conversions"] for r in rows)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").filter(
        F.col("user_id").isNotNull()
    )
    convs = ev.filter(F.col("event_type") == "purchase").select("user_id").distinct()
    touched = (
        ev.filter(F.col("event_type") != "purchase")
        .join(convs, "user_id", "left_semi")
        .select("user_id")
        .distinct()
        .count()
    )
    assert abs(total - touched) <= 4 * 1e-4 + 1e-9, (total, touched)


def test_pagerank_dangling_hand_model(spark, tmp_path):
    """A 2-node chain A->B leaves B dangling; the fixed-point update has
    a closed hand computation (base = (1-d)/N, B's mass redistributes
    uniformly). The operator must match it bit-for-bit — this is the only
    case that exercises the dangling branch with known values."""
    import datetime as dt

    from electricity_forecast_pipeline_airflow_k8s_spark.queries import registry

    base_ts = dt.datetime(2024, 1, 1)
    rows = [
        (1, base_ts, 1, "A", 1.0, None),
        (2, base_ts + dt.timedelta(minutes=1), 1, "B", 1.0, None),
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.parquet(f"{tmp_path}/events.parquet")
    out = {
        r["node"]: r["pagerank_fp"]
        for r in registry()["graph_pagerank"].build(spark, str(tmp_path)).collect()
    }
    ra = rb = 500_000_000
    for _ in range(3):
        base = 15_000_000_000 // 200
        na = base + (85 * (0 + rb // 2)) // 100
        nb = base + (85 * (ra + rb // 2)) // 100
        ra, rb = na, nb
    assert out == {"A": ra, "B": rb}, out

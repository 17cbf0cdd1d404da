"""Every registered query must match its DuckDB oracle at sf0.001 --
the local mirror of the driver's t2 correctness gate."""

import os

import pytest

from electricity_forecast_pipeline_airflow_k8s_spark.parity import compare
from electricity_forecast_pipeline_airflow_k8s_spark.queries import registry

# Round-12 (VERDICT r11 item 2: the driver's pytest budget): the ten
# slowest parity lanes cost 232 s of the suite's 1,815 s -- the two
# corpus pipelines alone are 192 s, almost all of it the DuckDB side
# replaying the 5-stage recursive-CTE oracle. They are opt-in here
# (SPARK_GRAFT_SLOW_TESTS=1, the test_broadcast_audit.py convention);
# their parity coverage does NOT lapse: every lane stays in the
# committed full-registry sweep (tools/verify_contract.py ->
# BENCH_LEDGER/verify_sweep.json, refreshed and gated green each round
# by test_contract_integrity) and in the driver's own 50-lane window
# rotation.
SLOW_PARITY = {
    "corpus_prep_e2e",
    "corpus_prep_inc_batch",
    "dedup_ngram_jaccard_pairs",
    "layout_zorder_locality",
    "layout_zonemap_pruning",
    "sim_ivfpq_recall",
    "sim_pq_adc_recall",
    "inc_cc_new_edges",
    "layout_bloom_pruning",
    "emb_pq_train_curve",
    # second tier (2.5-4 s each, ~41 s total): same sweep-ledger coverage
    "dedup_clusters",
    "dedup_keep_best",
    "dedup_semantic_clusters_scale",
    "emb_top_pc_power_iteration",
    "graph_sssp_weighted",
    "graph_ppr_unrolled",
    "inc_triangle_estimate_merge",
    "text_langid_confusion",
    "stream_join_windowed_attribution",
    "stream_upsert_replay_state",
    "stream_stream_join",
    "stream_kmv_merge",
    "stream_quantile_merge",
    "stream_triangle_ivm_merge",
}

RUN_SLOW = os.environ.get("SPARK_GRAFT_SLOW_TESTS") == "1"


def all_query_names():
    return sorted(registry().keys())


@pytest.mark.parametrize("name", all_query_names())
def test_query_matches_oracle(spark, sf_dir, name):
    if name in SLOW_PARITY and not RUN_SLOW:
        pytest.skip("opt-in slow parity lane (set SPARK_GRAFT_SLOW_TESTS=1)")
    res = compare(spark, name, sf_dir)
    assert res["ok"], res


def test_slow_parity_lanes_are_green_in_committed_sweep():
    """The opt-in lanes' value evidence must exist in the committed
    full-registry sweep ledger -- skipping them here never leaves them
    unverified."""
    import json

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "BENCH_LEDGER", "verify_sweep.json")) as f:
        sweep = json.load(f)["lanes"]
    bad = {
        n: sweep.get(n)
        for n in SLOW_PARITY
        if sweep.get(n, {}).get("status") not in ("MATCH", "NUMPY-MATCH")
    }
    assert not bad, f"opt-in parity lanes lack green sweep evidence: {bad}"

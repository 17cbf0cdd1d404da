"""Plan-level broadcast audit (round 11): no scale-ledger lane may build
a broadcast from an unguarded fact-table scan.

The 50x run caught `dedup_minhash_lsh_pairs` OOM-ing the driver because
the static planner under-estimated the projected shingle subtree and
broadcast the corpus-sized side of the verify join. This audit walks
every scale-ledger lane's physical plan and fails if any
BroadcastExchange subtree reaches a documents/embeddings/events/
lineitem/orders FileScan without an Aggregate or Limit in between --
i.e. a broadcast whose size grows with the corpus. Aggregated/limited
subtrees (centroids, codebooks, thresholds, boundary tuples) are the
legitimate broadcast pattern and pass.

Opt-in (SPARK_GRAFT_RUN_PLAN_AUDIT=1): building all ~57 lanes takes
minutes. The round-11 run at the 10x corpus: 57/57 clean.
"""

from __future__ import annotations

import json
import os

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FACTS = ("documents", "embeddings", "events", "lineitem", "orders")
GUARDS = (
    "HashAggregate",
    "ObjectHashAggregate",
    "SortAggregate",
    "Limit",
    "TakeOrdered",
)


def corpus_broadcasts(plan) -> list[list[str]]:
    """All BroadcastExchange subtrees that reach an unguarded fact scan."""
    bad: list[list[str]] = []

    def scan(node, guarded: bool, found: list[str]) -> None:
        nm = node.nodeName()
        if any(g in nm for g in GUARDS):
            guarded = True
        if "Scan" in nm:
            head = node.toString().split("\n")[0]
            for f in FACTS:
                if f"/{f}.parquet" in head and not guarded:
                    found.append(f)
        for i in range(node.children().size()):
            scan(node.children().apply(i), guarded, found)

    def walk(node) -> None:
        if "BroadcastExchange" in node.nodeName():
            found: list[str] = []
            scan(node, False, found)
            if found:
                bad.append(sorted(set(found)))
        for i in range(node.children().size()):
            walk(node.children().apply(i))

    walk(plan)
    return bad


@pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_RUN_PLAN_AUDIT") != "1",
    reason="opt-in: builds every scale-ledger lane (set SPARK_GRAFT_RUN_PLAN_AUDIT=1)",
)
def test_no_scale_lane_broadcasts_a_fact_scan(spark):
    # The audit only means something at a corpus where fact tables exceed
    # the broadcast threshold: at sf0.001 every table legitimately
    # broadcasts. Run against the (regenerable) 10x corpus.
    scale_dir = os.environ.get(
        "SPARK_GRAFT_SCALE_DIR", os.path.join(ROOT, ".scale10x")
    )
    if not os.path.isdir(scale_dir):
        pytest.skip(f"{scale_dir} not built (run tools/scale_bench.py)")
    from electricity_forecast_pipeline_airflow_k8s_spark.queries import registry

    with open(os.path.join(ROOT, "BENCH_LEDGER", "scale10x.json")) as f:
        lanes = sorted(json.load(f)["lanes"])
    reg = registry()
    suspects = {}
    for lane in lanes:
        df = reg[lane].build(spark, scale_dir)
        bad = corpus_broadcasts(df._jdf.queryExecution().executedPlan())
        if bad:
            suspects[lane] = bad
    assert not suspects, f"corpus-sized broadcast builds: {suspects}"
